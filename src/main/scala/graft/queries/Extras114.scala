package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.operators.{ConnectedComponents, Staging}
import graft.streaming.Streams

/** q310's stateful operator: the standing-component REGISTRY as
  * streaming state. Quotient edges (component-or-new-node id pairs)
  * arrive across micro-batches; state is a union-find over TOUCHED ids
  * only — delta-bounded, never corpus-bounded (the q286/q289 register
  * discipline on graphs). Roots are always the set MINIMUM, so the
  * final mapping is a pure function of the edge SET: batch order,
  * batch boundaries, and within-batch order cannot change it — which
  * is what lets one batch oracle gate the stream. Single logical key:
  * cross-component merges need a serialized merge point (exactly what
  * a production cluster registry is); the heavy lifting — pair
  * generation, component lookup — happened upstream in distributed
  * stages, and the registry sees only the delta-sized quotient. */
class CcRegistry(flushAtMs: Long)
    extends StatefulProcessor[
      Int, (Long, Long, Timestamp), (Long, Long)] {
  @transient private var parents: ListState[(Long, Long)] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    parents = getHandle.getListState[(Long, Long)]("parents",
      Encoders.product[(Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Int,
      rows: Iterator[(Long, Long, Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val p = scala.collection.mutable.LongMap[Long]()
    parents.get().foreach { case (id, root) => p(id) = root }
    def find(x: Long): Long = {
      var r = x
      while (p.getOrElse(r, r) != r) r = p(r)
      // path compression: point the chain at the root
      var c = x
      while (p.getOrElse(c, c) != r) { val n = p(c); p(c) = r; c = n }
      r
    }
    rows.foreach { case (ca, cb, _) =>
      if (ca != cb && ca >= 0) { // sentinel rows carry -1
        val ra = find(ca)
        val rb = find(cb)
        if (ra != rb) { // min root: the mapping stays order-independent
          val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          p(hi) = lo
          p.getOrElseUpdate(lo, lo)
        } else { p.getOrElseUpdate(ra, ra); () }
        p.getOrElseUpdate(ca, find(ca)); p.getOrElseUpdate(cb, find(cb))
      }
    }
    // store fully compressed: every entry points straight at its root
    val flat = p.keysIterator.map(id => (id, find(id))).toArray
    parents.clear()
    if (flat.nonEmpty) parents.appendList(flat)
    if (!armed.exists()) {
      getHandle.registerTimer(flushAtMs)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] =
    parents.get()
}

/** Hundred-fourteenth coverage wave: the STREAMING twin of q307's
  * incremental connected components (r11 verdict ask #7) — the
  * incoming delta-edge stream updates the standing component table
  * through `transformWithState`.
  *
  *  - q310: q307's quotient construction verbatim (shared helpers:
  *    `ccParts`, `ConnectedComponents.endpointComponents` /
  *    `quotientEdges` / `applyRemap` — batch and stream CANNOT drift),
  *    but the quotient-graph CC runs as STREAMING STATE
  *    ([[CcRegistry]]): quotient edges split across two micro-batches
  *    by edge hash (so merge chains genuinely span batch boundaries —
  *    the state carries half-merged components between batches) + the
  *    far-future sentinel that closes the watermark and fires the
  *    flush timer (q289's geometry). Union-find with min-roots makes
  *    the registry a pure function of the edge set, so the stream
  *    shares q307's batch oracle VERBATIM — the full recursive-CTE CC
  *    over corpus ∪ delta. Stream == incremental == batch, all
  *    in one hash.
  *
  *    Scale shape: the state is the TOUCHED-component registry
  *    (delta-bounded); the corpus-sized stages (shingle leaf, standing
  *    scan, remap projection) are the same distributed passes as q307;
  *    only the delta-sized quotient serializes through the registry —
  *    the merge point any consistent cluster registry needs.
  */
object Extras114 {

  /** q289's timer geometry: rows 2h before the flush instant, sentinel
    * 2h after, watermark delay 1h. */
  private val FlushAtMs = 4102444800000L

  val all: Seq[Qry] = Seq(

    Qry(
      "q310_stream_incremental_cc",
      Extras112.ccOracle) { (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val (standing, deltaEdges) = Extras112.ccParts(spark, dir)
        val de = Staging.stage(
          deltaEdges.select($"ea".as("a"), $"eb".as("b"))
            .filter($"a" =!= $"b").distinct(),
          eager = true)
        val ends = de.select($"a".as("nid"))
          .unionByName(de.select($"b".as("nid"))).distinct()
        val (found, newNodes) =
          ConnectedComponents.endpointComponents(standing, ends)
        val rEdges = Staging.stage(
          ConnectedComponents.quotientEdges(
            de, found.unionByName(newNodes)),
          eager = true)
        // stream the quotient edges in two hash-split batches: a merge
        // chain crossing the split exercises the carried registry state
        def part(p: Int) = rEdges.filter(
            pmod(hash($"ca", $"cb"), lit(2)) === p)
          .select($"ca", $"cb", lit(FlushAtMs - 7200000L).as("ms"))
        val sentinel = spark.range(1).select(lit(-1L).as("ca"),
          lit(-1L).as("cb"), lit(FlushAtMs + 7200000L).as("ms"))
        val srcDir = Streams.partedDir(s"$dir#q310",
          Seq(part(0), part(1), sentinel))
        val src = spark.readStream
          .schema(part(0).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("ets", timestamp_millis($"ms"))
          .withWatermark("ets", "1 hour")
          .select($"ca", $"cb", $"ets")
          .as[(Long, Long, Timestamp)]
        val out = src.groupByKey(_ => 0)
          .transformWithState(new CcRegistry(FlushAtMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("oldc", "newc")
        val remap = Streams.runToMemory(out, "append")
          .filter($"oldc" =!= $"newc")
        ConnectedComponents.applyRemap(standing, remap, newNodes)
          .select($"id".as("member"), $"component")
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  )
}
