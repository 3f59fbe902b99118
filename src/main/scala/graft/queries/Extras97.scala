package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables
import graft.streaming.Streams

/** Bounded bottom-k (KMV) sketch as streaming state: per key, keep the
  * k smallest hashes seen so far — the state is EXACTLY k longs no
  * matter how many rows stream through (the mergeable-sketch
  * discipline, now as a custom StatefulProcessor rather than a
  * groupBy). Each micro-batch merges its rows into the stored
  * bottom-k; ONE event-time timer per key (registered at a fixed
  * far-future instant, fired by the end-of-stream sentinel advancing
  * the watermark — [[BufferedAsOfEnrich]]'s flush mechanism) emits the
  * final sketch exactly once, so cross-batch accumulation is the
  * tested path, not an accident. Top-level class so the closure
  * serializes without a query-module reference. */
class BottomKSketch(k: Int, flushAtMs: Long) extends StatefulProcessor[
    String, (String, Long, Timestamp), (String, Long)] {
  @transient private var buf: ListState[Long] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Long]("bottomk", Encoders.scalaLong,
      TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Timestamp)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    // merge this batch into the stored bottom-k: state in, state out,
    // never more than k longs
    val merged = (buf.get().toArray ++ rows.map(_._2))
      .distinct.sorted.take(k)
    buf.clear()
    if (merged.nonEmpty) buf.appendList(merged)
    if (!armed.exists()) {
      getHandle.registerTimer(flushAtMs)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long)] =
    buf.get().map(h => (key, h))
}

/** Ninety-seventh coverage wave: the KMV sketch as bounded streaming
  * state.
  *
  *  - q286: per-source distinct-shingle cardinality from a STREAMED
  *    corpus via [[BottomKSketch]] — q221 proved HLL registers stream
  *    (fixed 512 cells through a groupBy); this is the other sketch
  *    family streamed, and through a custom stateful operator because
  *    a complete-mode groupBy cannot express "keep only the k
  *    smallest" with bounded state (its distinct-hash state would be
  *    cardinality-sized). The corpus deliberately splits across THREE
  *    micro-batches (mod-2 doc split + sentinel via
  *    [[Streams.partedDir]], maxFilesPerTrigger=1), so the gate pins
  *    cross-batch merge correctness; the flush timer emits each
  *    source's final k hashes exactly once after the sentinel closes
  *    the watermark. Post-sink: est = (k-1)·P DIV h_(k) per source,
  *    audited against the exact distinct count (batch side) in signed
  *    ppm. Scale: state = k longs per source; the estimator never
  *    sees corpus cardinality.
  */
object Extras97 {

  private val one = lit(1)
  private val K = 256
  private val P = TextOps.P
  /** Timer instant every key flushes at (2100-01-01T00:00Z); the
    * sentinel's event time sits an hour later so the final watermark
    * passes it. */
  private val FlushAtMs = 4102444800000L

  val all: Seq[Qry] = Seq(

    Qry(
      "q286_stream_kmv",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |td AS (SELECT DISTINCT d.source AS grp, sh.h
         |  FROM sh JOIN documents d USING (doc_id)),
         |kmv AS (SELECT grp, h FROM (
         |    SELECT grp, h, row_number() OVER (PARTITION BY grp
         |      ORDER BY h) AS rn FROM td) WHERE rn <= $K),
         |agg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS kk,
         |    CAST(MAX(h) AS BIGINT) AS hk FROM kmv GROUP BY 1),
         |ex AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact
         |       FROM td GROUP BY 1)
         |SELECT agg.grp AS source, kk,
         |  CAST((kk - 1) * $P // hk AS BIGINT) AS est,
         |  exact,
         |  CAST(floor(1000000.0 * ((kk - 1) * $P // hk - exact)
         |    / exact) AS BIGINT) AS err_ppm
         |FROM agg JOIN ex ON agg.grp = ex.grp""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        // (source, shingle-hash) rows at event time 0; the corpus
        // splits across two batches on doc parity, the sentinel third
        val rows = Dedup.shingleHashes(
          Tables(spark, dir).documents, "doc_id", "text",
          carry = Seq("source", "doc_id"))
          .select($"source".as("grp"), $"h", $"doc_id")
        // real rows sit 2h BEFORE the flush instant (not at epoch 0:
        // the initial watermark is 0 and a 0-ts row would be exactly
        // on it — late-row filtering semantics differ by operator)
        def part(p: Int) = rows.filter($"doc_id" % 2 === p)
          .select($"grp", $"h", lit(FlushAtMs - 7200000L).as("ms"))
        // delay 1h keeps the ts-0 rows of batch 2 ahead of the
        // watermark (0 - 1h) — a 0s delay would drop them as late;
        // the sentinel sits 2h past the flush instant so the final
        // watermark (sentinel - 1h) still crosses every timer
        val sentinel = spark.range(1).select(lit("~").as("grp"),
          lit(-1L).as("h"), lit(FlushAtMs + 7200000L).as("ms"))
        val srcDir = Streams.partedDir(s"$dir#q286",
          Seq(part(0), part(1), sentinel))
        val src = spark.readStream
          .schema(part(0).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("ets", timestamp_millis($"ms"))
          .withWatermark("ets", "1 hour")
          .select($"grp", $"h", $"ets")
          .as[(String, Long, Timestamp)]
        val out = src.groupByKey(_._1)
          .transformWithState(new BottomKSketch(K, FlushAtMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("grp", "h")
        val sketch = Streams.runToMemory(out, "append")
          .filter($"grp" =!= "~")
        val agg = sketch.groupBy($"grp")
          .agg(count(one).as("kk"), max($"h").as("hk"))
        // the audit side (batch) — the estimator never reads it
        val ex = Dedup.shingleHashes(
          Tables(spark, dir).documents, "doc_id", "text",
          carry = Seq("source"))
          .select($"source".as("g2"), $"h").distinct()
          .groupBy($"g2").agg(count(one).as("exact"))
        agg.join(ex, $"grp" === $"g2")
          .select($"grp".as("source"), $"kk",
            expr(s"(kk - 1) * $P DIV hk").as("est"), $"exact",
            expr(s"CAST(floor(1000000.0 * ((kk - 1) * $P DIV hk" +
              " - exact) / exact) AS BIGINT)").as("err_ppm"))
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  )
}
