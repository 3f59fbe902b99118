package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.operators.{QDigest, Staging}
import graft.sources.Tables
import graft.streaming.Streams

/** q289's stateful operator: per-key q-digest as bounded streaming
  * state. Each micro-batch sums its rows into the stored digest's
  * node counts and re-compresses with the fixed threshold `t` — state
  * stays O(K·levels) entries per key no matter how many rows stream
  * through (the q286 KMV discipline, now for quantiles). One event-time
  * timer per key (armed at a fixed far-future instant, fired by the
  * end-of-stream sentinel advancing the watermark — q254's flush
  * mechanism) emits the final digest exactly once. Top-level class so
  * the closure serializes without a query-module reference. */
class QDigestSketch(ts: Map[String, Long], levels: Int, flushAtMs: Long)
    extends StatefulProcessor[
      String, (String, Long, Timestamp), (String, Long, Int, Long)] {
  @transient private var dig: ListState[(Long, Int, Long)] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    dig = getHandle.getListState[(Long, Int, Long)]("digest",
      Encoders.product[(Long, Int, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Timestamp)],
      timerValues: TimerValues): Iterator[(String, Long, Int, Long)] = {
    // stored digest + this batch's leaf counts, summed by node id
    // (interior and leaf ids never collide), then one re-compression —
    // state in, state out, never more than the digest bound
    val m = scala.collection.mutable.LongMap[(Int, Long)]()
    dig.get().foreach { case (node, lv, cnt) => m(node) = (lv, cnt) }
    rows.foreach { r =>
      val node = r._2
      m(node) = m.get(node) match {
        case Some((lv, c)) => (lv, c + 1L)
        case None => (levels, 1L)
      }
    }
    val merged = QDigest.compressLocal(
      m.iterator.map { case (n, (lv, c)) => (n, lv, c) }.toSeq,
      ts.getOrElse(key, 1L), levels)
    dig.clear()
    if (merged.nonEmpty) dig.appendList(merged.toArray)
    if (!armed.exists()) {
      getHandle.registerTimer(flushAtMs)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, Int, Long)] =
    dig.get().map { case (node, lv, cnt) => (key, node, lv, cnt) }
}

/** Ninety-eighth coverage wave: the mergeable QUANTILE sketch —
  * q-digest (see [[graft.operators.QDigest]]) — closing the one gap in
  * the sketch family (CMS/HLL/Bloom/MinHash/KMV all had register-state
  * queries; percentiles, the reference's core analytic, came only from
  * exact sorts or the opaque built-in).
  *
  *  - q287: per-returnflag q-digest over lineitem price cents —
  *    P50/P90/P99 answered from the sketch, with the true rank of each
  *    answer audited against the target in-row (`rank_err`, `bound_ok`
  *    pins 0 <= err <= cnt_chosen + 2·levels·t). The oracle rebuilds
  *    the digest bit-for-bit (construction is a pure function of the
  *    leaf histogram — the q125 CMS proof shape). Scale: the only
  *    corpus-sized stage is the leaf-count aggregate; ten compression
  *    passes run over <= groups × 2^levels rows.
  *  - q288: MERGE across shards — four per-shard digests (l_suppkey
  *    mod 4) built independently with the shared threshold, merged by
  *    node-wise count addition + one re-compression, quantiles
  *    extracted from the merged digest SIDE-BY-SIDE with the
  *    direct-build digest's (est_cents_merged vs est_cents_direct);
  *    the merged answers carry the same audited bound. This is the
  *    100 TB deployment shape: shards sketch locally, only
  *    O(K·levels)-node digests move.
  *  - q289: the STREAMING twin — per-key state IS the compressed
  *    digest ([[QDigestSketch]]); the corpus deliberately splits
  *    across two micro-batches (order-key parity via
  *    [[Streams.partedDir]], maxFilesPerTrigger=1) plus a sentinel,
  *    so the gate pins the cross-batch merge+recompress path; the
  *    oracle re-derives BOTH rounds (digest(batch0), then merge
  *    batch1 + recompress — the q258 unrolled-round discipline).
  *    Post-sink: the same quantile extraction as q287.
  */
object Extras98 {

  private val one = lit(1)
  /** Digest geometry: 2^Levels leaf buckets of CellW cents each (domain
    * covers TPC-H l_extendedprice — max ~10.5M cents < 1024·16384;
    * LEAST clamps defensively). K sets threshold t = n/K. */
  private val Levels = 10
  private val Nleaf = 1L << Levels
  private val CellW = 16384L
  private val K = 48
  private val Pcts = Seq(50, 90, 99)
  /** q289 flush instant (2100-01-01T00:00Z), q286's timer convention. */
  private val FlushAtMs = 4102444800000L

  /** Spark-side bucket expression (DuckDB twin in [[oracleSrcCte]]). */
  private val bucketExpr =
    s"least(CAST(round(l_extendedprice * 100) AS BIGINT) DIV $CellW, " +
      s"${Nleaf - 1})"

  /** Shared oracle text: src / lf / nt CTEs over lineitem. */
  private val oracleSrcCte =
    s"""src AS (SELECT l_returnflag AS g,
       |    LEAST(CAST(round(l_extendedprice * 100) AS BIGINT) // $CellW,
       |          ${Nleaf - 1}) AS bucket,
       |    l_orderkey % 2 AS par
       |  FROM lineitem),
       |lf AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS lcnt
       |       FROM src GROUP BY 1, 2),
       |nt AS (SELECT g, GREATEST(CAST(SUM(lcnt) AS BIGINT) // $K,
       |         CAST(1 AS BIGINT)) AS t FROM lf GROUP BY 1)""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- batch q-digest quantiles ------------------------------------------
    Qry(
      "q287_qdigest_quantiles", {
        val (extCtes, extSel) = QDigest.oracleQuantileParts(
          "dig", "lf", Seq("g"), Levels, CellW, Pcts)
        s"""WITH $oracleSrcCte,
           |d$Levels AS (SELECT l.g, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lf l JOIN nt USING (g)),
           |${QDigest.oracleCompressCtes(s"d$Levels", "dig", Levels,
              Seq("g"))},
           |$extCtes
           |$extSel""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val src = Tables(spark, dir).lineitem.select(
        $"l_returnflag".as("g"), expr(bucketExpr).as("bucket"))
      val leaf = Staging.stage(src.groupBy($"g", $"bucket")
        .agg(count(one).as("lcnt")), eager = false)
      val nt = leaf.groupBy($"g").agg(
        expr(s"greatest(CAST(sum(lcnt) AS BIGINT) DIV $K, " +
          "CAST(1 AS BIGINT))").as("t"))
      val d10 = leaf.join(nt, "g").select($"g",
        (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
        $"lcnt".as("cnt"), $"t")
      val dig = QDigest.compress(d10, Seq("g"), Levels)
      QDigest.quantiles(dig, leaf, Seq("g"), Levels, CellW, Pcts)
    },

    // ---- shard-merge: digests add across shards ----------------------------
    Qry(
      "q288_qdigest_merge", {
        val (extM, selM) = QDigest.oracleQuantileParts(
          "digm", "lf", Seq("g"), Levels, CellW, Pcts, tag = "m")
        val (extD, _) = QDigest.oracleQuantileParts(
          "digd", "lf", Seq("g"), Levels, CellW, Pcts, tag = "d")
        val _ = selM // final select is the side-by-side join below
        s"""WITH srcs AS (SELECT l_returnflag AS g, l_suppkey % 4 AS shard,
           |    LEAST(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      // $CellW, ${Nleaf - 1}) AS bucket
           |  FROM lineitem),
           |lfs AS (SELECT g, shard, bucket,
           |    CAST(COUNT(*) AS BIGINT) AS lcnt
           |  FROM srcs GROUP BY 1, 2, 3),
           |lf AS (SELECT g, bucket, CAST(SUM(lcnt) AS BIGINT) AS lcnt
           |       FROM lfs GROUP BY 1, 2),
           |nt AS (SELECT g, GREATEST(CAST(SUM(lcnt) AS BIGINT) // $K,
           |         CAST(1 AS BIGINT)) AS t FROM lf GROUP BY 1),
           |ds$Levels AS (SELECT l.g, l.shard, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lfs l JOIN nt USING (g)),
           |${QDigest.oracleCompressCtes(s"ds$Levels", "digs", Levels,
              Seq("g", "shard"))},
           |m$Levels AS (SELECT g, node, MAX(lv) AS lv,
           |    CAST(SUM(cnt) AS BIGINT) AS cnt, MAX(t) AS t
           |  FROM digs GROUP BY 1, 2),
           |${QDigest.oracleCompressCtes(s"m$Levels", "digm", Levels,
              Seq("g"))},
           |dd$Levels AS (SELECT l.g, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lf l JOIN nt USING (g)),
           |${QDigest.oracleCompressCtes(s"dd$Levels", "digd", Levels,
              Seq("g"))},
           |$extM,
           |$extD
           |SELECT e.g, e.pct,
           |  (e.est_hi + 1) * $CellW - 1 AS est_cents_merged,
           |  (ed.est_hi + 1) * $CellW - 1 AS est_cents_direct,
           |  r.rank_le, e.target,
           |  r.rank_le - e.target AS rank_err,
           |  CAST(r.rank_le >= e.target AND
           |    r.rank_le - e.target <= e.cnt_chosen + ${2L * Levels} * e.t
           |    AS BOOLEAN) AS bound_ok,
           |  e.digest_nodes AS nodes_merged,
           |  ed.digest_nodes AS nodes_direct
           |FROM estm e
           |JOIN rankm r ON r.g = e.g AND r.pct = e.pct
           |JOIN estd ed ON ed.g = e.g AND ed.pct = e.pct""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val srcs = Tables(spark, dir).lineitem.select(
        $"l_returnflag".as("g"), expr("l_suppkey % 4").as("shard"),
        expr(bucketExpr).as("bucket"))
      val lfs = Staging.stage(srcs.groupBy($"g", $"shard", $"bucket")
        .agg(count(one).as("lcnt")), eager = false)
      val leaf = lfs.groupBy($"g", $"bucket")
        .agg(sum("lcnt").cast("long").as("lcnt"))
      val nt = leaf.groupBy($"g").agg(
        expr(s"greatest(CAST(sum(lcnt) AS BIGINT) DIV $K, " +
          "CAST(1 AS BIGINT))").as("t"))
      val ds10 = lfs.join(nt, "g").select($"g", $"shard",
        (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
        $"lcnt".as("cnt"), $"t")
      val digs = QDigest.compress(ds10, Seq("g", "shard"), Levels)
      val m10 = digs.groupBy($"g", $"node").agg(max("lv").as("lv"),
        sum("cnt").cast("long").as("cnt"), max("t").as("t"))
      val digM = QDigest.compress(m10, Seq("g"), Levels)
      val dd10 = leaf.join(nt, "g").select($"g",
        (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
        $"lcnt".as("cnt"), $"t")
      val digD = QDigest.compress(dd10, Seq("g"), Levels)
      val resM = QDigest.quantiles(digM, leaf, Seq("g"), Levels, CellW,
        Pcts)
      val resD = QDigest.quantiles(digD, leaf, Seq("g"), Levels, CellW,
        Pcts)
      resM.select($"g", $"pct", $"est_cents".as("est_cents_merged"),
          $"rank_le", $"target", $"rank_err", $"bound_ok",
          $"digest_nodes".as("nodes_merged"))
        .join(resD.select($"g", $"pct",
          $"est_cents".as("est_cents_direct"),
          $"digest_nodes".as("nodes_direct")), Seq("g", "pct"))
    },

    // ---- streaming twin: state IS the digest -------------------------------
    Qry(
      "q289_stream_qdigest", {
        val (extCtes, extSel) = QDigest.oracleQuantileParts(
          "digb", "lf", Seq("g"), Levels, CellW, Pcts)
        s"""WITH $oracleSrcCte,
           |lf0 AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS lcnt
           |        FROM src WHERE par = 0 GROUP BY 1, 2),
           |lf1 AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS lcnt
           |        FROM src WHERE par = 1 GROUP BY 1, 2),
           |da$Levels AS (SELECT l.g, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lf0 l JOIN nt USING (g)),
           |${QDigest.oracleCompressCtes(s"da$Levels", "diga", Levels,
              Seq("g"))},
           |mb$Levels AS (SELECT g, node, MAX(lv) AS lv,
           |    CAST(SUM(cnt) AS BIGINT) AS cnt, MAX(t) AS t
           |  FROM (SELECT g, node, lv, cnt, t FROM diga
           |        UNION ALL
           |        SELECT l.g, $Nleaf + bucket AS node, $Levels AS lv,
           |          lcnt AS cnt, t
           |        FROM lf1 l JOIN nt USING (g))
           |  GROUP BY 1, 2),
           |${QDigest.oracleCompressCtes(s"mb$Levels", "digb", Levels,
              Seq("g"))},
           |$extCtes
           |$extSel""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val li = Tables(spark, dir).lineitem.select(
          $"l_returnflag".as("g"), expr(bucketExpr).as("bucket"),
          expr("l_orderkey % 2").as("par"))
        val leaf = Staging.stage(li.groupBy($"g", $"bucket")
          .agg(count(one).as("lcnt")), eager = false)
        val nt = leaf.groupBy($"g").agg(
          expr(s"greatest(CAST(sum(lcnt) AS BIGINT) DIV $K, " +
            "CAST(1 AS BIGINT))").as("t"))
        // per-key thresholds for the processor: 3 rows, driver-bounded
        // (the Bpe one-row-per-round discipline) — matches nt exactly
        val ts = nt.as[(String, Long)].collect().toMap
        // real rows sit 2h BEFORE the flush instant; sentinel 2h after
        // (q286's watermark geometry: delay 1h keeps batch-2 rows live,
        // sentinel - 1h still crosses every timer)
        def part(p: Int) = li.filter($"par" === p)
          .select($"g", (lit(Nleaf) + $"bucket").as("node"),
            lit(FlushAtMs - 7200000L).as("ms"))
        val sentinel = spark.range(1).select(lit("~").as("g"),
          lit(-1L).as("node"), lit(FlushAtMs + 7200000L).as("ms"))
        val srcDir = Streams.partedDir(s"$dir#q289",
          Seq(part(0), part(1), sentinel))
        val src = spark.readStream
          .schema(part(0).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("ets", timestamp_millis($"ms"))
          .withWatermark("ets", "1 hour")
          .select($"g", $"node", $"ets")
          .as[(String, Long, Timestamp)]
        val out = src.groupByKey(_._1)
          .transformWithState(new QDigestSketch(ts, Levels, FlushAtMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("g", "node", "lv", "cnt")
        val sink = Streams.runToMemory(out, "append")
          .filter($"g" =!= "~")
        val dig = sink.join(nt, "g")
          .select($"g", $"node", $"lv", $"cnt", $"t")
        QDigest.quantiles(dig, leaf, Seq("g"), Levels, CellW, Pcts)
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  )
}
