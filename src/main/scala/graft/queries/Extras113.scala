package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.operators.{QDigest, Staging}
import graft.sources.Tables
import graft.streaming.Streams

/** q309's stateful operator: per-(key, event-time window) q-digest with
  * a PER-WINDOW event-time timer — the continuous percentile report.
  * Unlike [[QDigestSketch]] (one global flush instant), every
  * (key, window) state registers its timer at ITS OWN window end, so a
  * window's digest emits as soon as the watermark proves the window
  * closed, while later windows keep accumulating — the reference's
  * P50/P95/P99 report (integration_test.rs:541-551) as a stream of
  * per-window rows rather than one end-of-run summary. */
class QDigestWindowSketch(t: Long, levels: Int, windowMs: Long)
    extends StatefulProcessor[
      (String, Long), (String, Long, Long, Timestamp),
      (String, Long, Long, Int, Long)] {
  @transient private var dig: ListState[(Long, Int, Long)] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    dig = getHandle.getListState[(Long, Int, Long)]("digest",
      Encoders.product[(Long, Int, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: (String, Long),
      rows: Iterator[(String, Long, Long, Timestamp)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Int, Long)] = {
    val m = scala.collection.mutable.LongMap[(Int, Long)]()
    dig.get().foreach { case (node, lv, cnt) => m(node) = (lv, cnt) }
    rows.foreach { r =>
      val node = r._3
      m(node) = m.get(node) match {
        case Some((lv, c)) => (lv, c + 1L)
        case None => (levels, 1L)
      }
    }
    val merged = QDigest.compressLocal(
      m.iterator.map { case (n, (lv, c)) => (n, lv, c) }.toSeq, t, levels)
    dig.clear()
    if (merged.nonEmpty) dig.appendList(merged.toArray)
    if (!armed.exists()) {
      // the window [w, w+windowMs) closes when the watermark reaches its
      // end — each key flushes at its OWN boundary, not a shared instant
      getHandle.registerTimer(key._2 + windowMs)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: (String, Long),
      timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(String, Long, Long, Int, Long)] =
    dig.get().map { case (node, lv, cnt) =>
      (key._1, key._2, node, lv, cnt)
    }
}

/** Hundred-thirteenth coverage wave: the q-digest family's two missing
  * rungs (r11 verdict asks #4 and #6).
  *
  *  - q308: WEIGHTED q-digest — quantity-weighted price quantiles from
  *    the same machinery with SUM(weight) leaves (the digest never
  *    cared that leaf counts were row counts; any non-negative integer
  *    mass works, and construction stays a pure function of the
  *    weighted leaf histogram, so the oracle still rebuilds it
  *    bit-for-bit). The in-gate audit carries q138's EXACT weighted
  *    quantile at the digest's bucket grain next to the estimate:
  *    `exact_cents` = the first bucket whose cumulative weight reaches
  *    the target (exact integer order statistics over the leaf table),
  *    with `bound_ok` still pinning the rank-error bound — so the
  *    digest's answer is measured against the exact weighted answer,
  *    not just against its own bound.
  *  - q309: the sliding/tumbling WINDOW streaming percentile report —
  *    the reference's actual report shape as a continuous stream
  *    (r11 verdict: "all machinery exists; the composition is the
  *    missing rung"). Per (event_type, 1-day event-time window)
  *    q-digest state ([[QDigestWindowSketch]]); each window's digest
  *    emits when ITS event-time timer fires (the q254 watermark-close
  *    mechanism, per window), so early windows report while late ones
  *    still accumulate. The fixture streams in two chronological
  *    halves split AT a window boundary (every window's rows arrive in
  *    one batch — no late data by construction, and window closings
  *    spread across micro-batches to exercise the continuous path) +
  *    the far-future sentinel. Threshold t is a DEPLOYMENT CONSTANT
  *    (a stream cannot size t = n/K before seeing n; per-window t is
  *    sized to expected window volume — the standard streaming
  *    q-digest design), shared with the oracle. Post-sink: q287's
  *    quantile extraction per (type, window), oracle = the same CTE
  *    stack with the composite group key.
  *
  *    Scale shape: state per (key, window) is O(levels + n_w/t)
  *    entries, time-bounded by the watermark (closed windows flush and
  *    their state is never touched again); the per-batch work is one
  *    local merge+recompress per live key.
  */
object Extras113 {

  private val one = lit(1)

  // ---- q308 geometry (q287's domain, weighted) -------------------------
  private val Levels = 10
  private val Nleaf = 1L << Levels
  private val CellW = 16384L
  private val K = 48
  private val Pcts = Seq(50, 95)

  private val bucketExpr =
    s"least(CAST(round(l_extendedprice * 100) AS BIGINT) DIV $CellW, " +
      s"${Nleaf - 1})"

  // ---- q309 geometry ----------------------------------------------------
  private val WLevels = 9
  private val WNleaf = 1L << WLevels // 512 buckets x 128 cents = 655.36
  private val WCellW = 128L
  private val WT = 8L
  private val WPcts = Seq(50, 95, 99)
  private val DayMs = 86400000L
  /** Chronological split boundary: 2024-01-16T00:00Z — a window edge,
    * so every 1-day window's rows arrive in exactly one micro-batch. */
  private val SplitMs = 1705363200000L
  private val SentinelMs = 4102444800000L

  val all: Seq[Qry] = Seq(

    // ---- weighted q-digest --------------------------------------------------
    Qry(
      "q308_qdigest_weighted", {
        val (extCtes, extSel) = QDigest.oracleQuantileParts(
          "dig", "lf", Seq("g"), Levels, CellW, Pcts)
        // exact weighted quantile at bucket grain: first bucket whose
        // cumulative weight reaches the target (q138's selection rule
        // over the leaf table)
        s"""WITH src AS (SELECT l_returnflag AS g,
           |    LEAST(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      // $CellW, ${Nleaf - 1}) AS bucket,
           |    CAST(l_quantity AS BIGINT) AS w
           |  FROM lineitem),
           |lf AS (SELECT g, bucket, CAST(SUM(w) AS BIGINT) AS lcnt
           |       FROM src GROUP BY 1, 2),
           |nt AS (SELECT g, GREATEST(CAST(SUM(lcnt) AS BIGINT) // $K,
           |         CAST(1 AS BIGINT)) AS t FROM lf GROUP BY 1),
           |d$Levels AS (SELECT l.g, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lf l JOIN nt USING (g)),
           |${QDigest.oracleCompressCtes(s"d$Levels", "dig", Levels,
              Seq("g"))},
           |$extCtes,
           |cw AS (SELECT g, bucket,
           |    SUM(lcnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
           |    SUM(lcnt) OVER (PARTITION BY g) AS n FROM lf),
           |exact AS (SELECT g, pct,
           |    MIN(bucket) AS exact_bucket
           |  FROM cw CROSS JOIN (SELECT * FROM (VALUES (50), (95))
           |    AS v(pct)) p
           |  WHERE cum >= (pct * n + 99) // 100
           |  GROUP BY 1, 2),
           |est_out AS ($extSel)
           |SELECT o.g, o.pct, o.est_cents,
           |  (x.exact_bucket + 1) * $CellW - 1 AS exact_cents,
           |  o.rank_le, o.target, o.rank_err, o.bound_ok, o.digest_nodes
           |FROM est_out o JOIN exact x ON x.g = o.g AND x.pct = o.pct"""
          .stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val src = Tables(spark, dir).lineitem.select(
        $"l_returnflag".as("g"), expr(bucketExpr).as("bucket"),
        $"l_quantity".cast("long").as("w"))
      val leaf = Staging.stage(src.groupBy($"g", $"bucket")
        .agg(sum($"w").cast("long").as("lcnt")), eager = false)
      val nt = leaf.groupBy($"g").agg(
        expr(s"greatest(CAST(sum(lcnt) AS BIGINT) DIV $K, " +
          "CAST(1 AS BIGINT))").as("t"))
      val d10 = leaf.join(nt, "g").select($"g",
        (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
        $"lcnt".as("cnt"), $"t")
      val dig = QDigest.compress(d10, Seq("g"), Levels)
      val est = QDigest.quantiles(dig, leaf, Seq("g"), Levels, CellW,
        Pcts)
      // exact weighted quantile over the (groups x 2^levels)-bounded
      // leaf table: one window pass, the q138 selection rule
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"bucket")
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy($"g")
      val exact = leaf
        .withColumn("cum", sum($"lcnt").over(wCum))
        .withColumn("n", sum($"lcnt").over(wAll))
        .crossJoin(broadcast(Pcts.toDF("pct")))
        .filter($"cum" >= expr("(pct * n + 99) DIV 100"))
        .groupBy($"g", $"pct").agg(min($"bucket").as("exact_bucket"))
      est.join(exact, Seq("g", "pct"))
        .select($"g", $"pct", $"est_cents",
          (($"exact_bucket" + 1) * CellW - 1).as("exact_cents"),
          $"rank_le", $"target", $"rank_err", $"bound_ok",
          $"digest_nodes")
    },

    // ---- per-window streaming percentile report -----------------------------
    Qry(
      "q309_stream_window_pcts", {
        val (extCtes, extSel) = QDigest.oracleQuantileParts(
          "dig", "lf", Seq("g", "wstart"), WLevels, WCellW, WPcts)
        s"""WITH src AS (SELECT event_type AS g,
           |    (epoch_ms(CAST(ts AS TIMESTAMP)) // $DayMs) * $DayMs
           |      AS wstart,
           |    LEAST(CAST(round(value * 100) AS BIGINT) // $WCellW,
           |          ${WNleaf - 1}) AS bucket
           |  FROM events),
           |lf AS (SELECT g, wstart, bucket,
           |    CAST(COUNT(*) AS BIGINT) AS lcnt
           |       FROM src GROUP BY 1, 2, 3),
           |d$WLevels AS (SELECT g, wstart, $WNleaf + bucket AS node,
           |    $WLevels AS lv, lcnt AS cnt, CAST($WT AS BIGINT) AS t
           |  FROM lf),
           |${QDigest.oracleCompressCtes(s"d$WLevels", "dig", WLevels,
              Seq("g", "wstart"))},
           |$extCtes
           |$extSel""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val ev = Tables(spark, dir).events.select(
          $"event_type".as("g"),
          expr(s"(unix_millis(ts) DIV $DayMs) * $DayMs").as("wstart"),
          expr(s"$WNleaf + least(CAST(round(value * 100) AS BIGINT) " +
            s"DIV $WCellW, ${WNleaf - 1})").as("node"),
          unix_millis($"ts").as("ms"))
        // leaf table for the post-sink audit (batch side, shared
        // semantics with the oracle's lf)
        val leaf = Staging.stage(
          ev.select($"g", $"wstart", ($"node" - WNleaf).as("bucket"))
            .groupBy($"g", $"wstart", $"bucket")
            .agg(count(one).as("lcnt")),
          eager = false)
        // two chronological halves split at a day boundary + sentinel:
        // every window's rows land in one batch (no late data by
        // construction); windows CLOSE across different batches
        def part(p: Int) = ev.filter(
            if (p == 0) $"ms" < SplitMs else $"ms" >= SplitMs)
          .select($"g", $"wstart", $"node", $"ms")
        val sentinel = spark.range(1).select(lit("~").as("g"),
          lit(0L).as("wstart"), lit(-1L).as("node"),
          lit(SentinelMs).as("ms"))
        val srcDir = Streams.partedDir(s"$dir#q309",
          Seq(part(0), part(1), sentinel))
        val src = spark.readStream
          .schema(part(0).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("ets", timestamp_millis($"ms"))
          .withWatermark("ets", "1 hour")
          .select($"g", $"wstart", $"node", $"ets")
          .as[(String, Long, Long, Timestamp)]
        val out = src.groupByKey(r => (r._1, r._2))
          .transformWithState(
            new QDigestWindowSketch(WT, WLevels, DayMs),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("g", "wstart", "node", "lv", "cnt")
        val sink = Streams.runToMemory(out, "append")
          .filter($"g" =!= "~")
        val dig = sink.withColumn("t", lit(WT))
        QDigest.quantiles(dig, leaf, Seq("g", "wstart"), WLevels,
          WCellW, WPcts)
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  )
}
