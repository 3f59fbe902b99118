package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact.{dsum, dsumSql}
import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-thirty-ninth coverage wave: the streaming observability row
  * GATED — the monitoring loop closed in-result, not just in specs
  * (r12 verdict ask #7).
  *
  *  - q354: a deliberately half-late events stream: micro-batch 1
  *    delivers the NEWER half of the slice (by the slice's own median
  *    timestamp); micro-batch 2 is a far-future watermark-advance
  *    sentinel (needed as its OWN batch: the late-record filter uses
  *    the watermark as of the START of each batch — probed
  *    empirically — so the advance and the late arrivals must be
  *    batch-separated, exactly the production shape where lateness
  *    means "a later trigger"); micro-batch 3 delivers the OLDER
  *    half — every row of it now ~15 days behind the watermark, so
  *    the windowed aggregation DROPS all of them and reports the drop
  *    through `numRowsDroppedByWatermark` (the engine-side twin of
  *    the reference consumers' printed progress counters,
  *    integration_test.rs:272-277). METRIC SEMANTICS, pinned by the
  *    oracle: the stateful operator sits above the final merge, so
  *    what it counts is dropped STATE rows — one per distinct closed
  *    window per micro-batch (360 here: 15 days x 24 h), not raw
  *    late input rows; deterministic because the exchange has already
  *    collapsed per-task partials. The gated output: the per-hour
  *    counts/sums — which must reflect ONLY the on-time half — with
  *    the MEASURED drop count as a grid constant, against an oracle
  *    that PREDICTS both from the synthesis parameters (windows over
  *    rows above the median; drops = distinct hour-windows at or
  *    below it). A one-row disagreement between the runtime's
  *    self-reported monitoring number and first-principles arithmetic
  *    fails the gate — observability is now a correctness surface.
  *    Margins are boundary-free: the 30-day span dwarfs the 1-hour
  *    window + 60 s delay, so no row sits near the watermark; the
  *    sentinel's own window never finalizes, so it never appears.
  *
  * Scale shape: one streaming aggregation keyed by hour window (state
  * = open windows only, time-bounded by the watermark); the split is
  * one bounded (min, max) driver row (q254's device); the drop metric
  * rides the progress reports the runtime already emits.
  */
object Extras139 {

  private val DelayMs = 60000L

  val all: Seq[Qry] = Seq(

    Qry(
      "q354_stream_late_audit",
      s"""WITH e AS (SELECT user_id,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
         |b AS (SELECT MIN(ms) AS lo, MAX(ms) AS hi FROM e),
         |p1 AS (SELECT e.* FROM e, b WHERE ms > lo + (hi - lo) // 2),
         |drops AS (SELECT CAST(COUNT(DISTINCT ms // 3600000) AS BIGINT)
         |    AS dropped_rows
         |  FROM e, b WHERE ms <= lo + (hi - lo) // 2)
         |SELECT (ms // 3600000) * 3600000 AS ws_ms,
         |  CAST(COUNT(*) AS BIGINT) AS n, ${dsumSql("value")} AS vsum,
         |  drops.dropped_rows
         |FROM p1 CROSS JOIN drops
         |GROUP BY 1, drops.dropped_rows""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
        .select($"user_id", unix_millis($"ts").as("ms"), $"value")
      // bounded driver state: one (min, max) row (q254's device) sizes
      // the split and the sentinel
      val mm = ev.agg(min($"ms"), max($"ms")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val mid = lo + (hi - lo) / 2
      val onTime = ev.filter($"ms" > mid)
      val late = ev.filter($"ms" <= mid)
      // far enough that the final watermark passes every real window
      // end (≤ hi + 1 h) but never the sentinel's own window; delivered
      // BEFORE the late part (late-record filtering uses the
      // start-of-batch watermark) and repeated after it (identical ms —
      // a pure flush tick, no further watermark movement)
      val adv = spark.range(1).select(lit(-1L).as("user_id"),
        lit(hi + DelayMs + 2 * 3600000L).as("ms"), lit(0.0).as("value"))
      val srcDir = Streams.partedDir(s"$dir#q354",
        Seq(onTime, adv, late, adv))
      val src = spark.readStream.schema(onTime.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .withColumn("ets", timestamp_millis($"ms"))
        .withWatermark("ets", s"$DelayMs milliseconds")
      val agg = src.groupBy(window($"ets", "1 hour"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          dsum($"value").as("vsum"))
      val (out, dropped) = Streams.runToMemoryWithDrops(agg, "append")
      out.select(unix_millis($"window.start").as("ws_ms"), $"n", $"vsum",
        lit(dropped).as("dropped_rows"))
    }
  )
}
