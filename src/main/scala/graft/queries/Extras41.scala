package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Dedup, Staging, TextOps}
import graft.sources.Tables
import graft.streaming.Streams

/** Forty-first coverage wave: warehouse change-tracking, corpus source
  * economics, and streaming-operations diagnostics.
  *
  *  - SCD2 validity intervals (q167): the slowly-changing-dimension
  *    type-2 build — collapse each user's event-type history to change
  *    points with [from, to) validity, the standard warehouse shape for
  *    "what was true when". Complements q80 (merge/upsert keeps latest)
  *    and q93 (snapshot at T) with the full versioned history.
  *  - Source novelty (q168): per-source marginal contribution — the
  *    fraction of a source's shingles found in NO other source. The
  *    buy-or-drop economics of a crawl: a source whose content is
  *    entirely replicated elsewhere adds volume, not information.
  *  - Streaming trending top-k (q169): sliding-window event-type ranking
  *    (30 min windows, 15 min slide) — the live-dashboard shape; the
  *    streaming agg runs to completion and the rank is assigned over the
  *    final windows, oracle-checked by enumerating each event's two
  *    covering windows in SQL.
  *  - CUSUM mean-shift detection (q170): the classic change-point
  *    monitor over each event-value series — running deviation-from-
  *    mean sums whose extremes (and their times) localize level shifts.
  *    Complements q111 (drawdown on running sums) and q112 (pointwise
  *    MAD outliers) with the sustained-shift detector between them.
  *    (An event-time lateness audit was tried for this slot and
  *    dropped: the fixture's per-user streams are perfectly ordered,
  *    so the result was a degenerate single row.)
  */
object Extras41 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  private val SlideMs = 900000L // 15 min
  private val TrendK = 3

  /** events as (user_id, event_id, ms, event_type, value) — q31's idiom:
    * ms-precision arithmetic, (ms, event_id) as the deterministic order. */
  private val eventsMsSql =
    """SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
      |  event_type, value FROM events""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- SCD2: event-type validity intervals per user -----------------
    // Change points via lag(); validity end via lead() over the SAME
    // (user_id)-partitioned order, so both windows share one exchange +
    // sort (confirmed in the plan dump). valid_to is NULL for the open
    // current version — the SCD2 convention. Scale shape: one user_id
    // shuffle, two window passes over sorted runs, no joins.
    Qry(
      "q167_scd2_intervals",
      s"""WITH e AS ($eventsMsSql),
         |chg AS (
         |  SELECT user_id, ms, event_id, event_type,
         |    lag(event_type) OVER w AS prev
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |cp AS (SELECT user_id, ms, event_id, event_type FROM chg
         |       WHERE prev IS NULL OR prev <> event_type)
         |SELECT user_id, row_number() OVER w AS version, event_type,
         |  ms AS valid_from_ms, lead(ms) OVER w AS valid_to_ms
         |FROM cp WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .select($"user_id", row_number().over(w).as("version"),
          $"event_type", $"ms".as("valid_from_ms"),
          lead($"ms", 1).over(w).as("valid_to_ms"))
    },

    // ---- per-source novel-content contribution ------------------------
    // Distinct (source, shingle) pairs — STAGED, because the frame feeds
    // both the per-shingle source-count aggregate and the per-source
    // rollup (the countedShingles discipline); the corpus tokenizes
    // once. novelty_ppm is BIGINT: unique-to-this-source shingles per
    // million of the source's shingles. Scale shape: explode → two
    // hash-aggregate pairs + one equi-join on h, all partial-agg
    // map-side; output is |sources| rows.
    Qry(
      "q168_source_novelty",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |sp AS (SELECT DISTINCT d.source, s.h
         |       FROM sh s JOIN documents d ON s.doc_id = d.doc_id),
         |hs AS (SELECT h, COUNT(*) AS n_src FROM sp GROUP BY 1)
         |SELECT source, COUNT(*) AS n_sh,
         |  CAST(COUNT(*) FILTER (WHERE n_src = 1) AS BIGINT) AS n_unique,
         |  (1000000 * COUNT(*) FILTER (WHERE n_src = 1)) // COUNT(*)
         |    AS novelty_ppm
         |FROM sp JOIN hs USING (h)
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir).documents
      val sp = Staging.stage(
        Dedup.shingleHashes(docs, "doc_id", "text", 3)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .select($"source", $"h").distinct(),
        eager = false)
      val hs = sp.groupBy($"h").agg(count(lit(1)).as("n_src"))
      sp.join(hs, "h")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_sh"),
          sum(when($"n_src" === 1, 1L).otherwise(0L)).as("n_unique"))
        .select($"source", $"n_sh", $"n_unique",
          expr("(1000000 * n_unique) DIV n_sh").as("novelty_ppm"))
    },

    // ---- streaming sliding-window trending top-k ----------------------
    // A real streaming query (file-stream → watermark → 30 min windows
    // sliding 15 min → memory sink) ranked after completion; the oracle
    // enumerates each event's two covering windows. Scale shape: the
    // streaming agg state is (windows × types)-bounded; the rank runs
    // over the final agg output (windows × types rows), top-k per window
    // via rank-limit pushdown.
    Qry(
      "q169_stream_trending",
      s"""WITH e AS ($eventsMsSql),
         |wins AS (SELECT event_type,
         |    unnest([ms - ms % $SlideMs, ms - ms % $SlideMs - $SlideMs])
         |      AS wstart_ms
         |  FROM e),
         |agg AS (SELECT wstart_ms, event_type, COUNT(*) AS n
         |        FROM wins GROUP BY 1, 2)
         |SELECT wstart_ms, rk, event_type, n
         |FROM (SELECT *, row_number() OVER (PARTITION BY wstart_ms
         |        ORDER BY n DESC, event_type) AS rk FROM agg)
         |WHERE rk <= $TrendK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStream(spark, dir, "events")
      val agg = src
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "30 minutes", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
      Streams.runToMemory(agg, "complete")
        .select(unix_millis($"window.start").as("wstart_ms"),
          $"event_type", $"n")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"wstart_ms").orderBy($"n".desc, $"event_type")))
        .filter($"rk" <= TrendK)
        .select($"wstart_ms", $"rk", $"event_type", $"n")
    },

    // ---- CUSUM mean-shift detection per event series ------------------
    // The change-point monitor: running sum of deviations from the
    // series mean; a sustained level shift drives the path to its
    // extremes, white noise keeps it near zero. Peak/trough AND their
    // times ship per series. Determinism: the mean is decimal-exact;
    // per-row deviation is row-local double on that shared mean; the
    // running sum accumulates in DECIMAL over a set-defined prefix
    // (order-independent within each prefix); peak/trough are min/max
    // of those exact values, and their locations match on the exact
    // bit pattern with MIN(ms) as the tie-break. Scale shape: one
    // event_type exchange, one sorted window pass, 5-row output — the
    // q111 drawdown discipline applied to deviation paths.
    Qry(
      "q170_cusum_shift",
      s"""WITH e AS ($eventsMsSql),
         |d AS (SELECT event_type, ms, event_id, value,
         |    CAST(SUM(CAST(value AS DECIMAL(28,6)))
         |        OVER (PARTITION BY event_type) AS DOUBLE)
         |      / COUNT(value) OVER (PARTITION BY event_type) AS mean
         |  FROM e),
         |cs AS (SELECT event_type, ms,
         |    CAST(SUM(CAST(value - mean AS DECIMAL(28,6)))
         |      OVER (PARTITION BY event_type ORDER BY ms, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS DOUBLE) AS cusum
         |  FROM d),
         |x AS (SELECT event_type, ms, cusum,
         |    MAX(cusum) OVER (PARTITION BY event_type) AS peak,
         |    MIN(cusum) OVER (PARTITION BY event_type) AS trough
         |  FROM cs)
         |SELECT event_type, COUNT(*) AS n,
         |  MAX(peak) AS peak, MIN(CASE WHEN cusum = peak THEN ms END)
         |    AS peak_ms,
         |  MAX(trough) AS trough, MIN(CASE WHEN cusum = trough THEN ms END)
         |    AS trough_ms
         |FROM x GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .select($"event_type", $"event_id", unix_millis($"ts").as("ms"),
          $"value")
      val wRun = Window.partitionBy($"event_type")
        .orderBy($"ms", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"event_type")
      // the series mean as an UNORDERED window over the same partition
      // key (decimal-exact) — not a separate aggregate + join, which
      // planned a second full scan of events
      // COUNT(value), not COUNT(*): with NULL values the sum drops them
      // but COUNT(*) would still count them, biasing the mean (the
      // fixture is non-null; this pins avg() semantics either way)
      e.withColumn("mean",
          sum($"value".cast(graft.Exact.Money)).over(wAll).cast("double")
            / count($"value").over(wAll))
        .withColumn("cusum",
          sum(($"value" - $"mean").cast(graft.Exact.Money)).over(wRun)
            .cast("double"))
        .withColumn("peak", max($"cusum").over(wAll))
        .withColumn("trough", min($"cusum").over(wAll))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          max($"peak").as("peak"),
          min(when($"cusum" === $"peak", $"ms")).as("peak_ms"),
          max($"trough").as("trough"),
          min(when($"cusum" === $"trough", $"ms")).as("trough_ms"))
    }
  )
}
