package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.AsOfJoin
import graft.sources.Tables

/** Twenty-fifth coverage wave: last-touch attribution (as-of join with
  * tolerance under the gate) and log-scale gap histograms. */
object Extras25 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- last-touch attribution (as-of + tolerance) --------------------
    // Each purchase attributes to the SAME USER's latest click no older
    // than 30 minutes — the marketing-attribution shape, and the gate
    // coverage for AsOfJoin's tolerance parameter (matches beyond the
    // window become NULL, not dropped rows). Same single-shuffle
    // union+window machinery as q25.
    Qry(
      "q136_attribution",
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |base AS (
        |  SELECT p.event_id, p.user_id,
        |    CASE WHEN p.ms - c.ms <= 1800000 THEN c.event_id END
        |      AS click_id,
        |    CASE WHEN p.ms - c.ms <= 1800000 THEN p.ms - c.ms END
        |      AS age_ms,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ms DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ms <= p.ms)
        |SELECT user_id,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_attributed,
        |  CAST(SUM(COALESCE(age_ms, 0)) AS BIGINT) AS age_ms_sum
        |FROM base WHERE rn = 1
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"event_id", $"user_id", unix_millis($"ts").as("ms"),
          $"event_type", $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ms")
      val clicks = ev.filter($"event_type" === "click")
      AsOfJoin.backward(
          purchases, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "ms",
          carry = Seq("event_id" -> "click_id", "ms" -> "click_ms"),
          rightTieBreak = Seq("event_id"),
          tolerance = Some(1800000L))
        .groupBy($"user_id")
        .agg(count(one).as("n_purchases"),
          sum(when($"click_id".isNotNull, 1L).otherwise(0L))
            .as("n_attributed"),
          sum(coalesce($"ms" - $"click_ms", lit(0L))).as("age_ms_sum"))
    },

    // ---- log-scale inter-event gap histogram ---------------------------
    // Power-of-two bucketing of inter-event gaps per event type — the
    // latency-histogram shape (the reference reports its latencies in
    // percentile bands; a log2 histogram is the streaming-friendly
    // fixed-width equivalent). floor(log2(n)) is exact for BIGINT gaps
    // in both engines (log2 of an integer never lands within an ulp of
    // an integer unless the input is a power of two, where it is exact).
    Qry(
      "q137_gap_histogram",
      """WITH e AS (SELECT event_type, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |g AS (SELECT event_type,
        |    ms - lag(ms) OVER (PARTITION BY event_type
        |      ORDER BY ms, event_id) AS gap
        |  FROM e),
        |b AS (SELECT event_type,
        |    CASE WHEN gap <= 0 THEN -1
        |      ELSE CAST(floor(log2(CAST(gap AS DOUBLE))) AS BIGINT) END
        |      AS bucket
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT event_type, bucket, COUNT(*) AS n
        |FROM b GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"ms", $"event_id")
      t(spark, dir).events
        .select($"event_type", $"event_id", unix_millis($"ts").as("ms"))
        .withColumn("gap", $"ms" - lag($"ms", 1).over(w))
        .filter($"gap".isNotNull)
        .withColumn("bucket",
          when($"gap" <= 0, lit(-1L))
            .otherwise(floor(log2($"gap".cast("double"))).cast("long")))
        .groupBy($"event_type", $"bucket")
        .agg(count(one).as("n"))
    }
  )
}
