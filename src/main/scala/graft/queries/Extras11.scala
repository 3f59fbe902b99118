package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Eleventh coverage wave: product-analytics operators over the event
  * log — ordered funnels, cohort retention, and transition matrices.
  * All integer-valued outputs (counts, day buckets), so cross-engine
  * determinism is structural, not a rounding exercise. */
object Extras11 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- ordered funnel (signup → click → purchase) --------------------
    // Stage N counts users whose earliest stage-N event STRICTLY follows
    // their stage-(N-1) anchor. Each stage is a per-user MIN aggregate +
    // an equi-join on user_id — never a self-cross; at scale the stage
    // frames are user-cardinality (dim-sized vs the event log) and the
    // three final counts are single-row aggregates.
    Qry(
      "q96_funnel",
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |s AS (SELECT user_id, MIN(ms) AS s_ms FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ms) AS c_ms FROM e
        |      JOIN s ON e.user_id = s.user_id AND e.ms > s.s_ms
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ms) AS p_ms FROM e
        |      JOIN c ON e.user_id = c.user_id AND e.ms > c.c_ms
        |      WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
        |  (SELECT COUNT(*) FROM c) AS n_click_after,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_after""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val e = t(spark, dir).events
          .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
        val s = e.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ms").as("s_ms"))
        val c = e.filter($"event_type" === "click")
          .join(s.withColumnRenamed("user_id", "su"),
            $"user_id" === $"su" && $"ms" > $"s_ms")
          .groupBy($"user_id").agg(min($"ms").as("c_ms"))
        val p = e.filter($"event_type" === "purchase")
          .join(c.withColumnRenamed("user_id", "cu"),
            $"user_id" === $"cu" && $"ms" > $"c_ms")
          .groupBy($"user_id").agg(min($"ms").as("p_ms"))
        s.agg(count(one).as("n_signup"))
          .crossJoin(c.agg(count(one).as("n_click_after")))
          .crossJoin(p.agg(count(one).as("n_purchase_after")))
    },

    // ---- cohort retention (daily cohorts × day offset) -----------------
    // Users cohorted by first-activity day; retention = distinct users
    // active at each day offset. Two hash aggregates + one equi-join on
    // user_id; day buckets are integer epoch-day arithmetic.
    Qry(
      "q97_retention",
      """WITH e AS (SELECT user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY 1)
        |SELECT f.day0 AS cohort_day, e.day - f.day0 AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .select($"user_id",
          expr("unix_millis(ts) div 86400000").as("day"))
      val f = e.groupBy($"user_id".as("fu")).agg(min($"day").as("day0"))
      e.join(f, $"user_id" === $"fu")
        .groupBy($"day0".as("cohort_day"),
          ($"day" - $"day0").as("day_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
    },

    // ---- event-transition matrix ---------------------------------------
    // Markov transition counts between consecutive event types per user
    // (one window pass + one hash aggregate) — the sequence-model view of
    // the log the reference's consumers only see as independent records.
    Qry(
      "q98_transitions",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |l AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS prev_type
        |  FROM e)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      t(spark, dir).events
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(one).as("n"))
    }
  )
}
