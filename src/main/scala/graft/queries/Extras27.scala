package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Twenty-seventh coverage wave: cohort lifetime-value curves and
  * calendar activity heatmaps. */
object Extras27 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- cohort LTV curve ----------------------------------------------
    // Users cohorted by first-activity WEEK (ISO Monday start, identical
    // in both engines); per (cohort, age-in-weeks) the active-user count
    // and decimal-exact value sum — the lifetime-value curve behind
    // q97's retention triangle. Week age is INTEGER day arithmetic
    // (epoch-day difference div 7), never a date-diff double.
    Qry(
      "q141_cohort_ltv",
      s"""WITH e AS (SELECT user_id, value,
         |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
         |  FROM events),
         |c AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY 1),
         |j AS (SELECT e.user_id, e.value, c.cohort,
         |    (e.wk - c.cohort) // 7 AS age_weeks
         |  FROM e JOIN c ON e.user_id = c.user_id)
         |SELECT cohort, CAST(age_weeks AS BIGINT) AS age_weeks,
         |  COUNT(DISTINCT user_id) AS n_active,
         |  ${dsumSql("value")} AS val_sum
         |FROM j GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .select($"user_id", $"value",
          to_date(date_trunc("week", $"ts")).as("wk"))
      val c = e.groupBy($"user_id").agg(min($"wk").as("cohort"))
      e.join(c, Seq("user_id"))
        .withColumn("age_weeks",
          ((unix_date($"wk") - unix_date($"cohort")) / 7).cast("long"))
        .groupBy($"cohort", $"age_weeks")
        .agg(countDistinct($"user_id").as("n_active"),
          dsum($"value").as("val_sum"))
    },

    // ---- calendar activity heatmap --------------------------------------
    // ISO-dow × hour-of-day activity grid with each cell's share of its
    // day — the weekly-rhythm feed (q105's dow bridge reused; the share
    // is a guarded rounded ratio of exact counts).
    Qry(
      "q142_activity_heatmap",
      """WITH g AS (SELECT
        |    CAST(isodow(CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS day_total
        |  FROM g GROUP BY 1)
        |SELECT g.dow, g.hr, g.n,
        |  round(CASE WHEN day_total > 0
        |    THEN CAST(g.n AS DOUBLE) / day_total END, 6) AS day_share
        |FROM g JOIN d ON g.dow = d.dow""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val g = t(spark, dir).events
        .groupBy((((dayofweek($"ts") + 5) % 7) + 1).as("dow"),
          hour($"ts").as("hr"))
        .agg(count(one).as("n"))
      val d = g.groupBy($"dow".as("ddow"))
        .agg(sum($"n").as("day_total"))
      g.join(d, $"dow" === $"ddow")
        .select($"dow", $"hr", $"n",
          round(when($"day_total" > 0,
            $"n".cast("double") / $"day_total"), 6).as("day_share"))
    }
  )
}
