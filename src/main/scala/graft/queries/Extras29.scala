package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Twenty-ninth coverage wave: linear interpolation over a calendar
  * spine — the missing member of the gap-handling family (q71 LOCF
  * fill-forward, q118 zero-fill; this one reconstructs interior values
  * from BOTH neighbors, the standard time-series-db resampling fill). */
object Extras29 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  val all: Seq[Qry] = Seq(

    // ---- linear interpolation on per-user daily series ------------------
    // Per-user daily mean value (decimal-exact mean), spine over each
    // user's own [first, last] active day (sequence()/explode — q118's
    // bounded per-group generator), then every MISSING interior day gets
    // v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev) from the
    // nearest observed neighbors via IGNORE NULLS running windows
    // (q71's proven cross-engine construct; both directions here). Gap
    // rows are strictly interior — the spine is bounded by observed
    // days — so neighbors always exist. One shuffle on user_id carries
    // both windows; day arithmetic is integer (epoch days); the final
    // double expression is evaluated identically by both engines and
    // rounded at 6 dp. Only the interpolated rows are emitted.
    Qry(
      "q144_linear_interp",
      s"""WITH daily AS (SELECT user_id,
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         |    ${davgSql("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
         |  FROM daily GROUP BY 1),
         |spine AS (SELECT user_id,
         |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
         |      AS day
         |  FROM b),
         |j AS (SELECT s.user_id, s.day,
         |    date_diff('day', DATE '1970-01-01', s.day) AS di, d.v
         |  FROM spine s LEFT JOIN daily d
         |    ON s.user_id = d.user_id AND s.day = d.day),
         |f AS (SELECT user_id, day, di, v,
         |    last_value(v IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
         |      OVER wp AS pdi,
         |    first_value(v IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
         |      OVER wn AS ndi
         |  FROM j
         |  WINDOW wp AS (PARTITION BY user_id ORDER BY di
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY di
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, day, CAST(ndi - pdi AS BIGINT) AS gap_len,
         |  round(pv + (nv - pv) * (CAST(di - pdi AS DOUBLE)
         |    / CAST(ndi - pdi AS DOUBLE)), 6) AS v_interp
         |FROM f WHERE v IS NULL""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val daily = t(spark, dir).events
        .select($"user_id", to_date(date_trunc("day", $"ts")).as("day"),
          $"value")
        .groupBy($"user_id", $"day")
        .agg(davg($"value").as("v"))
      val spine = daily.groupBy($"user_id")
        .agg(min($"day").as("lo"), max($"day").as("hi"))
        .select($"user_id",
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val j = spine.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", unix_date($"day").as("di"), $"v")
      val wp = Window.partitionBy($"user_id").orderBy($"di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy($"user_id").orderBy($"di")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDi = when($"v".isNotNull, $"di")
      j.select($"user_id", $"day", $"di", $"v",
          last($"v", ignoreNulls = true).over(wp).as("pv"),
          last(obsDi, ignoreNulls = true).over(wp).as("pdi"),
          first($"v", ignoreNulls = true).over(wn).as("nv"),
          first(obsDi, ignoreNulls = true).over(wn).as("ndi"))
        .filter($"v".isNull)
        .select($"user_id", $"day",
          ($"ndi" - $"pdi").cast("long").as("gap_len"),
          round($"pv" + ($"nv" - $"pv") *
            (($"di" - $"pdi").cast("double") /
              ($"ndi" - $"pdi").cast("double")), 6).as("v_interp"))
    }
  )
}
