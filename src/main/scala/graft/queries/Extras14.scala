package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.sources.Tables

/** Fourteenth coverage wave: nearest-direction as-of join. */
object Extras14 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  val all: Seq[Qry] = Seq(

    // ---- nearest as-of join (merge_asof direction='nearest') -----------
    // Each error attaches the click closest in time on either side
    // (equidistant → the past match, the causality-friendly tie).
    // Composed backward ∘ forward: two single-shuffle running-last
    // passes, zero row amplification — never a |L|×|R| theta join.
    Qry(
      "q104_asof_nearest",
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |err AS (SELECT * FROM e WHERE event_type = 'error'),
        |clk AS (SELECT * FROM e WHERE event_type = 'click'),
        |b AS (SELECT event_id, b_id, b_ms, b_value FROM (
        |    SELECT err.event_id, c.event_id AS b_id, c.ms AS b_ms,
        |      c.value AS b_value,
        |      row_number() OVER (PARTITION BY err.event_id
        |        ORDER BY c.ms DESC, c.event_id DESC) AS rn
        |    FROM err LEFT JOIN clk c
        |      ON err.user_id = c.user_id AND c.ms <= err.ms)
        |  WHERE rn = 1),
        |f AS (SELECT event_id, f_id, f_ms, f_value FROM (
        |    SELECT err.event_id, c.event_id AS f_id, c.ms AS f_ms,
        |      c.value AS f_value,
        |      row_number() OVER (PARTITION BY err.event_id
        |        ORDER BY c.ms ASC, c.event_id DESC) AS rn
        |    FROM err LEFT JOIN clk c
        |      ON err.user_id = c.user_id AND c.ms >= err.ms)
        |  WHERE rn = 1)
        |SELECT err.event_id, err.user_id, err.ms,
        |  CASE WHEN f_ms IS NULL THEN b_id
        |       WHEN b_ms IS NULL THEN f_id
        |       WHEN err.ms - b_ms <= f_ms - err.ms THEN b_id
        |       ELSE f_id END AS near_id,
        |  CASE WHEN f_ms IS NULL THEN b_value
        |       WHEN b_ms IS NULL THEN f_value
        |       WHEN err.ms - b_ms <= f_ms - err.ms THEN b_value
        |       ELSE f_value END AS near_value,
        |  CASE WHEN f_ms IS NULL THEN err.ms - b_ms
        |       WHEN b_ms IS NULL THEN f_ms - err.ms
        |       WHEN err.ms - b_ms <= f_ms - err.ms THEN err.ms - b_ms
        |       ELSE f_ms - err.ms END AS asof_gap
        |FROM err
        |  JOIN b ON err.event_id = b.event_id
        |  JOIN f ON err.event_id = f.event_id""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val ev = t(spark, dir).events
          .select($"event_id", $"user_id", $"event_type", $"value",
            unix_millis($"ts").as("ms"))
        val errors = ev.filter($"event_type" === "error")
          .select($"event_id", $"user_id", $"ms")
        val clicks = ev.filter($"event_type" === "click")
        AsOfJoin.nearest(
            errors, clicks,
            keys = Seq("user_id" -> "user_id"),
            leftTime = "ms", rightTime = "ms",
            carry = Seq("event_id" -> "near_id", "value" -> "near_value"),
            rightTieBreak = Seq("event_id"))
          .select($"event_id", $"user_id", $"ms",
            $"near_id", $"near_value", $"asof_gap")
    },

    // ---- ISO calendar bucketing ----------------------------------------
    // Calendar roll-ups on the ISO-8601 grid. Dialect bridge: Spark's
    // dayofweek is 1=Sunday, DuckDB's isodow is 1=Monday — both sides
    // emit the ISO convention (Monday=1), Spark via (dow+5)%7+1.
    // weekofyear is ISO week in both engines.
    Qry(
      "q105_iso_calendar",
      """SELECT year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1, 2, 3, 4""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).orders
        .groupBy(year($"o_orderdate").as("y"),
          quarter($"o_orderdate").as("q"),
          weekofyear($"o_orderdate").as("iso_week"),
          (((dayofweek($"o_orderdate") + 5) % 7) + 1).as("iso_dow"))
        .agg(count(lit(1)).as("n"))
    }
  )
}
