package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.NativeAsOf
import graft.sources.Tables

/** Twentieth coverage wave: the native as-of join plan node under the
  * oracle gate. */
object Extras20 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  val all: Seq[Qry] = Seq(

    // ---- native as-of join (custom LogicalPlan/Strategy/SparkPlan) -----
    // q25's semantics routed through plans/AsOfJoinPlan →
    // plans/AsOfJoinExec (injected planner strategy): two co-partitioned
    // sorted children + one O(|L|+|R|) streaming merge per partition,
    // O(1) merge state, zero row amplification. The union+window
    // formulation (q25) and this node are checked against the SAME
    // declarative oracle, so the custom operator is gate-verified, not
    // just spec-verified.
    Qry(
      "q129_asof_native",
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type, value
        |  FROM events)
        |SELECT event_id, user_id, ms, value,
        |  click_id, click_value, ms - click_ms AS gap_ms
        |FROM (
        |  SELECT err.*, c.event_id AS click_id, c.ms AS click_ms,
        |    c.value AS click_value,
        |    row_number() OVER (PARTITION BY err.event_id
        |                       ORDER BY c.ms DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM e WHERE event_type = 'error') err
        |  LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |    ON err.user_id = c.user_id AND c.ms <= err.ms)
        |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"event_id", $"user_id", unix_millis($"ts").as("ms"),
          $"event_type", $"value")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ms", $"value")
      val clicks = ev.filter($"event_type" === "click")
      NativeAsOf.backward(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "ms",
          carry = Seq("event_id" -> "click_id", "ms" -> "click_ms",
            "value" -> "click_value"),
          rightTieBreak = Seq("event_id"))
        .select($"event_id", $"user_id", $"ms", $"value",
          $"click_id", $"click_value", ($"ms" - $"click_ms").as("gap_ms"))
    }
  )
}
