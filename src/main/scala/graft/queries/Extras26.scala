package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.Sessionize
import graft.sources.Tables

/** Twenty-sixth coverage wave: weighted median, in-session conversion,
  * and period-over-period deltas. */
object Extras26 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- weighted median (quantity-weighted price) ---------------------
    // The weighted-percentile family: order by value, accumulate integer
    // weights, pick the first value whose doubled cumulative weight
    // crosses the total. The SELECTED price is emitted (never computed),
    // weights stay exact BIGINT, and cumulative weights are strictly
    // increasing so min_by's comparand is collision-free. One sorted
    // window + one aggregate per group.
    Qry(
      "q138_weighted_median",
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
        |    CAST(l_quantity AS BIGINT) AS w,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag) AS BIGINT) AS totw
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(MAX(totw) AS BIGINT) AS total_weight,
        |  arg_min(l_extendedprice, cumw) AS weighted_median
        |FROM r WHERE cumw * 2 >= totw
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wOrd = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"l_returnflag")
      t(spark, dir).lineitem
        .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
          $"l_linenumber", $"l_quantity".cast("long").as("w"))
        .withColumn("cumw", sum($"w").over(wOrd))
        .withColumn("totw", sum($"w").over(wAll))
        .filter($"cumw" * 2 >= $"totw")
        .groupBy($"l_returnflag")
        .agg(max($"totw").as("total_weight"),
          min_by($"l_extendedprice", $"cumw").as("weighted_median"))
    },

    // ---- in-session conversion ------------------------------------------
    // Sessionize (30-minute gap, q30's semantics), then flag sessions
    // where some purchase lands at-or-after the first click — the
    // within-session conversion rate. Session assembly is one shuffle;
    // the conversion test is two conditional aggregates per session.
    Qry(
      "q139_session_conversion",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |flags AS (
        |  SELECT user_id, event_id, event_type, ms,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |           OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END
        |      AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (
        |  SELECT user_id, event_type, ms,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flags),
        |s AS (SELECT user_id, sid,
        |    MIN(CASE WHEN event_type = 'click' THEN ms END) AS first_click,
        |    MAX(CASE WHEN event_type = 'purchase' THEN ms END)
        |      AS last_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN first_click IS NOT NULL
        |    AND last_purchase IS NOT NULL
        |    AND last_purchase >= first_click THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted
        |FROM s GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
      Sessionize.byGap(ev, Seq("user_id"), "ms", gapMs = 1800000L,
          tieBreak = Seq("event_id"))
        .groupBy($"user_id", $"session_id")
        .agg(
          min(when($"event_type" === "click", $"ms")).as("first_click"),
          max(when($"event_type" === "purchase", $"ms"))
            .as("last_purchase"))
        .groupBy($"user_id")
        .agg(count(one).as("n_sessions"),
          sum(when($"first_click".isNotNull && $"last_purchase".isNotNull
            && $"last_purchase" >= $"first_click", 1L).otherwise(0L))
            .as("n_converted"))
    },

    // ---- month-over-month revenue change --------------------------------
    // Period-over-period deltas per series: decimal-exact monthly sums,
    // lag window, one guarded rounded ratio — the BI trend shape.
    Qry(
      "q140_mom_change",
      s"""WITH m AS (SELECT l_returnflag,
         |    date_trunc('month', l_shipdate) AS month,
         |    ${dsumSql("l_extendedprice")} AS rev
         |  FROM lineitem GROUP BY 1, 2),
         |p AS (SELECT l_returnflag, month, rev,
         |    lag(rev) OVER (PARTITION BY l_returnflag ORDER BY month)
         |      AS prev
         |  FROM m)
         |SELECT l_returnflag, month, rev,
         |  round(CASE WHEN prev > 0 THEN (rev - prev) / prev END, 6)
         |    AS mom_change
         |FROM p""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"l_returnflag").orderBy($"month")
      t(spark, dir).lineitem
        .groupBy($"l_returnflag",
          date_trunc("month", $"l_shipdate").as("month"))
        .agg(dsum($"l_extendedprice").as("rev"))
        .withColumn("prev", lag($"rev", 1).over(w))
        .select($"l_returnflag", $"month", $"rev",
          round(when($"prev" > 0, ($"rev" - $"prev") / $"prev"), 6)
            .as("mom_change"))
    }
  )
}
