package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.operators.{AsOfJoin, RangeJoin, Sessionize}
import graft.sources.Tables

/** Time-series operator surface (SURVEY.md §7.1 step 3): as-of join,
  * interval join, tumbling-window aggregation, OHLC resampling,
  * sessionization, tick-to-tick deltas, VWAP.
  *
  * These are the first-class versions of the analytics the reference runs
  * in consumer threads (VWAP tracking
  * `/root/reference/src/tests/integration_test.rs:241-255`, event-time lag
  * `:257-270`) plus the canonical tsdb operators it lacks (SURVEY.md §2.4).
  *
  * All event-time arithmetic is in epoch milliseconds (exact integers) or
  * µs-truncated timestamps, matching DuckDB's `CAST(ns AS TIMESTAMP)` /
  * `epoch_ms` semantics on the nanosecond fixture column (Tables.events).
  */
object TimeSeries {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  // DuckDB-side views of the events table used by several oracles.
  private val eventsMsSql =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |  epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type, value
      |FROM events""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- backward as-of join: latest click before each error ------------
    Qry(
      "q25_asof_join",
      s"""WITH e AS ($eventsMsSql)
         |SELECT event_id, user_id, ts, value,
         |  click_id, click_ts, click_value,
         |  ms - click_ms AS gap_ms
         |FROM (
         |  SELECT err.*, c.event_id AS click_id, c.ts AS click_ts,
         |    c.ms AS click_ms, c.value AS click_value,
         |    row_number() OVER (PARTITION BY err.event_id
         |                       ORDER BY c.ms DESC, c.event_id DESC) AS rn
         |  FROM (SELECT * FROM e WHERE event_type = 'error') err
         |  LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |    ON err.user_id = c.user_id AND c.ms <= err.ms)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"event_id", $"user_id", $"ts", unix_millis($"ts").as("ms"),
          $"event_type", $"value")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts", $"ms", $"value")
      val clicks = ev.filter($"event_type" === "click")
      AsOfJoin.backward(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "ms",
          carry = Seq("event_id" -> "click_id", "ts" -> "click_ts",
            "ms" -> "click_ms", "value" -> "click_value"),
          rightTieBreak = Seq("event_id"))
        .select($"event_id", $"user_id", $"ts", $"value",
          $"click_id", $"click_ts", $"click_value",
          ($"ms" - $"click_ms").as("gap_ms"))
    },

    // ---- forward as-of join: next click at/after each error ------------
    Qry(
      "q73_asof_forward",
      s"""WITH e AS ($eventsMsSql)
         |SELECT event_id, user_id, ts, value,
         |  click_id, click_value, click_ms - ms AS wait_ms
         |FROM (
         |  SELECT err.*, c.event_id AS click_id, c.ms AS click_ms,
         |    c.value AS click_value,
         |    row_number() OVER (PARTITION BY err.event_id
         |                       ORDER BY c.ms ASC, c.event_id DESC) AS rn
         |  FROM (SELECT * FROM e WHERE event_type = 'error') err
         |  LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |    ON err.user_id = c.user_id AND c.ms >= err.ms)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"event_id", $"user_id", $"ts", unix_millis($"ts").as("ms"),
          $"event_type", $"value")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts", $"ms", $"value")
      val clicks = ev.filter($"event_type" === "click")
      AsOfJoin.forward(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "ms",
          carry = Seq("event_id" -> "click_id", "ms" -> "click_ms",
            "value" -> "click_value"),
          rightTieBreak = Seq("event_id"))
        .select($"event_id", $"user_id", $"ts", $"value",
          $"click_id", $"click_value",
          ($"click_ms" - $"ms").as("wait_ms"))
    },

    // ---- VWAP per symbol per period (reference's flagship analytic) ----
    // price*qty ≡ l_extendedprice; symbol ≡ l_suppkey; period ≡ month.
    Qry(
      "q26_vwap",
      s"""SELECT l_suppkey, date_trunc('month', l_shipdate) AS month,
         |  ${dsumSql("l_extendedprice")} / ${dsumSql("l_quantity")} AS vwap,
         |  ${dsumSql("l_quantity")} AS volume,
         |  COUNT(*) AS n_trades
         |FROM lineitem
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .groupBy($"l_suppkey",
          to_date(date_trunc("month", $"l_shipdate")).as("month"))
        .agg(
          (dsum($"l_extendedprice") / dsum($"l_quantity")).as("vwap"),
          dsum($"l_quantity").as("volume"),
          count(one).as("n_trades"))
    },

    // ---- tumbling event-time window aggregation ------------------------
    Qry(
      "q27_tumbling_window",
      s"""SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |    AS bucket,
         |  event_type, COUNT(*) AS n, ${dsumSql("value")} AS val_sum,
         |  ${davgSql("value")} AS val_avg
         |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy(window($"ts", "15 minutes"), $"event_type")
        .agg(count(one).as("n"), dsum($"value").as("val_sum"),
          davg($"value").as("val_avg"))
        .select($"window.start".as("bucket"), $"event_type",
          $"n", $"val_sum", $"val_avg")
    },

    // ---- interval join: clicks in the hour before each purchase --------
    Qry(
      "q28_range_join",
      s"""WITH e AS ($eventsMsSql),
         |  p AS (SELECT event_id, user_id, ts, ms FROM e
         |        WHERE event_type = 'purchase'),
         |  c AS (SELECT user_id AS cu, ms AS cms, value AS cval FROM e
         |        WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, p.ts,
         |  COUNT(c.cms) AS n_clicks,
         |  ${dsumSql("c.cval")} AS click_val_sum
         |FROM p LEFT JOIN c
         |  ON p.user_id = c.cu AND c.cms >= p.ms - 3600000 AND c.cms < p.ms
         |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"event_id", $"user_id", $"ts", unix_millis($"ts").as("ms"),
          $"event_type", $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"ms")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ms".as("cms"), $"value".as("cval"))
      val joined = RangeJoin.intervalJoin(
        purchases, clicks,
        leftKey = "user_id", rightKey = "cu",
        leftTimeMs = "ms", rightTimeMs = "cms",
        beforeMs = 3600000L, afterMs = 0L, bucketMs = 3600000L)
      val perPurchase = joined.groupBy($"event_id".as("eid"))
        .agg(count(one).as("n_clicks"), dsum($"cval").as("click_val_sum"))
      purchases.join(perPurchase, $"event_id" === $"eid", "left")
        .select($"event_id", $"user_id", $"ts",
          coalesce($"n_clicks", lit(0L)).as("n_clicks"), $"click_val_sum")
    },

    // ---- OHLC resampling (downsample to 15-minute bars) ----------------
    Qry(
      "q29_resample_ohlc",
      s"""WITH b AS (
         |  SELECT event_type,
         |    time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      AS bucket,
         |    value,
         |    row_number() OVER (PARTITION BY event_type,
         |        time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rna,
         |    row_number() OVER (PARTITION BY event_type,
         |        time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rnd
         |  FROM events)
         |SELECT event_type, bucket,
         |  MAX(CASE WHEN rna = 1 THEN value END) AS open,
         |  MAX(CASE WHEN rnd = 1 THEN value END) AS close,
         |  MAX(value) AS high, MIN(value) AS low,
         |  COUNT(*) AS n, ${dsumSql("value")} AS val_sum
         |FROM b GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir).events
        .select($"event_type",
          window($"ts", "15 minutes").getField("start").as("bucket"),
          $"ts", $"event_id", $"value")
      val wa = Window.partitionBy($"event_type", $"bucket")
        .orderBy($"ts".asc, $"event_id".asc)
      val wd = Window.partitionBy($"event_type", $"bucket")
        .orderBy($"ts".desc, $"event_id".desc)
      base
        .withColumn("rna", row_number().over(wa))
        .withColumn("rnd", row_number().over(wd))
        .groupBy($"event_type", $"bucket")
        .agg(
          max(when($"rna" === 1, $"value")).as("open"),
          max(when($"rnd" === 1, $"value")).as("close"),
          max($"value").as("high"), min($"value").as("low"),
          count(one).as("n"), dsum($"value").as("val_sum"))
    },

    // ---- gap-based sessionization --------------------------------------
    Qry(
      "q30_sessionize",
      s"""WITH e AS ($eventsMsSql),
         |  flags AS (
         |    SELECT user_id, event_id, ms, value,
         |      CASE WHEN lag(ms) OVER w IS NULL
         |             OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END
         |        AS new_s
         |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |  sess AS (
         |    SELECT user_id, ms, value,
         |      CAST(SUM(new_s) OVER (PARTITION BY user_id
         |        ORDER BY ms, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS session_id
         |    FROM flags)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(ms) AS start_ms, MAX(ms) AS end_ms,
         |  MAX(ms) - MIN(ms) AS duration_ms,
         |  ${dsumSql("value")} AS val_sum
         |FROM sess GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"value")
      Sessionize.byGap(ev, keys = Seq("user_id"), timeMs = "ms",
          gapMs = 1800000L, tieBreak = Seq("event_id"))
        .groupBy($"user_id", $"session_id")
        .agg(count(one).as("n_events"),
          min($"ms").as("start_ms"), max($"ms").as("end_ms"),
          (max($"ms") - min($"ms")).as("duration_ms"),
          dsum($"value").as("val_sum"))
    },

    // ---- tick-to-tick deltas (reference's event-time lag, §2.2 #11) ----
    Qry(
      "q31_event_deltas",
      s"""WITH e AS ($eventsMsSql)
         |SELECT user_id, event_id, ts, value,
         |  ms - lag(ms) OVER w AS gap_ms,
         |  value - lag(value) OVER w AS value_delta,
         |  row_number() OVER w AS seq
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      t(spark, dir).events
        .select($"user_id", $"event_id", $"ts", unix_millis($"ts").as("ms"),
          $"value")
        .withColumn("gap_ms", $"ms" - lag($"ms", 1).over(w))
        .withColumn("value_delta", $"value" - lag($"value", 1).over(w))
        .withColumn("seq", row_number().over(w))
        .select($"user_id", $"event_id", $"ts", $"value",
          $"gap_ms", $"value_delta", $"seq")
    }
  )
}
