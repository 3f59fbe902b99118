package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Exact._
import graft.streaming.Streams

/** Streaming query surface — the reference's capability core re-expressed
  * as Structured Streaming pipelines (SURVEY.md §2.2): windowed VWAP-style
  * aggregation, session windows, and custom per-key state
  * (`flatMapGroupsWithState`) standing in for the reference's
  * consumer-thread analytics (`/root/reference/src/tests/integration_test.rs:239-278`).
  *
  * Each query here RUNS a real streaming query to completion (file-stream
  * source → memory sink) and returns the result, so streaming semantics
  * are covered by the same DuckDB batch oracle as everything else —
  * stream/batch equivalence is the correctness statement, not an analogy.
  */
/** Per-user running state carried across micro-batches (top-level so the
  * state encoder's generated code can instantiate it). */
case class UserState(n: Long, maxV: Double, sumV: java.math.BigDecimal)

object Streaming {

  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- streaming tumbling-window aggregation (VWAP-shape) ------------
    Qry(
      "q44_stream_tumbling",
      s"""SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |    AS bucket,
         |  event_type, COUNT(*) AS n, ${dsumSql("value")} AS val_sum,
         |  ${davgSql("value")} AS val_avg
         |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStream(spark, dir, "events")
      val agg = src
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "15 minutes"), $"event_type")
        .agg(count(one).as("n"), dsum($"value").as("val_sum"),
          davg($"value").as("val_avg"))
      Streams.runToMemory(agg, "complete")
        .select($"window.start".as("bucket"), $"event_type",
          $"n", $"val_sum", $"val_avg")
    },

    // ---- streaming session windows -------------------------------------
    // session_window gap semantics are exclusive (an event exactly gap
    // after the previous one opens a NEW session), hence `>=` in the
    // oracle's new-session flag.
    Qry(
      "q45_stream_sessions",
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
         |flags AS (
         |  SELECT user_id, event_id, ms, value,
         |    CASE WHEN lag(ms) OVER w IS NULL
         |           OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END
         |      AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sess AS (
         |  SELECT user_id, ms, value,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flags)
         |SELECT user_id, MIN(ms) AS start_ms, MAX(ms) + 1800000 AS end_ms,
         |  COUNT(*) AS n_events, ${dsumSql("value")} AS val_sum
         |FROM sess GROUP BY user_id, sid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStream(spark, dir, "events")
      // floor event time to ms BEFORE sessionizing so gap comparisons
      // happen at the same precision as the oracle's epoch_ms arithmetic
      // (µs-precision session_window vs ms-precision oracle would split
      // differently for gaps within 1ms of the 30-minute boundary)
      val agg = src
        .withColumn("ts", timestamp_millis(unix_millis($"ts")))
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(one).as("n_events"), dsum($"value").as("val_sum"))
      Streams.runToMemory(agg, "complete")
        .select($"user_id",
          unix_millis($"session_window.start").as("start_ms"),
          unix_millis($"session_window.end").as("end_ms"),
          $"n_events", $"val_sum")
    },

    // ---- custom per-key streaming state (flatMapGroupsWithState) -------
    // The reference's per-consumer running aggregates (§2.2 #10, #12;
    // CAS-max §2.3 #19) done as managed keyed state. The decimal sum
    // reproduces Exact.dsum semantics (per-value DECIMAL(28,6) HALF_UP,
    // order-independent) so the oracle matches bit-for-bit.
    Qry(
      "q46_stream_stateful",
      s"""SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value,
         |  ${dsumSql("value")} AS val_sum
         |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStream(spark, dir, "events")
        .select($"user_id", $"value").as[(Long, Double)]
      val out = src.groupByKey(_._1)
        .flatMapGroupsWithState[UserState, (Long, Long, Double, Double)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid, rows, state: GroupState[UserState]) =>
            val prev = state.getOption.getOrElse(
              UserState(0L, Double.MinValue, java.math.BigDecimal.ZERO))
            var n = prev.n; var mx = prev.maxV; var s = prev.sumV
            rows.foreach { case (_, v) =>
              n += 1
              if (v > mx) mx = v
              s = s.add(java.math.BigDecimal.valueOf(v)
                .setScale(6, java.math.RoundingMode.HALF_UP))
            }
            state.update(UserState(n, mx, s))
            Iterator((uid, n, mx, s.doubleValue))
        }
        .toDF("user_id", "n_events", "max_value", "val_sum")
      // the sink accumulates one running-total row per user per
      // micro-batch; keep only the final one (max n_events — strictly
      // increasing per user), so the result is batch-count agnostic
      Streams.runToMemory(out, "append")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"max_value", $"val_sum")).as("s"))
        .select($"user_id", $"s.n_events", $"s.max_value", $"s.val_sum")
    },

    // ---- stream-stream interval join -----------------------------------
    // Two watermarked streams over the same source (the reference's
    // consumers correlating records across reads): each error joins the
    // same user's clicks from the preceding 10 minutes. Inner
    // stream-stream joins emit pairs eagerly (the watermark only bounds
    // join STATE, not emission), so a run-to-completion produces the
    // complete pair set and the batch oracle states the same result.
    // Both sides are floored to ms BEFORE the join so range boundaries
    // sit at the same precision as the oracle's epoch_ms arithmetic.
    Qry(
      "q79_stream_join",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
         |pairs AS (
         |  SELECT err.user_id, err.ms - c.ms AS gap_ms, c.value AS cv
         |  FROM (SELECT * FROM e WHERE event_type = 'error') err
         |  JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |    ON err.user_id = c.user_id
         |   AND c.ms >= err.ms - 600000 AND c.ms <= err.ms)
         |SELECT user_id, COUNT(*) AS n_pairs,
         |  CAST(SUM(gap_ms) AS BIGINT) AS gap_sum,
         |  ${dsumSql("cv")} AS click_val_sum
         |FROM pairs GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def side() =
        Streams.fileStream(spark, dir, "events")
          .withColumn("ts", timestamp_millis(unix_millis($"ts")))
          .withWatermark("ts", "10 minutes")
      val err = side().filter($"event_type" === "error")
        .select($"user_id", $"ts".as("ts_e"))
      val clk = side().filter($"event_type" === "click")
        .select($"user_id".as("c_user_id"), $"ts".as("ts_c"),
          $"value".as("cv"))
      val joined = err.join(clk,
        $"user_id" === $"c_user_id" &&
          $"ts_c" >= $"ts_e" - expr("interval 10 minutes") &&
          $"ts_c" <= $"ts_e")
        .select($"user_id",
          (unix_millis($"ts_e") - unix_millis($"ts_c")).as("gap_ms"),
          $"cv")
      Streams.runToMemory(joined, "append")
        .groupBy($"user_id")
        .agg(count(one).as("n_pairs"), sum($"gap_ms").as("gap_sum"),
          dsum($"cv").as("click_val_sum"))
    }
  )
}
