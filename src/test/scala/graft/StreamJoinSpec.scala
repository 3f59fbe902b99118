package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream joins with event-time range conditions — the streaming
  * form of time-series enrichment (impressions ⋈ clicks within a window).
  * Watermarks on both sides bound the join state so it doesn't grow
  * forever — the piece that makes stream-stream joins viable at scale.
  */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream inner join within a time range") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val imp = impressions.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 seconds")
    val clk = clicks.toDS().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "10 seconds")

    // a click attributes to an impression of the same ad within 30s after
    val joined = imp.join(clk,
      $"ad_id" === $"c_ad_id" &&
        $"click_ts" >= $"imp_ts" &&
        $"click_ts" <= $"imp_ts" + expr("INTERVAL 30 seconds"))
      .select($"ad_id", $"imp_ts", $"click_ts")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    try {
      impressions.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      clicks.addData(
        (1L, ts("2024-01-01 10:00:20")),  // within 30s of imp 1 → match
        (2L, ts("2024-01-01 10:00:50")),  // 45s after imp 2 → no match
        (3L, ts("2024-01-01 10:00:10")))  // no impression for ad 3
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSet
      assert(got == Set((1L, "2024-01-01 10:00:20.0")))
    } finally q.stop()
  }

  test("q238 state machine: as-of enrichment is exact ACROSS micro-batches") {
    // the fixture gate (q238) delivers one micro-batch; this pins the
    // cross-batch contract — the latest-reference ValueState survives
    // batch boundaries, so a tick in batch 3 sees a reference from
    // batch 1, same-ms ties resolve to the highest event_id, and a
    // tick before any reference enriches to NULLs
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // (user_id, ms, is_ref, event_id, value)
    val in = MemoryStream[(Long, Long, Boolean, Long, Double)]
    val out = in.toDS().groupByKey(_._1)
      .transformWithState(new graft.queries.LatestRefEnrich,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_tws").start()
    try {
      // batch 1: tick before any reference; two same-ms references
      in.addData((1L, 5L, false, 100L, 1.0),
        (1L, 10L, true, 7L, 0.7), (1L, 10L, true, 9L, 0.9))
      q.processAllAvailable()
      // batch 2: tick AT the reference time (inclusive bound) + later ref
      in.addData((1L, 10L, false, 101L, 2.0), (1L, 20L, true, 11L, 1.1),
        (2L, 15L, false, 200L, 3.0))
      q.processAllAvailable()
      // batch 3: tick two batches after its reference; other user's ref
      in.addData((1L, 30L, false, 102L, 4.0), (2L, 16L, true, 21L, 2.1))
      q.processAllAvailable()
      val got = spark.table("asof_tws").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
      assert(got == Map(
        100L -> -1L,  // no reference yet → NULL enrichment
        101L -> 9L,   // same-ms inclusive; max event_id wins the tie
        200L -> -1L,  // user 2 had no reference in/earlier than batch 2
        102L -> 11L)) // state carried the batch-2 reference forward
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q254 state machine: a reference arriving a batch LATE, inside " +
    "the watermark, still enriches the earlier tick") {
    // the fixture gate (q254) sizes the delay to the whole slice so
    // everything drains at the sentinel; THIS pins the small-delay
    // incremental path: (a) rows the watermark has not passed emit
    // NOTHING, (b) a reference delivered one batch after a tick with a
    // LATER event time is applied before that tick when the watermark
    // drains both, (c) the drain happens in the watermark-only batch
    // Spark triggers after the watermark advances (the event-time
    // timer path — no new data for the key arrives again)
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // (user_id, ms, is_ref, event_id, value); delay 60 s
    val in = MemoryStream[(Long, Long, Boolean, Long, Double)]
    val src = in.toDS()
      .withColumn("ets", timestamp_millis($"_2"))
      .withWatermark("ets", "60 seconds")
      .select($"_1", $"_2", $"_3", $"_4", $"_5", $"ets")
      .as[(Long, Long, Boolean, Long, Double, Timestamp)]
    val out = src.groupByKey(_._1)
      .transformWithState(new graft.queries.BufferedAsOfEnrich,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_buf").start()
    try {
      // batch 1: two ticks for user 1, out of event-time order within
      // the buffer; max event time 20 s → watermark stays 0
      in.addData((1L, 20000L, false, 100L, 1.0),
        (1L, 5000L, false, 99L, 0.5))
      q.processAllAvailable()
      assert(spark.table("asof_buf").count() == 0,
        "nothing may emit before the watermark passes the ticks")
      // batch 2: the reference arrives a BATCH LATE with an event time
      // between the two buffered ticks; a far key's reference at 81 s
      // advances the watermark to 21 s, and the watermark-only batch
      // that follows fires user 1's timer and drains all three rows
      in.addData((1L, 10000L, true, 7L, 0.7),
        (2L, 81000L, true, 8L, 0.8))
      q.processAllAvailable()
      val got = spark.table("asof_buf").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
      assert(got == Map(
        99L -> -1L,  // t=5 s: before the late reference's event time
        100L -> 7L)) // t=20 s: enriched by the batch-late reference
      // user 2's 81 s reference stays buffered (watermark 21 s) and
      // must never self-emit — references produce no output rows
      assert(spark.table("asof_buf").count() == 2)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q255 state machine: the unmatched-left NULL row appears only " +
    "after the watermark crosses the error's join window") {
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp, Double)]
    val err = errs.toDS().toDF("user_id", "ts_e")
      .withWatermark("ts_e", "10 seconds")
    val clk = clks.toDS().toDF("c_user_id", "ts_c", "cv")
      .withWatermark("ts_c", "10 seconds")
    // a click attributes to the same user's error looking BACK 30 s
    val joined = err.join(clk,
      $"user_id" === $"c_user_id" &&
        $"ts_c" >= $"ts_e" - expr("INTERVAL 30 seconds") &&
        $"ts_c" <= $"ts_e",
      "left_outer")
      .select($"user_id", $"ts_e", $"cv")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("lojoin_test").start()
    try {
      // batch 1: an error with no click, plus an unrelated click so
      // BOTH sides have a watermark reading (global wm = min of sides)
      errs.addData((1L, ts("2024-01-01 10:00:20")))
      clks.addData((9L, ts("2024-01-01 10:00:25"), 0.9))
      q.processAllAvailable()
      // wm = min(20, 25) - 10 s = 10 s: the error's window (ending at
      // its own event time, 20 s) is still open — NO null row yet
      assert(spark.table("lojoin_test").count() == 0,
        "null row emitted before the watermark closed the join window")
      // batch 2: both sides jump to 100 s → wm = 90 s > 20 s; the
      // watermark-advance batch emits user 1's error with NULL click
      errs.addData((8L, ts("2024-01-01 10:01:40")))
      clks.addData((9L, ts("2024-01-01 10:01:40"), 0.1))
      q.processAllAvailable()
      val got = spark.table("lojoin_test").collect()
        .map(r => (r.getLong(0), r.isNullAt(2)))
      assert(got.toSeq == Seq((1L, true)),
        s"expected exactly user 1's null row, got ${got.mkString(",")}")
      // user 8's 100 s error window is NOT yet past the watermark
      // (90 s) — it must still be held back, not null-emitted early
    } finally q.stop()
  }
}
