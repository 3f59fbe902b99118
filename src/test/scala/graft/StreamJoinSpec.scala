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
}
