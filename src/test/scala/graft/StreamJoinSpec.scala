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
}
