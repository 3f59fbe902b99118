package graft

import java.sql.Timestamp

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Observability + watermark-scoped dedup: `observe()` custom metrics
  * (the engine-side version of the reference's PerformanceStats counters,
  * /root/reference/src/tests/integration_test.rs:57-65) and
  * dropDuplicatesWithinWatermark (bounded-state streaming dedup). */
class ObservabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("observe() collects custom metrics during a batch action") {
    val obs = Observation("graft_metrics")
    val df = spark.range(0, 1000)
      .select($"id", ($"id" % 10).as("k"))
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum($"id").as("id_sum"), max($"k").as("max_k"))
    df.groupBy($"k").count().collect()
    val m = obs.get
    assert(m("rows_seen") == 1000L)
    assert(m("id_sum") == 499500L)
    assert(m("max_k") == 9L)
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ddww_test").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:00:01")), // dup within watermark → dropped
        (2L, ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      assert(spark.table("ddww_test").count() == 2)
      // advance the watermark far beyond id=1's window; its dedup state
      // is evicted, so a re-arrival is treated as new (bounded state —
      // the trade dropDuplicatesWithinWatermark makes explicit)
      input.addData((3L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:30:05"))) // above watermark
      q.processAllAvailable()
      assert(spark.table("ddww_test").count() == 4)
    } finally q.stop()
  }
}
