package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bounded-buffer semantics, Spark-style (SURVEY.md §2.1 #2-#4, §7.4):
  * the reference rejects writes when a ring fills
  * (/root/reference/src/memory/low_latency_mpmc_ring.rs:85-86); the honest
  * Spark mapping is source-side backpressure — `maxFilesPerTrigger` bounds
  * each micro-batch, and nothing is ever dropped. The reference's
  * `record_count`/throughput metrics (§2.1 #8, §2.2 #12) map to
  * StreamingQueryProgress.numInputRows.
  */
class BackpressureSpec extends SparkTestBase {
  import spark.implicits._

  test("maxFilesPerTrigger bounds micro-batches; progress counts all rows") {
    val dir = Files.createTempDirectory("graft_bp_").toString
    // 4 separate files → 4 micro-batches at maxFilesPerTrigger=1
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100).select($"id", ($"id" % 7).as("k"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = src.groupBy($"k").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("bp_test").start()
    try {
      q.processAllAvailable()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4,
        s"expected 4 bounded micro-batches, got ${batches.length}")
      assert(batches.map(_.numInputRows).sum == 400) // conservation
      assert(spark.table("bp_test").agg(sum($"n")).head().getLong(0) == 400)
    } finally q.stop()
  }
}
