package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY.md §2.4 "scans/sources", "sinks"):
  * CSV and JSON roundtrips with schema preservation, partitioned parquet
  * writes with partition pruning, and the foreachBatch streaming sink.
  */
class SourcesSinksSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def sample = Seq(
    (1L, "alpha", 1.5, "2024-01-01"),
    (2L, "beta", -2.25, "2024-01-02"),
    (3L, "gam,ma", 0.0, "2024-01-02")) // embedded comma exercises quoting
    .toDF("id", "name", "v", "day")

  test("csv roundtrip preserves data (header + explicit schema)") {
    val dir = tmp("graft_csv_")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("json roundtrip preserves data") {
    val dir = tmp("graft_json_")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("graft_part_")
    sample.write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"day" === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-02"))
    assert(pruned.count() == 2)
    // only the matching partition directory is listed in the scan
    assert(!plan.contains("day=2024-01-01") || plan.contains("PartitionCount: 1"))
  }

  test("foreachBatch sink lands every micro-batch in parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft_feb_")
    val input = MemoryStream[(Long, Double)]
    val q = input.toDS().toDF("k", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(dir)
      }.start()
    try {
      input.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable()
      input.addData((3L, 3.0)); q.processAllAvailable()
      val landed = spark.read.parquet(dir)
      assert(landed.count() == 3)
      assert(landed.select("batch_id").distinct().count() == 2)
    } finally q.stop()
  }
}
