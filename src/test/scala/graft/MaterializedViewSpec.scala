package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming → lakehouse sink patterns:
  * - foreachBatch + dynamic partition overwrite as an incrementally
  *   maintained materialized view (each batch rewrites ONLY the window
  *   partitions it touched; re-processing a batch is idempotent per
  *   partition — the standard exactly-once-per-partition recipe without
  *   a transactional table format);
  * - parquet schema evolution on read (mergeSchema).
  */
class MaterializedViewSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch + dynamic partition overwrite maintains a view") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_mv_").toString
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDS().toDF("ts", "v")
      .groupBy(window($"ts", "1 hour").getField("start").as("w"))
      .agg(count(lit(1)).as("n"), sum($"v").cast("decimal(28,6)").as("s"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").partitionBy("w").parquet(dir)
      }.start()
    try {
      input.addData((ts("2024-01-01 10:10:00"), 1.0),
        (ts("2024-01-01 11:20:00"), 2.0))
      q.processAllAvailable()
      // second batch touches hour 10 only → hour 11 partition untouched
      input.addData((ts("2024-01-01 10:40:00"), 5.0))
      q.processAllAvailable()
      val view = spark.read.parquet(dir)
        .collect()
        .map(r => (r.getAs[Timestamp]("w").toString,
          r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("s").doubleValue))
        .toSet
      assert(view == Set(
        ("2024-01-01 10:00:00.0", 2L, 6.0),  // updated in place
        ("2024-01-01 11:00:00.0", 1L, 2.0))) // preserved from batch 1
    } finally {
      q.stop()
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
  }

  test("parquet schema evolution: mergeSchema unions column sets") {
    val dir = Files.createTempDirectory("graft_evo_").toString
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((2L, 3.5)).toDF("id", "score") // new column, old one absent
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    // address columns by name — merged column ORDER depends on file
    // listing order and is not stable
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "a" &&
      rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("name")) &&
      rows(1).getAs[Double]("score") == 3.5)
  }
}
