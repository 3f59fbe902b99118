package graft

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Closes the remaining semantic loops from SURVEY.md §1.5:
  * unknown fields fail analysis loudly (the reference silently drops
  * them), typed per-key reduction via KeyValueGroupedDataset, and
  * streaming state surviving a stop/restart through the checkpoint.
  */
class TypedAndRecoverySpec extends SparkTestBase {
  import spark.implicits._

  test("unknown columns are analysis-time errors, not silent drops") {
    // reference behavior: fields absent from the table config are
    // silently ignored on write (src/storage/table.rs:62,71); our engine
    // rejects them at analysis time.
    val df = Seq((1, "a")).toDF("id", "name")
    val e = intercept[AnalysisException](df.select($"no_such_field"))
    assert(e.getMessage.contains("no_such_field"))
    val e2 = intercept[AnalysisException](df.filter($"ghost" > 1))
    assert(e2.getMessage.contains("ghost"))
  }

  test("typed mapGroups: per-key reduction over a KeyValueGroupedDataset") {
    val ticks = Seq((100, 10.0, 2), (100, 20.0, 6), (101, 5.0, 10))
      .toDF("sym", "price", "qty").as[(Int, Double, Int)]
    val vwap = ticks.groupByKey(_._1)
      .mapGroups { (sym, it) =>
        val rows = it.toSeq
        val pq = rows.map(r => r._2 * r._3).sum
        val q = rows.map(_._3).sum
        (sym, pq / q, rows.size)
      }.collect().toSet
    assert(vwap == Set((100, 17.5, 2), (101, 5.0, 1)))
  }

  test("streaming aggregation state survives stop + restart (checkpoint)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val input = MemoryStream[(Long, Double)]
    def startQuery() = input.toDS().toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("ckpt_test").start()

    val q1 = startQuery()
    input.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q1.processAllAvailable()
    q1.stop()

    val q2 = startQuery() // resumes from the checkpoint
    input.addData((1L, 4.0))
    q2.processAllAvailable()
    try {
      val got = spark.table("ckpt_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // key 1 keeps its pre-restart counts: 3 rows, 7.0 total
      assert(got == Set((1L, 3L, 7.0), (2L, 1L, 5.0)))
    } finally q2.stop()
  }
}
