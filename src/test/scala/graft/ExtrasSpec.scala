package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ExactPercentile

class ExtrasSpec extends SparkTestBase {
  import spark.implicits._

  test("ExactPercentile matches percentile_cont interpolation") {
    val df = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val Seq(p50, p0, p100, p25) = Seq(0.5, 0.0, 1.0, 0.25)
      .map(p => udaf(new ExactPercentile(p)))
    val r = df.agg(p50($"v").as("p50"), p0($"v").as("p0"),
      p100($"v").as("p100"), p25($"v").as("p25")).head()
    assert(r.getDouble(0) == 2.5)   // (2+3)/2
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 10.0)
    assert(r.getDouble(3) == 1.75)  // 1 + 0.75*(2-1)
  }

  test("approx_count_distinct lands within its error bound") {
    val df = spark.range(0, 100000).select(($"id" % 9876).as("k"))
    val r = df.agg(
      countDistinct($"k").as("exact"),
      approx_count_distinct($"k").as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(exact == 9876L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("ingestion conservation: rows in == rows out across batches") {
    // The corrected semantics of the reference's lossy TOCTOU read/write
    // paths (SURVEY.md §1.5.2-3): nothing duplicated, nothing lost.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val piped = input.toDS().toDF("k", "v")
      .repartition(8, $"k")
      .filter($"v" >= 0.0) // pass-through predicate (all rows satisfy)
      .select($"k", $"v", ($"v" * 2).as("v2"))
    val q = piped.writeStream.outputMode("append")
      .format("memory").queryName("conservation_test").start()
    try {
      val rnd = new scala.util.Random(7)
      var fed = 0L
      (1 to 5).foreach { _ =>
        val batch = Seq.fill(1000)((rnd.nextInt(50).toLong, rnd.nextDouble()))
        input.addData(batch); fed += batch.size
        q.processAllAvailable()
      }
      assert(spark.table("conservation_test").count() == fed)
    } finally q.stop()
  }
}
