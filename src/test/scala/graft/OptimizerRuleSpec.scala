package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The injected optimizer rule (LeRoundtripElimination) must remove
  * encode→decode roundtrips from the plan while preserving results —
  * including the unsigned u32/u8 widening and NaN f64 bit patterns. */
class OptimizerRuleSpec extends SparkTestBase {

  // extensions require a session built with them; the shared test session
  // isn't, so build a derived one (same context, own extensions don't
  // apply on newSession — build explicitly).
  private lazy val extSpark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("encode-decode roundtrips are optimized away and stay correct") {
    val s = extSpark
    import s.implicits._
    val df = Seq((1.5, 7, -3L), (Double.NaN, -1, Long.MinValue))
      .toDF("d", "i", "l")
      .selectExpr(
        "le_f64(le_encode_f64(d), 0) AS d2",
        "le_u32(le_encode_u32(i), 0) AS iu",
        "le_u64(le_encode_u64(l), 0) AS l2",
        "le_u8(le_encode_u8(i), 0) AS b")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("le_f64") && !optimized.contains("le_u32"),
      s"roundtrip not eliminated:\n$optimized")
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 1.5)
    assert(rows(0).getLong(1) == 7L && rows(0).getLong(2) == -3L)
    assert(rows(0).getInt(3) == 7)
    assert(rows(1).getDouble(0).isNaN)             // NaN bits preserved
    assert(rows(1).getLong(1) == 0xFFFFFFFFL)      // unsigned u32
    assert(rows(1).getLong(2) == Long.MinValue)
    assert(rows(1).getInt(3) == 255)               // low byte of -1
  }

  test("decode at a non-zero offset is NOT rewritten") {
    val s = extSpark
    import s.implicits._
    val df = Seq(3.25).toDF("d")
      .selectExpr("le_f64(le_encode_f64(d), 1) AS wrong_offset")
    // a wrong rewrite would yield 3.25; correct decode-at-offset-1 of an
    // 8-byte buffer is out of bounds → null (constant folding may have
    // already evaluated it, which is fine — the VALUE is the contract)
    assert(df.head().isNullAt(0))
  }

  test("streaming dropDuplicates dedups within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDS().toDF("id", "payload")
      .dropDuplicates("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_test").start()
    try {
      input.addData((1L, "a"), (1L, "a-dup"), (2L, "b"))
      q.processAllAvailable()
      input.addData((2L, "b-again"), (3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("sdedup_test").select("id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // cross-batch duplicate suppressed
    } finally q.stop()
  }
}
