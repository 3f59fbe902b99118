package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Multi-batch streaming semantics the single-batch oracle queries can't
  * cover: state carried across micro-batches, watermark-based late-data
  * drop, and stream≡batch equivalence for windowed aggregation — the
  * corrected semantics of the reference's ingest/consume loop (SURVEY.md
  * §1.5: conservation instead of silent loss).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val counts = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k, rows, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator((k, n, s))
      }.toDF("k", "n", "s")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("fmgws_test").start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 3.0))
      q.processAllAvailable()
      val rows = spark.table("fmgws_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch 1 emits (1,2,3.0),(2,1,10.0); batch 2 emits (1,3,6.0) —
      // proving state survived the batch boundary.
      assert(rows == Set((1L, 2L, 3.0), (2L, 1L, 10.0), (1L, 3L, 6.0)))
    } finally q.stop()
  }

  test("watermark drops rows later than the allowed delay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "5 seconds")
      .groupBy(window($"ts", "1 minute")).agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      input.addData((ts("2024-01-01 10:00:10"), 1L), (ts("2024-01-01 10:00:20"), 2L))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      input.addData((ts("2024-01-01 10:10:00"), 3L))
      q.processAllAvailable()
      // this row is now later than watermark − delay → must be dropped
      input.addData((ts("2024-01-01 10:00:30"), 4L))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(rows == Map("2024-01-01 10:00:00.0" -> 2L)) // late row excluded
    } finally q.stop()
  }

  test("streamed windowed aggregation equals batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 100).map(i =>
      (new Timestamp(1704100000000L + i * 7_000L), i.toDouble))
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDS().toDF("ts", "v")
      .groupBy(window($"ts", "1 minute")).agg(sum($"v").cast("decimal(18,6)").as("s"),
        count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"s", $"n")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("eq_test").start()
    try {
      data.grouped(33).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("eq_test")
        .collect().map(r => (r.getTimestamp(0), r.getDecimal(1), r.getLong(2))).toSet
      val batch = data.toDF("ts", "v")
        .groupBy(window($"ts", "1 minute")).agg(sum($"v").cast("decimal(18,6)").as("s"),
          count(lit(1)).as("n"))
        .select($"window.start", $"s", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
