package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ExactPercentile

/** The reference-faithful end-to-end slice (SURVEY.md §7.2): the
  * market_data schema of /root/reference/src/main.rs:11-33 streamed
  * through watermark → 1-minute windows → VWAP (the consumer-0 analytic,
  * /root/reference/src/tests/integration_test.rs:241-255), and the
  * latency-percentile pipeline (consumer-1 + LatencyMetrics,
  * `:257-270`, `:359-364`) as a distributed aggregate.
  */
case class MarketTick(symbolId: Int, price: Double, quantity: Int,
    tsNanos: Long, exchangeId: Byte)

class MarketTickSpec extends SparkTestBase {
  import spark.implicits._

  private val base = 1700000000000000000L // epoch nanos, on a minute edge

  private def tick(sym: Int, price: Double, qty: Int, offsetSec: Long,
      exch: Byte = 1) =
    MarketTick(sym, price, qty, base + offsetSec * 1_000_000_000L, exch)

  test("streaming VWAP per symbol per 1-minute window (hand-computed)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val vwap = input.toDS()
      .withColumn("ts", timestamp_micros($"tsNanos" / 1000 cast "long"))
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute"), $"symbolId")
      .agg((sum($"price" * $"quantity") / sum($"quantity")).as("vwap"),
        count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"symbolId", $"vwap", $"n")
    val q = vwap.writeStream.outputMode("complete")
      .format("memory").queryName("vwap_test").start()
    try {
      input.addData(
        tick(100, 10.0, 2, 0),   // window 0, sym 100
        tick(100, 20.0, 6, 30),  // window 0, sym 100
        tick(101, 5.0, 10, 10))  // window 0, sym 101
      q.processAllAvailable()
      input.addData(tick(100, 40.0, 4, 90)) // window 1, sym 100
      q.processAllAvailable()
      val got = spark.table("vwap_test")
        .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
      // sym 100 w0: (10*2 + 20*6)/(2+6) = 140/8 = 17.5
      assert(got == Set((100, 17.5, 2L), (101, 5.0, 1L), (100, 40.0, 1L)))
    } finally q.stop()
  }

  test("per-exchange throughput counts (consumer-2 analytic)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val counts = input.toDS().groupBy($"exchangeId")
      .agg(count(lit(1)).as("n"), sum($"quantity").as("vol"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("tp_test").start()
    try {
      input.addData(tick(1, 1, 1, 0, exch = 1), tick(1, 1, 2, 1, exch = 1),
        tick(1, 1, 3, 2, exch = 2))
      q.processAllAvailable()
      val got = spark.table("tp_test")
        .collect().map(r => (r.getByte(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1.toByte, 2L, 3L), (2.toByte, 1L, 3L)))
    } finally q.stop()
  }

  test("latency percentiles: sort-then-index semantics, distributed") {
    // The reference sorts 1..100 and indexes p*(n-1); our Aggregator
    // reproduces exactly that (SURVEY.md §2.3 #18).
    val latencies = spark.range(1, 101)
      .select(($"id" * 10).cast("double").as("lat_us")) // 10..1000 µs
      .repartition(7) // prove merge across partitions
    val Seq(p50, p90, p99) = Seq(0.5, 0.9, 0.99)
      .map(p => udaf(new ExactPercentile(p)))
    val r = latencies.agg(p50($"lat_us"), p90($"lat_us"), p99($"lat_us"))
      .head()
    def ~=(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(~=(r.getDouble(0), 505.0))  // 0.5*(99) → idx 49.5 → (500+510)/2
    assert(~=(r.getDouble(1), 901.0))  // idx 89.1 → 900 + 0.1*10
    assert(~=(r.getDouble(2), 990.1))  // idx 98.01 → 990 + 0.01*10
  }
}
