package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{GraftRing, RingRegistry}
import graft.streaming.Streams

/** The in-process MPMC ring-buffer bus behind the `graft-ring` source
  * (sources/RingSource.scala) — the Spark-native restatement of the
  * reference's core structure
  * (`/root/reference/src/memory/low_latency_mpmc_ring.rs:36-135`).
  * Pins the full contract: power-of-two capacity, reject-new vs
  * drop-oldest overflow, destructive consume via the engine's offset
  * commit, MPMC exactly-once delivery under live backpressure, and the
  * observable drop counter. */
class RingSourceSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def row(i: Long): Row = Row(s"k${i % 3}", i)

  test("capacity must be a power of two (the reference's contract)") {
    intercept[IllegalArgumentException] {
      new GraftRing("bad", schema, 100, dropOldest = false)
    }
  }

  test("reject-new: full ring refuses, consumer commit frees slots") {
    val ring = RingRegistry.create("rs_reject", schema, 8, dropOldest = false)
    try {
      (0L until 8L).foreach(i => assert(ring.tryEnqueue(row(i))))
      assert(!ring.tryEnqueue(row(8)), "9th enqueue into 8 slots must fail")
      assert(ring.dropped === 0)
      // destructive consume — the reference's consumer-index advance;
      // freed slots accept new records
      ring.consume(3)
      assert(ring.oldest === 3)
      (8L until 11L).foreach(i => assert(ring.tryEnqueue(row(i))))
      assert(!ring.tryEnqueue(row(11)))
    } finally RingRegistry.remove("rs_reject")
  }

  test("drop-oldest: eviction is observable and retains the newest window") {
    val ring = RingRegistry.create("rs_drop", schema, 8, dropOldest = true)
    try {
      (0L until 20L).foreach(i => assert(ring.tryEnqueue(row(i))))
      assert(ring.dropped === 12, "evictions before delivery are counted")
      assert(ring.oldest === 12 && ring.latest === 20)
      // the stream attaches AFTER overflow: it must start at the oldest
      // retained row and deliver exactly the last-8 window
      val got = Streams.runToMemory(
        Streams.ringStream(spark, "rs_drop"), "append")
      assert(got.count() === 8)
      assert(got.agg(min("v"), max("v")).head() === Row(12L, 19L))
    } finally RingRegistry.remove("rs_drop")
  }

  test("drop-oldest under a LIVE consumer: conservation accounting") {
    // Fast producer, small ring, stream racing it: delivery is at-most-
    // once (policy) but ACCOUNTING must be at-least-once — every record
    // is either in the sink or counted in `dropped` (a record evicted
    // after being planned can be double-counted, never lost silently).
    val n = 3000L
    val ring = RingRegistry.create("rs_live", schema, 64, dropOldest = true)
    try {
      val sink = Streams.drainRingUntilQuiet(spark, "rs_live") {
        (0L until n).foreach { i =>
          assert(ring.tryEnqueue(row(i))) // drop-oldest always accepts
          if (i % 256 == 0) Thread.sleep(1) // let batches interleave
        }
      }
      val delivered = sink.select("v").distinct().count()
      assert(sink.count() === delivered, "no duplicate delivery")
      assert(delivered + ring.dropped >= n,
        s"lost records: delivered=$delivered dropped=${ring.dropped}")
      assert(delivered >= 64, "the live stream delivered real batches")
    } finally RingRegistry.remove("rs_live")
  }

  test("MPMC live drain: two producers, 32x-undersized ring, exactly-once") {
    val n = 4096L
    val ring = RingRegistry.create("rs_mpmc", schema, 128, dropOldest = false)
    try {
      val got = Streams.drainRingUntil(spark, "rs_mpmc", n) {
        val odd = new Thread(() =>
          (1L until n by 2).foreach(i => ring.enqueue(row(i))))
        odd.setDaemon(true)
        odd.start()
        (0L until n by 2).foreach(i => ring.enqueue(row(i)))
        odd.join(60000)
      }
      // conservation + uniqueness: every record delivered exactly once,
      // no matter how the producer threads interleaved
      assert(got.count() === n)
      assert(got.select("v").distinct().count() === n)
      assert(got.agg(sum("v")).head().getLong(0) === n * (n - 1) / 2)
      assert(ring.dropped === 0)
      // backpressure actually engaged: the bus is 32x smaller than the
      // data, so the consumer's commits must have freed slots (the
      // producers would otherwise still be blocked)
      assert(ring.committed > 0)
    } finally RingRegistry.remove("rs_mpmc")
  }
}
