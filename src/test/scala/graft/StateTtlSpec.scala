package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** Top-level so the closure serializes without dragging the suite along.
  * Two ValueStates per key: one with a 500 ms processing-time TTL, one
  * persistent — the persistent one is the control that separates "TTL
  * expired the value" from "state lost for some other reason". Emits
  * (key, ttlCount, keepCount) per batch. */
class TtlVsPersistent
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
  @transient private var ttl: ValueState[Tuple1[Long]] = _
  @transient private var keep: ValueState[Tuple1[Long]] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    ttl = getHandle.getValueState[Tuple1[Long]]("ttl",
      Encoders.product[Tuple1[Long]],
      new TTLConfig(java.time.Duration.ofMillis(500)))
    keep = getHandle.getValueState[Tuple1[Long]]("keep",
      Encoders.product[Tuple1[Long]], TTLConfig.NONE)
  }
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val n = rows.size.toLong
    val t = Option(ttl.get()).map(_._1).getOrElse(0L) + n
    val k = Option(keep.get()).map(_._1).getOrElse(0L) + n
    ttl.update(Tuple1(t)); keep.update(Tuple1(k))
    Iterator((key, t, k))
  }
}

/** Processing-time state TTL (transformWithState TTLConfig) — the
  * state-hygiene knob a 100 TB streaming deployment sets so per-key
  * state cannot grow without bound when keys stop arriving. TTL expiry
  * is processing-time-dependent, so it cannot be a deterministic
  * DuckDB-gated query; this spec pins the contract instead: an expired
  * value actually vanishes (reads as absent), while a TTLConfig.NONE
  * state in the SAME processor and store survives — so the test cannot
  * pass by accidentally losing all state, and cannot fail because TTL
  * was silently ignored. */
class StateTtlSpec extends SparkTestBase {
  import spark.implicits._

  test("expired TTL state vanishes; persistent state in the same store survives") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new TtlVsPersistent, TimeMode.ProcessingTime(),
        OutputMode.Append())
      .toDF("k", "ttl_n", "keep_n")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ttl_test").start()
    // In TimeMode.ProcessingTime the engine schedules no-data
    // micro-batches continuously (the processing clock always
    // advances state eligibility), so processAllAvailable never
    // latches — poll the sink for the expected row count instead.
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("ttl_test").count() < n) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $n rows")
        Thread.sleep(100L)
      }
    }
    try {
      input.addData((1L, 0L)); awaitRows(1L)
      // sit out 4x the TTL on the processing clock
      Thread.sleep(2000L)
      input.addData((1L, 0L)); awaitRows(2L)
      val rows = spark.table("ttl_test")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
      // batch 1: both counters at 1. batch 2: the TTL'd counter
      // restarted at 1 (expired value read as absent); the persistent
      // counter reached 2 (same key, same store, same processor).
      assert(rows == Seq((1L, 1L), (1L, 2L)),
        s"expected TTL restart + persistent survival, got $rows")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
