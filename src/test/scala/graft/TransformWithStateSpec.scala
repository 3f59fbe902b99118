package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._

/** Top-level so the closure serializes without dragging the suite along. */
class RunningAgg
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var st: ValueState[(Long, Double)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double)]("agg",
      Encoders.product[(Long, Double)], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, s0) = Option(st.get()).getOrElse((0L, 0.0))
    var n = n0; var s = s0
    rows.foreach { case (_, v) => n += 1; s += v }
    st.update((n, s))
    Iterator((key, n, s))
  }
}

/** transformWithState (Spark 4 arbitrary-state API, the successor to
  * flatMapGroupsWithState): typed ValueState per key, RocksDB-backed,
  * emitting running aggregates — the reference's per-consumer running
  * state done with the current API generation. */
class TransformWithStateSpec extends SparkTestBase {
  import spark.implicits._

  test("ValueState accumulates across micro-batches (RocksDB store)") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val out = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningAgg, TimeMode.None(),
        OutputMode.Append())
      .toDF("k", "n", "s")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("tws_test").start()
    try {
      input.addData((1L, 1.0), (2L, 10.0)); q.processAllAvailable()
      input.addData((1L, 2.0)); q.processAllAvailable()
      val rows = spark.table("tws_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 1L, 1.0), (2L, 1L, 10.0), (1L, 2L, 3.0)))
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
