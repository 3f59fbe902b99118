package graft.queries

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.streaming.Streams

/** Per-user streaming state for q130: event count (ValueState) +
  * distinct event types (MapState used as a set). Top-level so the
  * closure serializes without dragging a query-module reference along. */
class TypeCardinality
    extends StatefulProcessor[Long, (Long, String), (Long, Long, Long)] {
  @transient private var cnt: ValueState[Long] = _
  @transient private var types: MapState[String, Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
      TTLConfig.NONE)
    types = getHandle.getMapState[String, Long]("types", Encoders.STRING,
      Encoders.scalaLong, TTLConfig.NONE)
  }
  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var n = if (cnt.exists()) cnt.get() else 0L
    rows.foreach { case (_, t) =>
      n += 1
      if (!types.containsKey(t)) types.updateValue(t, 1L)
    }
    cnt.update(n)
    var k = 0L
    val it = types.keys()
    while (it.hasNext) { it.next(); k += 1 }
    Iterator((key, n, k))
  }
}

/** Twenty-first coverage wave: transformWithState (the Spark 4
  * arbitrary-state streaming API) under the oracle gate. */
object Extras21 {

  val all: Seq[Qry] = Seq(

    // ---- transformWithState under the gate -----------------------------
    // The current-generation stateful API (typed ValueState + MapState,
    // RocksDB-backed — transformWithState requires the RocksDB provider)
    // computing per-user event count + distinct-type cardinality across
    // micro-batches. Append-mode running rows collapse to the final
    // per-user row via the strictly-increasing count (q46's pattern), so
    // stream/batch equivalence is the oracle statement.
    Qry(
      "q130_stream_tws",
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = Streams.fileStream(spark, dir, "events")
          .select($"user_id", $"event_type").as[(Long, String)]
        val out = src.groupByKey(_._1)
          .transformWithState(new TypeCardinality, TimeMode.None(),
            OutputMode.Append())
          .toDF("user_id", "n_events", "n_types")
        Streams.runToMemory(out, "append")
          .groupBy($"user_id")
          .agg(max(struct($"n_events", $"n_types")).as("s"))
          .select($"user_id", $"s.n_events", $"s.n_types")
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  )
}
