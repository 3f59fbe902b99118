package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.sources.Tables
import graft.streaming.Streams

/** Watermark-buffered streaming as-of state (the production temporal-join
  * contract, vs [[LatestRefEnrich]]'s in-order contract): rows are NOT
  * applied on arrival — they buffer in per-key ListState until the
  * event-time watermark passes them, then apply in event-time order. A
  * reference row arriving a micro-batch LATER than a tick it should have
  * enriched still enriches correctly, as long as it arrives inside the
  * watermark — exactly the reordering tolerance the Flink-style temporal
  * join documents, and the discipline every watermarked Spark stateful
  * operator (windows, stream-stream joins) already applies.
  *
  * Mechanics: `handleInputRows` only appends to the buffer and drains
  * whatever the current watermark has passed; one event-time TIMER per
  * key (at the earliest pending event time) guarantees the drain also
  * happens in watermark-only batches — the batch Spark triggers after
  * the watermark advances with no new data, which is how the tail of
  * the stream flushes. State per key is bounded by the rows inside the
  * watermark delay (the same bound as stream-stream join state): the
  * delay is the knob that trades reordering tolerance for state size.
  *
  * Enrichment semantics are [[LatestRefEnrich]]'s exactly: inclusive
  * as-of bound (references before ticks at equal ms), max event_id wins
  * same-ms reference ties, `latest` ValueState carries the newest
  * DRAINED reference across drains. Top-level class so the closure
  * serializes without a query-module reference. */
class BufferedAsOfEnrich extends StatefulProcessor[
    Long, (Long, Long, Boolean, Long, Double, Timestamp), EnrichedTick] {
  @transient private var latest: ValueState[(Long, Long, Double)] = _
  @transient private var buf: ListState[(Long, Boolean, Long, Double)] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    latest = getHandle.getValueState[(Long, Long, Double)]("latest",
      Encoders.product[(Long, Long, Double)], TTLConfig.NONE)
    buf = getHandle.getListState[(Long, Boolean, Long, Double)]("buf",
      Encoders.product[(Long, Boolean, Long, Double)], TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timerAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Apply every buffered row the watermark has passed (ms <= wm) in
    * event-time order; keep the rest buffered; maintain the one pending
    * timer at the earliest still-buffered event time. */
  private def drain(key: Long, wm: Long): Iterator[EnrichedTick] = {
    val all = buf.get().toArray
    val (ready, pending) = all.partition(_._1 <= wm)
    val out = Vector.newBuilder[EnrichedTick]
    if (ready.nonEmpty) {
      var cur = if (latest.exists()) latest.get() else null
      // event-time order; references first at equal ms (inclusive
      // as-of), ascending event_id so the last same-ms reference
      // applied is the max id — LatestRefEnrich's tie-break verbatim
      ready.sortBy(r => (r._1, !r._2, r._3)).foreach {
        case (ms, isRef, eid, v) =>
          if (isRef) {
            if (cur == null || ms > cur._1 || (ms == cur._1 && eid > cur._2))
              cur = (ms, eid, v)
          } else out += (if (cur == null)
            EnrichedTick(eid, key, ms, v, None, None, None)
          else EnrichedTick(eid, key, ms, v,
            Some(cur._2), Some(cur._1), Some(cur._3)))
      }
      if (cur != null) latest.update(cur)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending)
    }
    val prevTimer = if (timerAt.exists()) timerAt.get() else Long.MinValue
    if (pending.nonEmpty) {
      val next = pending.iterator.map(_._1).min
      if (prevTimer != next) {
        if (prevTimer != Long.MinValue) getHandle.deleteTimer(prevTimer)
        getHandle.registerTimer(next)
        timerAt.update(next)
      }
    } else if (prevTimer != Long.MinValue) {
      getHandle.deleteTimer(prevTimer)
      timerAt.clear()
    }
    out.result().iterator
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Boolean, Long, Double, Timestamp)],
      timerValues: TimerValues): Iterator[EnrichedTick] = {
    // (user_id, ms, is_ref, event_id, value, event-time col) — the 6th
    // field exists so the child plan keeps the watermarked attribute;
    // the ms long is the value the state logic uses
    val add = rows.map(r => (r._2, r._3, r._4, r._5)).toArray
    if (add.nonEmpty) buf.appendList(add)
    drain(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[EnrichedTick] = {
    // the fired timer is gone; clear its record so drain re-registers
    // at the new earliest pending time (or not at all)
    timerAt.clear()
    drain(key, timerValues.getCurrentWatermarkInMs())
  }
}

/** Eighty-first coverage wave: the streaming as-of hardened to the
  * production temporal-join contract, and the stream-stream join
  * completed to its LEFT OUTER form — the r9 verdict's top two asks.
  *
  *  - q254: out-of-order streaming as-of. The in-order gate (Extras73)
  *    documents that a reference arriving in a LATER micro-batch than a
  *    tick it should enrich is late data; here that case is the POINT:
  *    the source deliberately splits the events slice so one third of
  *    the references arrive one micro-batch after every tick
  *    (maxFilesPerTrigger=1 over [[Streams.partedDir]]'s three mod-time
  *    ordered parts), and [[BufferedAsOfEnrich]] must still produce the
  *    exact batch as-of answer by buffering ticks until the watermark
  *    passes them. The watermark delay is sized to the slice's full
  *    event-time span so every cross-batch reference is inside the
  *    watermark (the gate pins correctness of the BUFFERING; the
  *    small-delay/incremental-drain path is pinned by the spec's state
  *    machine); a far-future reference-only sentinel row (key -1, never
  *    a tick key) advances the final watermark past every real event so
  *    the timers flush the tails — the stream-side analog of "close the
  *    window". Oracle: the SAME batch as-of CTE as the in-order gate
  *    ([[Extras73.AsOfOracle]]), so both stream designs provably
  *    enrich to one batch answer. Reference tie: the reference's
  *    consumers tolerate arbitrary producer interleaving
  *    (/root/reference/src/tests/integration_test.rs:209-293).
  *  - q255: stream-stream LEFT OUTER interval join — q79's inner join
  *    plus watermark-driven unmatched-left emission, the streaming twin
  *    of q61 and the reconciliation shape (an error with no click in
  *    its 10-minute lookback surfaces as a NULL row once the watermark
  *    proves no matching click can still arrive). Matched pairs emit
  *    eagerly; the null rows are the streaming-only semantics, emitted
  *    in the watermark-advance batch after per-side far-future
  *    sentinels close both watermarks. Each side carries its OWN typed
  *    sentinel (event_type matching that side's filter, key -1/-2 so
  *    they can never join or emit): a single shared sentinel would be
  *    filtered below the watermark node when Catalyst pushes the
  *    event_type predicate past EventTimeWatermark, and the watermark
  *    would silently stall. Oracle: the batch left-outer interval join
  *    aggregated per error event. Spec pins that a null row appears
  *    ONLY after the watermark crosses the error's join window.
  */
object Extras81 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q254_stream_asof_ooo",
      Extras73.AsOfOracle) { (spark, dir) =>
      import spark.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val ev = Tables(spark, dir).events
          .filter($"event_type".isin("click", "error"))
          .select($"user_id", unix_millis($"ts").as("ms"),
            ($"event_type" === "click").as("is_ref"),
            $"event_id", $"value")
        // bounded driver state: ONE (min, max) row sizes the watermark
        // delay to the slice's span, so every scrambled reference lands
        // inside the watermark and the gate is exact (production picks
        // a small delay; the buffering logic is identical)
        val mm = ev.agg(min($"ms"), max($"ms")).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val delayMs = hi - lo + 60000L
        val sentinelMs = hi + delayMs + 60000L
        // cross-batch scramble: every third reference arrives one
        // micro-batch AFTER all ticks (hash-free, deterministic split)
        val lateRefs = ev.filter($"is_ref" && $"event_id" % 3 === 1)
        val onTime = ev.filter(!($"is_ref" && $"event_id" % 3 === 1))
        val sentinel = spark.range(1).select(
          lit(-1L).as("user_id"), lit(sentinelMs).as("ms"),
          lit(true).as("is_ref"), lit(-1L).as("event_id"),
          lit(0.0).as("value"))
        val srcDir = Streams.partedDir(s"$dir#q254",
          Seq(onTime, lateRefs, sentinel))
        val src = spark.readStream
          .schema(onTime.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("ets", timestamp_millis($"ms"))
          .withWatermark("ets", s"$delayMs milliseconds")
          .select($"user_id", $"ms", $"is_ref", $"event_id", $"value",
            $"ets")
          .as[(Long, Long, Boolean, Long, Double, Timestamp)]
        val out = src.groupByKey(_._1)
          .transformWithState(new BufferedAsOfEnrich, TimeMode.EventTime(),
            OutputMode.Append())
          .toDF()
        Streams.runToMemory(out, "append")
          .select($"event_id", $"user_id", $"ms", $"value",
            $"click_id", $"click_ms", $"click_value",
            ($"ms" - $"click_ms").as("gap_ms"))
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    },

    // ---- stream-stream LEFT OUTER interval join ------------------------
    Qry(
      "q255_stream_left_outer_join",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events)
         |SELECT err.event_id, err.user_id,
         |  CAST(COUNT(c.ms) AS BIGINT) AS n_clicks,
         |  CAST(SUM(err.ms - c.ms) AS BIGINT) AS gap_sum,
         |  ${graft.Exact.dsumSql("c.value")} AS click_val_sum
         |FROM (SELECT * FROM e WHERE event_type = 'error') err
         |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON err.user_id = c.user_id
         | AND c.ms >= err.ms - 600000 AND c.ms <= err.ms
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
        .filter($"event_type".isin("click", "error"))
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"), $"value")
      // bounded driver state: one max row places the sentinels past
      // every join window + watermark delay
      val hi = ev.agg(max($"ms")).head().getLong(0)
      val sentinelMs = hi + 600000L + 1800000L
      // one sentinel PER SIDE (see the wave doc): each survives its
      // side's event_type filter, neither can join (-1 vs -2, and the
      // error sentinel's own window end sits past the final watermark
      // so it never emits a null row either)
      def sentinel(uid: Long, eid: Long, kind: String) =
        spark.range(1).select(lit(uid).as("user_id"),
          lit(eid).as("event_id"), lit(kind).as("event_type"),
          lit(sentinelMs).as("ms"), lit(0.0).as("value"))
      val srcDir = Streams.partedDir(s"$dir#q255", Seq(
        ev.unionByName(sentinel(-1L, -1L, "error"))
          .unionByName(sentinel(-2L, -2L, "click"))))
      def side() = spark.readStream.schema(ev.schema).parquet(srcDir)
        .withColumn("ts", timestamp_millis($"ms"))
        .withWatermark("ts", "10 minutes")
      val err = side().filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts".as("ts_e"))
      val clk = side().filter($"event_type" === "click")
        .select($"user_id".as("c_user_id"), $"ts".as("ts_c"),
          $"value".as("cv"))
      val joined = err.join(clk,
        $"user_id" === $"c_user_id" &&
          $"ts_c" >= $"ts_e" - expr("interval 10 minutes") &&
          $"ts_c" <= $"ts_e",
        "left_outer")
        .select($"event_id", $"user_id",
          (unix_millis($"ts_e") - unix_millis($"ts_c")).as("gap_ms"),
          $"cv", $"ts_c")
      // the error sentinel's window never closes (its ms IS the max),
      // so it cannot appear; filter is belt-and-braces for the day the
      // margins change
      Streams.runToMemory(joined, "append")
        .filter($"event_id" >= 0)
        .groupBy($"event_id", $"user_id")
        .agg(count($"ts_c").as("n_clicks"),
          sum($"gap_ms").as("gap_sum"),
          graft.Exact.dsum($"cv").as("click_val_sum"))
    }
  )
}
