package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.Streams

/** Per-user lag-analytics state (top-level for the state encoder);
  * `lastTs = -1` marks "no previous event" so gaps bridge micro-batches. */
case class LagState(n: Long, maxGap: Long, lastTs: Long)

/** The reference's competing-consumer runtime shape: N producers fill one
  * buffer while M consumer threads race dequeues, each running its own
  * analytics (`/root/reference/src/tests/integration_test.rs:209-293`).
  * The Spark mapping (SURVEY.md §1.5.6) is multiple concurrent streaming
  * queries over one source — exercised here for real: both queries are
  * STARTED before either is awaited, verified simultaneously active, and
  * each must agree with its batch twin (stream/batch equivalence is the
  * correctness statement, as in the q44–q46 oracle queries).
  */
class ConcurrentConsumersSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("two concurrent consumers over one source: VWAP + event-time lag") {
    // one source, two independent readers (linkDir caches per path, so
    // both file streams watch the SAME directory)
    val srcA = Streams.fileStream(spark, dir, "events")
    val srcB = Streams.fileStream(spark, dir, "events")

    // consumer A: windowed VWAP (price=value, qty synthesized from the
    // event id — the reference consumers' per-window weighted average)
    def qty(c: org.apache.spark.sql.Column) = (c % 7 + 1).cast("long")
    val vwapStream = srcA
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(sum($"value" * qty($"event_id")).as("pv"),
        sum(qty($"event_id")).as("v"), count(lit(1)).as("n"))

    // consumer B: per-user event-time lag analytics (max inter-event gap)
    // as keyed state — the reference's per-consumer running analytics
    val lagStream = srcB
      .select($"user_id", unix_millis($"ts").as("ms"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LagState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[LagState]) =>
          val prev = state.getOption.getOrElse(LagState(0L, 0L, -1L))
          val ts = rows.map(_._2).toArray.sorted
          val seq = (if (prev.lastTs >= 0) Array(prev.lastTs) else
            Array.empty[Long]) ++ ts
          val gaps = seq.iterator.zip(seq.iterator.drop(1))
            .map(p => p._2 - p._1)
          val mg = (Iterator(prev.maxGap) ++ gaps).max
          val next = LagState(prev.n + ts.length, mg,
            if (ts.nonEmpty) ts.last else prev.lastTs)
          state.update(next)
          Iterator((uid, next.n, next.maxGap))
      }
      .toDF("user_id", "n", "max_gap")

    val qA = vwapStream.writeStream.outputMode("complete")
      .format("memory").queryName("cc_vwap").start()
    val qB = lagStream.writeStream.outputMode("append")
      .format("memory").queryName("cc_lag").start()
    try {
      // both consumers registered and running against the source at once
      assert(spark.streams.active.count(q =>
        q.name == "cc_vwap" || q.name == "cc_lag") == 2)
      qA.processAllAvailable()
      qB.processAllAvailable()

      val ev = graft.sources.Tables(spark, dir).events
      // batch twin of consumer A
      val vwapBatch = ev
        .groupBy(window($"ts", "15 minutes"), $"event_type")
        .agg(sum($"value" * qty($"event_id")).as("pv"),
          sum(qty($"event_id")).as("v"), count(lit(1)).as("n"))
        .select($"window.start", $"event_type", ($"pv" / $"v").as("vwap"),
          $"n")
        .as[(java.sql.Timestamp, String, Double, Long)].collect()
        .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
      val vwapGot = spark.table("cc_vwap")
        .select($"window.start", $"event_type", ($"pv" / $"v").as("vwap"),
          $"n")
        .as[(java.sql.Timestamp, String, Double, Long)].collect()
        .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
      assert(vwapGot.keySet == vwapBatch.keySet)
      vwapGot.foreach { case (k, (vw, n)) =>
        val (bvw, bn) = vwapBatch(k)
        assert(n == bn, s"count mismatch at $k")
        assert(math.abs(vw - bvw) <= 1e-9 * math.max(1.0, math.abs(bvw)),
          s"vwap mismatch at $k: $vw vs $bvw")
      }

      // batch twin of consumer B (window lag over the same ms column);
      // keep each user's FINAL running row, as q46 does
      val w = Window.partitionBy($"user_id").orderBy($"ms")
      val lagBatch = ev.select($"user_id", unix_millis($"ts").as("ms"))
        .withColumn("gap", $"ms" - lag($"ms", 1).over(w))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          coalesce(max($"gap"), lit(0L)).as("max_gap"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val lagGot = spark.table("cc_lag")
        .groupBy($"user_id")
        .agg(max(struct($"n", $"max_gap")).as("s"))
        .select($"user_id", $"s.n", $"s.max_gap")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(lagGot == lagBatch)
    } finally {
      qA.stop(); qB.stop()
      spark.catalog.dropTempView("cc_vwap")
      spark.catalog.dropTempView("cc_lag")
    }
  }
}
