package graft

import org.apache.spark.sql.functions._

import graft.operators.Staging

/** Data-proportional loop shuffle width (r14 verdict #1: the iterated
  * loops pinned `shuffle.partitions=8`, a local-mode constant that
  * would cap the per-round edge-sized aggregates at 8 reducers at
  * 100 TB). [[Staging.loopShufflePartitions]] derives the width from
  * the staged frames' MEASURED block bytes (driver-side read of the
  * block manager — no extra Spark job): floor at fixture scale, linear
  * in the data beyond one target block per partition.
  */
class LoopPartitionsSpec extends SparkTestBase {
  import spark.implicits._

  private def staged(rows: Long) = Staging.stage(
    spark.range(rows).select($"id".as("src"), ($"id" * 7).as("dst")),
    eager = true)

  test("tiny staged frames sit at the floor width") {
    val e = staged(1000)
    assert(Staging.loopShufflePartitions(spark, e)
      === Staging.LoopMinPartitions)
    Staging.release(e)
  }

  test("width grows linearly once frames exceed the target block") {
    val e = staged(50000)
    val key = Staging.LoopTargetBytesKey
    try {
      // shrink the target so this small frame spans many "blocks":
      // the width must scale with measured bytes / target
      spark.conf.set(key, "4096")
      val w4k = Staging.loopShufflePartitions(spark, e)
      assert(w4k > Staging.LoopMinPartitions,
        s"expected > floor at 4 KB target, got $w4k")
      spark.conf.set(key, "2048")
      val w2k = Staging.loopShufflePartitions(spark, e)
      // halving the target must not shrink the width; it should about
      // double (exact ratio depends on block rounding)
      assert(w2k >= w4k * 3 / 2, s"expected ~2x of $w4k, got $w2k")
    } finally spark.conf.unset(key)
    Staging.release(e)
  }

  test("unstaged frames contribute nothing (floor width, no crash)") {
    val plain = spark.range(10).select($"id".as("src"))
    assert(Staging.loopShufflePartitions(spark, plain)
      === Staging.LoopMinPartitions)
  }

  test("sliver mode flips off once frames exceed one target block") {
    val e = staged(50000)
    val key = Staging.LoopTargetBytesKey
    try {
      assert(Staging.loopShuffleConf(spark, e)._2,
        "tiny frame must be sliver mode under the 64 MB default")
      spark.conf.set(key, "4096")
      assert(!Staging.loopShuffleConf(spark, e)._2,
        "frame past one target block must leave sliver mode")
    } finally spark.conf.unset(key)
    Staging.release(e)
  }

  test("withLoopShuffle restores both confs on exit (and on throw)") {
    val e = staged(1000)
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    Staging.withLoopShuffle(spark, e) {
      assert(spark.conf.get("spark.sql.shuffle.partitions")
        === Staging.LoopMinPartitions.toString)
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === parts0)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
    intercept[RuntimeException] {
      Staging.withLoopShuffle(spark, e) { throw new RuntimeException("x") }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === parts0)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
    Staging.release(e)
  }

  test("multiple staged frames sum their bytes") {
    val a = staged(50000)
    val b = staged(50000)
    val key = Staging.LoopTargetBytesKey
    try {
      spark.conf.set(key, "4096")
      val one = Staging.loopShufflePartitions(spark, a)
      val two = Staging.loopShufflePartitions(spark, a, b)
      assert(two >= one * 3 / 2, s"expected ~2x of $one, got $two")
    } finally spark.conf.unset(key)
    Staging.release(a); Staging.release(b)
  }
}
