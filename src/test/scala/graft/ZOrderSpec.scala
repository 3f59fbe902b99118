package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.sources.Tables

/** Proves the z-order layout claim with measured file-level pruning, the
  * mechanism a 100 TB engine uses (per-file min/max stats → skip):
  * write the same table under a z-ordered layout and a single-column
  * layout, reconstruct each file's min/max statistics, and count the
  * fraction of files a predicate could NOT skip. A single-column layout
  * prunes perfectly on its own column and not at all on any other; the
  * z-order layout must prune on BOTH dimensions.
  *
  * Layouts are written via `partitionBy` on an explicit bucket column
  * (top 4 z-bits / top 4 scaled-dimension bits), so file boundaries are
  * EXACTLY bit-aligned and the test is deterministic. The first version
  * used `repartitionByRange(zv)` — the real write path — but its
  * SAMPLED quantile boundaries occasionally landed mid-quadrant and
  * flipped a boundary file's eligibility under suite concurrency
  * (observed 9/16 once vs 5-6 typical): same layout idea, flaky
  * arithmetic. Bucket dirs pin the boundaries; `repartitionByRange`
  * remains the production write (its boundaries converge to the same
  * bit alignment as the sample grows).
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  // bucketing uses the top 4 bits — two bits of EACH dimension (an odd
  // bit count would split 2/1 and halve one dim's pruning): 16 bucket
  // dirs, quarter-range rectangles on both columns

  /** (eligible, total) file counts: eligible = files whose [lo, hi]
    * stats-range on `col` overlaps [lo, hi] — what a stats-based reader
    * must read. */
  private def eligible(dir: String, col: String, lo: Long, hi: Long): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col).as("lo"), max(col).as("hi"))
    (stats.filter($"lo" <= hi && $"hi" >= lo).count(), stats.count())
  }

  test("z-order layout prunes files on both dimensions; single-column layout only on its own") {
    val d = Tables(spark, "/root/testdata/sf0.01").orders
      .select($"o_custkey".as("ck"),
        datediff($"o_orderdate", lit("1992-01-01")).cast("long").as("dd"))
    val s = d.agg(min($"ck").as("ck_mn"), max($"ck").as("ck_mx"),
      min($"dd").as("dd_mn"), max($"dd").as("dd_mx"))
    val z = d.crossJoin(broadcast(s))
      .withColumn("cks", ZOrder.scale16($"ck", $"ck_mn", $"ck_mx"))
      .withColumn("zv", ZOrder.interleave16($"cks",
        ZOrder.scale16($"dd", $"dd_mn", $"dd_mx")))
      .select($"ck", $"dd", $"cks", $"zv")

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_")
    def write(df: DataFrame, bucket: org.apache.spark.sql.Column,
        sub: String): String = {
      val path = s"$base/$sub"
      // repartition on the bucket so each dir holds few files; partitionBy
      // guarantees every file contains ONE bucket's rows regardless
      df.withColumn("b", bucket).repartition($"b")
        .write.partitionBy("b").mode("overwrite").parquet(path)
      path
    }
    // z layout: top 4 interleaved bits; single-column layout: top 4 bits
    // of the scaled custkey
    val zDir = write(z, shiftright($"zv", 2 * ZOrder.Bits - 4), "z")
    val ckDir = write(z, shiftright($"cks", ZOrder.Bits - 4), "ck")

    // ranges covering ~10% of each dimension, placed INSIDE one aligned
    // z-quadrant (30–40%): a range straddling the 50% boundary touches
    // two quadrants of the interleave and would overstate eligibility
    val Seq((ckMn, ckMx, ddMn, ddMx)) =
      s.as[(Long, Long, Long, Long)].collect().toSeq
    val (ckLo, ckHi) = (ckMn + (ckMx - ckMn) * 30 / 100,
      ckMn + (ckMx - ckMn) * 40 / 100)
    val (ddLo, ddHi) = (ddMn + (ddMx - ddMn) * 30 / 100,
      ddMn + (ddMx - ddMn) * 40 / 100)

    // the single-column layout cannot skip anything on the OTHER column
    val (ckOnDate, ckTotal) = eligible(ckDir, "dd", ddLo, ddHi)
    assert(ckOnDate == ckTotal,
      s"ck-bucketed layout unexpectedly pruned a date predicate: $ckOnDate/$ckTotal")

    // z-order prunes on BOTH columns (≤ half the files eligible; the
    // aligned expectation is one quarter + boundary buckets)
    val (zOnDate, zTotal) = eligible(zDir, "dd", ddLo, ddHi)
    val (zOnCk, _) = eligible(zDir, "ck", ckLo, ckHi)
    assert(zOnDate <= zTotal / 2,
      s"z layout should skip ≥ half the files on a date predicate: $zOnDate/$zTotal")
    assert(zOnCk <= zTotal / 2,
      s"z layout should skip ≥ half the files on a custkey predicate: $zOnCk/$zTotal")
  }

  test("interleave16 round-trips bit positions exactly") {
    // spot values with known bit layouts: x bits land at even positions,
    // y bits at odd; extremes and an asymmetric pattern
    val rows = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 2L),
      (0xAAAAL, 0x5555L))
    val out = rows.toDF("x", "y")
      .select(ZOrder.interleave16($"x", $"y").as("z"))
      .as[Long].collect().toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(out == rows.map { case (x, y) => ref(x, y) })
  }
}
