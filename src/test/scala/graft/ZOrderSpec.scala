package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.sources.Tables

/** Proves the z-order layout claim with measured file-level pruning, the
  * mechanism a 100 TB engine uses (per-file min/max stats → skip):
  * write the same table under a z-ordered layout and a single-column
  * layout, reconstruct each file's min/max statistics, and count the
  * files a predicate could NOT skip. A single-column layout prunes
  * perfectly on its own column and not at all on any other; the z-order
  * layout must prune on BOTH dimensions.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  // 16 range-files fix the top FOUR z-bits — two bits of EACH dimension
  // (8 would fix y,x,y: an uneven 2/1 split that halves one dim's
  // pruning). Quarter-range rectangles per file on both columns.
  private val Files = 16

  /** Files whose [lo, hi] stats-range on `col` overlaps [lo, hi] — the
    * ones a stats-based reader must read. */
  private def eligible(dir: String, col: String, lo: Long, hi: Long): Long =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col).as("lo"), max(col).as("hi"))
      .filter($"lo" <= hi && $"hi" >= lo)
      .count()

  test("z-order layout prunes files on both dimensions; single-column layout only on its own") {
    val d = Tables(spark, "/root/testdata/sf0.01").orders
      .select($"o_custkey".as("ck"),
        datediff($"o_orderdate", lit("1992-01-01")).cast("long").as("dd"))
    val s = d.agg(min($"ck").as("ck_mn"), max($"ck").as("ck_mx"),
      min($"dd").as("dd_mn"), max($"dd").as("dd_mx"))
    val z = d.crossJoin(broadcast(s))
      .withColumn("zv", ZOrder.interleave16(
        ZOrder.scale16($"ck", $"ck_mn", $"ck_mx"),
        ZOrder.scale16($"dd", $"dd_mn", $"dd_mx")))
      .select($"ck", $"dd", $"zv")

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_")
    def write(df: DataFrame, byCol: String, sub: String): String = {
      val path = s"$base/$sub"
      df.repartitionByRange(Files, col(byCol)).sortWithinPartitions(byCol)
        .write.mode("overwrite").parquet(path)
      path
    }
    val zDir = write(z, "zv", "z")
    val ckDir = write(z, "ck", "ck")

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
    val ckLayoutOnDate = eligible(ckDir, "dd", ddLo, ddHi)
    assert(ckLayoutOnDate == Files,
      s"ck-sorted layout unexpectedly pruned a date predicate: $ckLayoutOnDate/$Files")

    // z-order prunes on BOTH columns (≤ half the files eligible)
    val zOnDate = eligible(zDir, "dd", ddLo, ddHi)
    val zOnCk = eligible(zDir, "ck", ckLo, ckHi)
    assert(zOnDate <= Files / 2,
      s"z layout should skip ≥ half the files on a date predicate: $zOnDate/$Files")
    assert(zOnCk <= Files / 2,
      s"z layout should skip ≥ half the files on a custkey predicate: $zOnCk/$Files")
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
