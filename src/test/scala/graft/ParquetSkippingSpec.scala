package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Parquet's OWN data-skipping pinned via scan metrics (the layout-
  * advisor rung below q152 Z-order / q124 partition pruning / the DPP
  * pin): a point predicate over a SORTED small-row-group layout must
  * prune row groups through min/max stats + column index, and a
  * written BLOOM FILTER must prune row groups for values that are
  * ABSENT even when stats cannot (unsorted layout, overlapping
  * ranges). The discriminator is the scan's numOutputRows: pushed
  * filters are evaluated at row-group/page granularity (record-level
  * filtering off by default), so rows from surviving groups flow out
  * of the scan and the Filter above drops the rest — group pruning is
  * visible as a smaller scan output, not a smaller final result.
  *
  * At 100 TB this is the difference between a point lookup touching
  * one row group and touching every file: the write-side layout
  * contract (sort + small groups + blooms on lookup keys) is what the
  * spec makes mechanical.
  */
class ParquetSkippingSpec extends SparkTestBase {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    Seq(p) ++ p.children.flatMap(flatten) ++ (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case _ => Nil
    })

  /** Rows emitted by the parquet scan node (post group/page pruning,
    * pre exact Filter). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
      .collectFirst { case s: FileSourceScanExec =>
        s.metrics("numOutputRows").value }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.01/lineitem.parquet")
    .select($"l_orderkey", $"l_partkey", $"l_extendedprice")

  private lazy val total = li.count()

  // small groups so the 60k-row fixture spans many of them; blooms on
  // the unsorted lookup key
  private def write(dir: String, sorted: Boolean): String = {
    val base = if (sorted) li.sort($"l_orderkey") else li.sort($"l_partkey")
    base.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.bloom.filter.enabled#l_partkey", "true")
      .parquet(dir)
    dir
  }

  private lazy val sortedDir =
    write(java.nio.file.Files.createTempDirectory("graft_pq_sorted_")
      .toString, sorted = true)
  private lazy val unsortedDir =
    write(java.nio.file.Files.createTempDirectory("graft_pq_unsorted_")
      .toString, sorted = false)

  test("sorted row groups + column index prune a point predicate; " +
      "the unsorted layout cannot") {
    // a MEDIAN key, not an extreme: a min/max key sits at the edge of
    // every page's range, so even a random layout's column index can
    // prune it — the median is inside ~every group/page range of the
    // unsorted layout, isolating exactly the sorted-layout effect
    val key = li.stat.approxQuantile("l_orderkey", Array(0.5), 0.0)(0)
      .toLong
    val sortedRows = scanRows(
      spark.read.parquet(sortedDir).filter($"l_orderkey" === key))
    val unsortedRows = scanRows(
      spark.read.parquet(unsortedDir).filter($"l_orderkey" === key))
    // sorted: the key lives in one group/page neighborhood; unsorted
    // (sorted by a different column): every group's orderkey range
    // overlaps the point, nothing prunes
    assert(sortedRows * 4 <= total,
      s"sorted layout read $sortedRows of $total rows — no pruning")
    assert(unsortedRows * 2 >= total,
      s"unsorted layout read only $unsortedRows of $total — " +
        "expected overlap to defeat stats pruning")
    assert(sortedRows * 4 <= unsortedRows,
      s"expected ≥4x fewer rows via sorted-group pruning " +
        s"($sortedRows vs $unsortedRows)")
  }

  test("bloom filter prunes row groups for ABSENT keys where stats " +
      "cannot") {
    // an l_partkey that does not exist: one past the max
    val absent = li.agg(max($"l_partkey")).head().getLong(0) + 1
    // the bloom column is the SORT column of unsortedDir — groups are
    // partkey-ranged there, so stats alone would also prune; use the
    // SORTED-by-orderkey file, where every group spans ~all partkeys
    // and ONLY the bloom can prove absence
    val rows = scanRows(
      spark.read.parquet(sortedDir).filter($"l_partkey" === absent))
    assert(rows == 0L,
      s"bloom should prove absence and skip every row group, read $rows")
    // control: a PRESENT partkey in the same file cannot be pruned by
    // stats (groups span the range) and the bloom must not misfire
    val present = li.agg(min($"l_partkey")).head().getLong(0)
    val presentRows = scanRows(
      spark.read.parquet(sortedDir).filter($"l_partkey" === present))
    assert(presentRows > 0L, "present key must survive bloom probing")
  }
}
