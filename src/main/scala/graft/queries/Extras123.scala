package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-twenty-third coverage wave: the density grid as a stream,
  * and relative-density outlier scoring on the same grid.
  *
  *  - q325: q316's grid-density clustering as a STREAMING monitor —
  *    the (cx, cy) cell-count table is a complete-mode streaming
  *    aggregation over the lineitem stream; the clustering tail
  *    (core threshold, 8-adjacency CC, border adoption, noise) runs
  *    post-sink over the grid-bounded cells through the SAME tail
  *    function and oracle text as q316. The production shape: a live
  *    transaction stream keeps the density map current; cluster
  *    structure is re-derived from bounded state, never from history.
  *
  *  - q326: grid-LOF — the Local Outlier Factor idea at cell grain:
  *    a cell's outlier score is its neighborhood's mean density over
  *    its own, lof_ppm = 10⁶·Σnbr(n) DIV (cnt·n) — exact integers, no
  *    kNN distance computation (the grid IS the neighborhood). Cells
  *    much sparser than their surroundings (score ≫ 10⁶) are local
  *    outliers even when globally mid-density — the signal MAD/CUSUM
  *    (global/temporal) don't see; isolated cells (no neighbors)
  *    carry a NULL score and are flagged by the noise role in q316.
  *
  * Scale shape (both): one corpus-sized count groupBy; everything
  * after runs on the bounded cell table via the 9-offset explode +
  * equi-join.
  */
object Extras123 {

  val all: Seq[Qry] = Seq(

    Qry("q325_stream_density_clusters", Extras118.GridOracle) {
      (spark, dir) =>
      import spark.implicits._
      val cells = Streams.fileStream(spark, dir, "lineitem")
        .transform(Extras118.gridCells)
      Extras118.densityTail(Streams.runToMemory(cells, "complete"))
    },

    Qry(
      "q326_grid_lof",
      s"""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) * 2 AS cx,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) // 400000
         |      AS cy FROM lineitem),
         |cells AS (SELECT cx, cy, COUNT(*) AS n FROM pts GROUP BY 1, 2),
         |nbr AS (SELECT c.cx, c.cy, c.n,
         |    SUM(o.n) AS nbr_sum, COUNT(o.n) AS nbr_cnt
         |  FROM cells c LEFT JOIN cells o
         |    ON o.cx BETWEEN c.cx - 1 AND c.cx + 1
         |    AND o.cy BETWEEN c.cy - 1 AND c.cy + 1
         |    AND NOT (o.cx = c.cx AND o.cy = c.cy)
         |  GROUP BY 1, 2, 3)
         |SELECT cx, cy, n, CAST(COALESCE(nbr_sum, 0) AS BIGINT)
         |    AS nbr_sum,
         |  CAST(nbr_cnt AS BIGINT) AS nbr_cnt,
         |  CAST(CASE WHEN nbr_cnt > 0
         |    THEN (1000000 * nbr_sum) // (nbr_cnt * n) END AS BIGINT)
         |    AS lof_ppm
         |FROM nbr""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cells = Extras118.gridCells(Tables(spark, dir).lineitem)
      val offsets8 = Seq(-1L, 0L, 1L)
        .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
        .filterNot(o => o._1 == 0L && o._2 == 0L)
        .toDF("dx", "dy")
      // each cell contributes its count to its 8 neighbors' totals
      val contrib = cells.crossJoin(broadcast(offsets8))
        .select(($"cx" + $"dx").as("nx"), ($"cy" + $"dy").as("ny"),
          $"n".as("cn"))
      cells.join(contrib,
          $"cx" === $"nx" && $"cy" === $"ny", "left_outer")
        .groupBy($"cx", $"cy", $"n")
        .agg(coalesce(sum($"cn"), lit(0L)).cast(LongType).as("nbr_sum"),
          count($"cn").cast(LongType).as("nbr_cnt"))
        .withColumn("lof_ppm",
          expr("CAST(CASE WHEN nbr_cnt > 0 THEN " +
            "(1000000 * nbr_sum) DIV (nbr_cnt * n) END AS BIGINT)"))
    }
  )
}
