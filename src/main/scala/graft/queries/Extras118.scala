package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.ConnectedComponents
import graft.sources.Tables

/** Hundred-eighteenth coverage wave: grid-density clustering —
  * DBSCAN's core/border/noise semantics at CELL grain over the
  * (quantity, price) plane, the density-based complement to the
  * centroid (IVF/Lloyd, q257/q270) and graph (LPA q293) clustering
  * tiers.
  *
  *  - q316: points = lineitem rows embedded at integer coordinates
  *    (2·quantity, price-cents DIV 400000) — quantity bands sit two
  *    cell units apart so distinct bands can never be 8-adjacent, the
  *    grid-resolution choice DBSCAN's eps makes continuously. A cell
  *    holding ≥ 30 points is CORE; connected components over
  *    8-adjacent core cells (via [[ConnectedComponents.minLabel]],
  *    the q74 machinery) are the clusters; a non-core cell adjacent
  *    to a core cell is BORDER and adopts the minimum adjacent
  *    cluster; everything else is NOISE. The fixture's mixed
  *    discrete-continuous shape gives the textbook read: one cluster
  *    per quantity band (plus low-density fringe splits at small SF),
  *    with the sparse price tail peeling to border/noise.
  *    Everything is EXACT integer arithmetic — cents, integral
  *    division, integer cell ids — so the oracle (recursive-CTE CC
  *    over the same cell graph) matches bit-for-bit; no
  *    floating-point epsilon anywhere.
  *
  * Scale shape: the only corpus-sized stage is the (cx, cy) count
  * groupBy (map-side partial agg). Core-cell adjacency, CC, border
  * assignment and the noise anti-join all run over the CELL table —
  * bounded by the grid extent, never by corpus rows; neighbor
  * generation is a 9-offset explode + equi-join, never a spatial
  * all-pairs.
  */
object Extras118 {

  private[queries] val MinPts = 30
  private val CellCents = 400000L // $4,000 price cells

  /** Oracle text shared VERBATIM with the streaming twin q325
    * (Extras123): the stream replays the same lineitem corpus once. */
  private[queries] val GridOracle =
    s"""WITH RECURSIVE pts AS (SELECT CAST(l_quantity AS BIGINT) * 2
         |    AS cx,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) // $CellCents
         |      AS cy FROM lineitem),
         |cells AS (SELECT cx, cy, COUNT(*) AS n FROM pts GROUP BY 1, 2),
         |ids AS (SELECT cx, cy, cx * 1000000 + cy AS id, n FROM cells
         |        WHERE n >= $MinPts),
         |edges AS (SELECT a.id AS a, b.id AS b FROM ids a JOIN ids b
         |  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         |  AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 AND a.id <> b.id),
         |reach(src, dst) AS (SELECT id, id FROM ids
         |  UNION SELECT r.src, e.b FROM reach r JOIN edges e
         |        ON r.dst = e.a),
         |comp AS (SELECT src AS id, MIN(dst) AS cluster FROM reach
         |         GROUP BY 1),
         |corec AS (SELECT i.cx, i.cy, i.n, c.cluster FROM ids i
         |          JOIN comp c ON c.id = i.id),
         |borderc AS (SELECT c.cx, c.cy, c.n, MIN(k.cluster) AS cluster
         |  FROM cells c JOIN corec k
         |    ON k.cx BETWEEN c.cx - 1 AND c.cx + 1
         |    AND k.cy BETWEEN c.cy - 1 AND c.cy + 1
         |  WHERE c.n < $MinPts GROUP BY 1, 2, 3)
         |SELECT cx, cy, n, 0 AS role, cluster FROM corec
         |UNION ALL SELECT cx, cy, n, 1, cluster FROM borderc
         |UNION ALL SELECT c.cx, c.cy, c.n, 2, CAST(NULL AS BIGINT)
         |  FROM cells c
         |  WHERE c.n < $MinPts AND NOT EXISTS (SELECT 1 FROM corec k
         |    WHERE k.cx BETWEEN c.cx - 1 AND c.cx + 1
         |      AND k.cy BETWEEN c.cy - 1 AND c.cy + 1)""".stripMargin

  /** Integer cell coordinates for a lineitem frame (batch or stream). */
  private[queries] def gridCells(li: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    li.select((col("l_quantity").cast(LongType) * 2).as("cx"),
        expr(s"CAST(round(l_extendedprice * 100) AS BIGINT) " +
          s"DIV $CellCents").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))

  /** Core/border/noise + cluster assignment over a (cx, cy, n) cell
    * table — shared verbatim by q316 and the streaming twin q325. */
  private[graft] def densityTail(cells0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import cells0.sparkSession.implicits._
    {
      // staged ONCE: the cell table is referenced four times below
      // (both sides of the core adjacency self-join, the cluster
      // re-attach, the non-core side) and each unstaged reference
      // re-ran the corpus-sized point→cell aggregate; the staged frame
      // is grid-bounded, never corpus-sized. Deliberately NOT released
      // in-query — the returned plan references it lazily; the
      // harness's per-query Staging.sweep owns the release (the
      // Staging object doc's ownership convention).
      val cells = graft.operators.Staging.stage(cells0, eager = true)
      val core = cells.filter($"n" >= MinPts)
        .withColumn("id", $"cx" * 1000000L + $"cy")
      // 8-neighborhood as a 9-offset explode + equi-join (never a
      // spatial product); offsets are a broadcast 9-row literal
      val offsets = Seq(-1L, 0L, 1L)
        .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val coreNbr = core.crossJoin(broadcast(offsets))
        .select(($"cx" + $"dx").as("nx"), ($"cy" + $"dy").as("ny"),
          $"id", $"cx", $"cy")
      val edges = coreNbr
        .join(core.select($"cx".as("bx"), $"cy".as("by"),
            $"id".as("b")),
          $"nx" === $"bx" && $"ny" === $"by" && $"id" =!= $"b")
        .select($"id".as("a"), $"b")
      // clusters = min reachable core-cell id; isolated core cells
      // (no edges) never enter minLabel — they are their own cluster
      val comp = ConnectedComponents.minLabel(edges, "a", "b")
      val corec = core.join(comp, core("id") === comp("id"), "left_outer")
        .select(core("cx"), core("cy"), core("n"),
          coalesce($"component", core("id")).as("cluster"))
      val nonCore = cells.filter($"n" < MinPts)
      // border: adjacent to >= 1 core cell, adopts the min cluster
      val nbrClusters = corec.crossJoin(broadcast(offsets))
        .select(($"cx" + $"dx").as("nx"), ($"cy" + $"dy").as("ny"),
          $"cluster")
      val withNbr = nonCore.join(nbrClusters,
          $"cx" === $"nx" && $"cy" === $"ny", "left_outer")
        .groupBy($"cx", $"cy", $"n")
        .agg(min($"cluster").as("cluster"))
      val border = withNbr.filter($"cluster".isNotNull)
        .select($"cx", $"cy", $"n", lit(1).as("role"), $"cluster")
      val noise = withNbr.filter($"cluster".isNull)
        .select($"cx", $"cy", $"n", lit(2).as("role"),
          lit(null).cast(LongType).as("cluster"))
      corec.select($"cx", $"cy", $"n", lit(0).as("role"), $"cluster")
        .unionByName(border).unionByName(noise)
    }
  }

  val all: Seq[Qry] = Seq(

    Qry("q316_grid_density_clusters", GridOracle) { (spark, dir) =>
      densityTail(gridCells(Tables(spark, dir).lineitem))
    }
  )
}
