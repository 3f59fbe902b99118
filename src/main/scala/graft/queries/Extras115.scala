package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Coreness, HopDistance}
import graft.sources.Tables

/** Hundred-fifteenth coverage wave: the last two per-node graph-profile
  * metrics — core number and multi-source BFS hop distance — over
  * q262's customer↔supplier trade graph.
  *
  *  - q311: [[graft.operators.Coreness]] — k-core decomposition by
  *    iterated neighborhood H-indices (Lü et al. 2016: v0 = degree,
  *    v_{t+1} = H-index of neighbors' v_t; the fixed point IS the core
  *    number). Degree says how many partners a node has; coreness says
  *    how dense a subgraph it survives in — the trade-ring signal
  *    (high-core = mutually-dense commerce, core 1–2 = peripheral
  *    one-off buyers), and on dedup graphs the boilerplate-hub depth.
  *    The Spark side iterates adaptively to the fixed point (monotone
  *    value-sum convergence, the CC discipline); the oracle unrolls 7
  *    rounds — more than either gate SF needs (4 at sf0.01, 6 at
  *    sf0.1), and rounds past the fixed point are provably no-ops
  *    because the H-index map is stationary there, so adaptive == the
  *    unrolled CTE in one hash.
  *
  *  - q312: [[graft.operators.HopDistance]] — multi-source BFS from
  *    q305's five seed suppliers: dist = hops to the nearest trusted
  *    seed, NULL if unreachable. PPR (q305) is weighted affinity to
  *    the core; hop distance is its unweighted dual (introductions
  *    away). Same adaptive-vs-unrolled proof shape: min-plus
  *    relaxation settles in 4 rounds on both gate SFs; the oracle
  *    unrolls 6.
  *
  * Scale shape (both): staged symmetrized edge leaf (never
  * re-exchanged), per-round one edge-sized equi-join against a
  * stats-carrying one-row-per-node sliver (Catalyst broadcasts it
  * while small, shuffles at 100×), per-round stage+release, narrowed
  * loop shuffle width. Coreness adds one per-node descending sort
  * window per round (key-partitioned, spillable).
  */
object Extras115 {

  /** Seed suppliers (q305's trusted core): 1 ≤ s_suppkey ≤ SeedMax. */
  private[queries] val SeedMax = 5

  /** Shared trade-graph CTE prefix (q262/q305's construction):
    * customer node = 2c, supplier node = 2s+1, one undirected edge per
    * trading pair, both directions materialized. */
  private val GraphCtes =
    """b AS MATERIALIZED (SELECT o_custkey AS c, l_suppkey AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |e AS MATERIALIZED (SELECT CAST(2 * c AS BIGINT) AS src,
      |    CAST(2 * s + 1 AS BIGINT) AS dst FROM b
      |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
      |    CAST(2 * c AS BIGINT) FROM b)""".stripMargin

  /** One unrolled H-index round: rank neighbor values descending,
    * h = max(min(rank, value)). */
  private def coreRound(name: String, prev: String): String =
    s"""$name AS MATERIALIZED (SELECT node, MAX(LEAST(rn, nv)) AS v FROM (
       |  SELECT e.src AS node, c.v AS nv,
       |    row_number() OVER (PARTITION BY e.src ORDER BY c.v DESC) AS rn
       |  FROM e JOIN $prev c ON c.node = e.dst) GROUP BY node)""".stripMargin

  /** One unrolled min-plus BFS round (explicit CASE, no NULL-skipping
    * LEAST — the operator's relaxation line verbatim). */
  private def bfsRound(name: String, prev: String): String =
    s"""$name AS MATERIALIZED (SELECT d.node,
       |    CASE WHEN d.dist IS NULL THEN m.md
       |         WHEN m.md < d.dist THEN m.md ELSE d.dist END AS dist
       |  FROM $prev d LEFT JOIN (
       |    SELECT e.dst AS node, MIN(dn.dist) + 1 AS md
       |    FROM e JOIN $prev dn ON dn.node = e.src
       |    WHERE dn.dist IS NOT NULL GROUP BY 1) m
       |  ON m.node = d.node)""".stripMargin

  private[queries] def tradeEdges(spark: org.apache.spark.sql.SparkSession,
      dir: String) = {
    import spark.implicits._
    val tt = Tables(spark, dir)
    val b = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey".cast(LongType).as("c"),
        $"l_suppkey".cast(LongType).as("s"))
      .agg(count(lit(1)).as("w"))
    b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
      .unionByName(b.select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst")))
  }

  /** Full-graph BFS oracle — shared VERBATIM by q312 and q328 (the
    * incremental path must reproduce the batch answer in one hash). */
  private[queries] val BfsOracle =
      s"""WITH $GraphCtes,
         |n AS (SELECT DISTINCT src AS node FROM e),
         |seeds AS (SELECT node FROM n
         |          WHERE node % 2 = 1
         |            AND (node - 1) // 2 BETWEEN 1 AND $SeedMax),
         |d0 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL
         |        THEN CAST(0 AS BIGINT) END AS dist
         |  FROM n LEFT JOIN seeds s ON n.node = s.node),
         |${bfsRound("d1", "d0")},
         |${bfsRound("d2", "d1")},
         |${bfsRound("d3", "d2")},
         |${bfsRound("d4", "d3")},
         |${bfsRound("d5", "d4")},
         |${bfsRound("d6", "d5")}
         |SELECT node % 2 AS kind, node // 2 AS key, dist
         |FROM d6""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q311_coreness",
      s"""WITH $GraphCtes,
         |c0 AS (SELECT src AS node, COUNT(*) AS v FROM e GROUP BY 1),
         |${coreRound("c1", "c0")},
         |${coreRound("c2", "c1")},
         |${coreRound("c3", "c2")},
         |${coreRound("c4", "c3")},
         |${coreRound("c5", "c4")},
         |${coreRound("c6", "c5")},
         |${coreRound("c7", "c6")}
         |SELECT node % 2 AS kind, node // 2 AS key, v AS core
         |FROM c7""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Coreness.run(tradeEdges(spark, dir), "src", "dst")
        .select(($"id" % 2).as("kind"), expr("id DIV 2").as("key"),
          $"core")
    },

    Qry("q312_hop_distance", BfsOracle) { (spark, dir) =>
      import spark.implicits._
      val seeds = spark.range(1, SeedMax + 1)
        .select(($"id" * 2 + 1).as("sid"))
      HopDistance.run(tradeEdges(spark, dir), "src", "dst", seeds, "sid")
        .select(($"id" % 2).as("kind"), expr("id DIV 2").as("key"),
          $"dist")
    }
  )

}
