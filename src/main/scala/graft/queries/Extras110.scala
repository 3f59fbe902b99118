package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.PageRank
import graft.sources.Tables

/** Hundred-tenth coverage wave: personalized PageRank — affinity to a
  * SEED SET, the graph tier's similar-item / source-tracing primitive.
  *
  *  - q305: [[graft.operators.PageRank.runPersonalized]] over q262's
  *    customer↔supplier trade graph, personalized to the five
  *    lowest-key suppliers: teleport mass and dangling mass return to
  *    the seeds instead of spreading uniformly, so the stationary-ish
  *    ranks after R=3 fixed rounds measure "how close is this node to
  *    THE SEED SUPPLIERS through trade volume" — the query behind
  *    "customers like yours buy from…", boilerplate-source expansion
  *    from known-bad seeds, and label spreading from a trusted core.
  *    Exact integer ppm throughout (the q262 discipline: teleport =
  *    (100−d)·n·Ppm DIV (100·s), inflow by the overflow-safe
  *    floor(r·w/tw) identity), so the oracle re-derives all three
  *    rounds as unrolled CTEs with the seed indicator joined per
  *    round. The trade graph has no dangling nodes by construction
  *    (both edge directions), so the dangling-to-seeds term is
  *    provably zero here; the operator's handling of it is pinned by
  *    PageRankSpec instead.
  *
  *    Scale shape = q262's: staged edge leaf, per-round rank sliver
  *    broadcast below 1M nodes, per-round stage+release; the seed
  *    indicator is one extra column on the node sliver, not a new
  *    frame.
  */
object Extras110 {

  private val Rounds = 3
  /** Seed suppliers: 1 <= s_suppkey <= SeedMax (TPC-H supplier keys
    * start at 1 — an r11 advisory caught the 0-based range seeding
    * only four live suppliers while the docs said five). */
  private val SeedMax = 5

  /** One unrolled PPR round: teleport-to-seeds + damped inflow. */
  private def pprRound(name: String, prev: String): String =
    s"""$name AS (SELECT n.node,
       |    (CASE WHEN s.node IS NOT NULL
       |      THEN (15 * (SELECT COUNT(*) FROM n) * 1000000)
       |        // (100 * (SELECT COUNT(*) FROM seeds)) ELSE 0 END)
       |    + (85 * COALESCE(SUM((r.r * e.w) // tw.tw), 0)) // 100 AS r
       |  FROM n LEFT JOIN seeds s ON n.node = s.node
       |    LEFT JOIN e ON e.dst = n.node
       |    LEFT JOIN tw ON tw.src = e.src
       |    LEFT JOIN $prev r ON r.node = e.src
       |  GROUP BY n.node, s.node)""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q305_personalized_pagerank",
      s"""WITH b AS (SELECT o_custkey AS c, l_suppkey AS s,
         |    CAST(COUNT(*) AS BIGINT) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |e AS (SELECT CAST(2 * c AS BIGINT) AS src,
         |    CAST(2 * s + 1 AS BIGINT) AS dst, w FROM b
         |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
         |    CAST(2 * c AS BIGINT), w FROM b),
         |tw AS (SELECT src, SUM(w) AS tw FROM e GROUP BY 1),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |seeds AS (SELECT node FROM n
         |          WHERE node % 2 = 1
         |            AND (node - 1) // 2 BETWEEN 1 AND $SeedMax),
         |r0 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL
         |      THEN ((SELECT COUNT(*) FROM n) * 1000000)
         |        // (SELECT COUNT(*) FROM seeds) ELSE 0 END AS r
         |  FROM n LEFT JOIN seeds s ON n.node = s.node),
         |${pprRound("r1", "r0")},
         |${pprRound("r2", "r1")},
         |${pprRound("r3", "r2")}
         |SELECT (node - 1) // 2 AS suppkey, CAST(r AS BIGINT) AS rank_ppm
         |FROM r3 WHERE node % 2 = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val b = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey".cast(LongType).as("c"),
          $"l_suppkey".cast(LongType).as("s"))
        .agg(count(lit(1)).as("w"))
      val edges = b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"),
          $"w")
        .unionByName(b.select(($"s" * 2 + 1).as("src"),
          ($"c" * 2).as("dst"), $"w"))
      val seeds = spark.range(1, SeedMax + 1)
        .select(($"id" * 2 + 1).as("sid"))
      PageRank.runPersonalized(edges, "src", "dst", "w",
          seeds, "sid", rounds = Rounds)
        .filter($"id" % 2 === 1)
        .select(expr("(id - 1) DIV 2").as("suppkey"), $"rank_ppm")
    }
  )
}
