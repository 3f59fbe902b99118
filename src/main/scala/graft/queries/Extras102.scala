package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup, LabelProp, Staging, TextOps}
import graft.sources.Tables

/** Hundred-second coverage wave: community detection over the near-dup
  * graph — synchronous label propagation, oracle-paired.
  *
  *  - q293: [[graft.operators.LabelProp.run]] — K=3 fixed synchronous
  *    LPA rounds over q74's near-dup graph (Jaccard ≥ 0.5 pairs,
  *    symmetrized, edge weight = shared shingle count), the standard
  *    boilerplate-family detector a crawl-curation pipeline runs after
  *    dedup clustering. Weighted-majority label updates (with the
  *    operator's max-incident-weight self vote — see LabelProp's scaladoc
  *    for why neighbors-only synchronous LPA detects nothing) and
  *    min-label tie-breaks are pure integer comparisons, so the oracle
  *    re-derives
  *    all three rounds as unrolled CTEs (q262's fixed-iteration proof
  *    shape, applied to LPA), and the output carries each node's
  *    connected component (q74's machinery) as the sanity column: LPA
  *    communities always REFINE components — every community lives
  *    inside one component, and the gate's exact rows pin where the
  *    refinement splits dense families apart. The oracle's `edges`
  *    CTE is declared MATERIALIZED: it is referenced ~7 times (three
  *    vote rounds, self-weights, nodes, the recursive reach) and
  *    DuckDB otherwise inlines the whole shingle-pair pipeline into
  *    every reference — at the 10x heavy tier that re-evaluation
  *    spilled past 79 GB of temp before running out of disk; one
  *    materialization makes the heavy oracle feasible (measured).
  *
  *    Scale shape: the expensive frame (the shingle→Jaccard pair
  *    pipeline) is the SAME df-capped blocked join every dedup-family
  *    query uses (no all-pairs anywhere); the LPA loop itself moves
  *    one (id, label) row per node per round, broadcasts the label
  *    sliver into the staged edge leaf (≤1M nodes), and releases each
  *    round's blocks as the next lands — at 100× only the K edge-join
  *    shuffles grow, exactly like q262's PageRank rounds.
  */
object Extras102 {

  private val Rounds = 3

  /** One unrolled LPA round as DuckDB CTEs: neighbor votes + the
    * max-incident-weight self vote, then argmax (ties -> min label). */
  private def lpRound(i: Int): String =
    s"""f$i AS (SELECT node, label, SUM(f) AS f FROM (
       |    SELECT e.b AS node, p.label, e.w AS f
       |    FROM edges e JOIN lp${i - 1} p ON p.node = e.a
       |    UNION ALL
       |    SELECT s.node, p.label, s.mw
       |    FROM selfw s JOIN lp${i - 1} p ON p.node = s.node) v
       |  GROUP BY 1, 2),
       |lp$i AS (SELECT node, label FROM (
       |    SELECT node, label, row_number() OVER (PARTITION BY node
       |      ORDER BY f DESC, label) AS rn FROM f$i) WHERE rn = 1)"""
      .stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q293_label_prop", {
        s"""WITH RECURSIVE ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id)
           |          AS n, h
           |        FROM shc),
           |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
           |    COUNT(*) AS shared, MAX(a.n) AS na, MAX(b.n) AS nb
           |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |ed0 AS (SELECT da, db, shared FROM pairs
           |        WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5e0),
           |edges AS MATERIALIZED (
           |          SELECT da AS a, db AS b, shared AS w FROM ed0
           |          UNION ALL SELECT db, da, shared FROM ed0),
           |nodes AS (SELECT DISTINCT a AS id FROM edges),
           |selfw AS (SELECT b AS node, MAX(w) AS mw FROM edges
           |          GROUP BY 1),
           |lp0 AS (SELECT id AS node, id AS label FROM nodes),
           |${lpRound(1)},
           |${lpRound(2)},
           |${lpRound(3)},
           |reach(src, dst) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
           |cc AS (SELECT src AS member, MIN(dst) AS component
           |       FROM reach GROUP BY 1)
           |SELECT l.node AS member, l.label, cc.component
           |FROM lp3 l JOIN cc ON cc.member = l.node""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // ONE shingle pipeline feeds both the LPA edges and the CC sanity
      // column — and the PAIR JOIN itself is staged here: jaccardPairs
      // stages only the shingle leaf, and LabelProp.run and
      // ConnectedComponents.minLabel each stage their edge input
      // EAGERLY, which without this would execute the pair join twice
      // (measured ~9 s at sf0.1; staged once it is paid once)
      val pairs = Staging.stage(
        Dedup.jaccardPairs(
            Dedup.shingleHashes(Tables(spark, dir).documents,
              "doc_id", "text"), "doc_id")
          .filter($"jaccard" >= 0.5)
          .select($"id_a", $"id_b", $"shared"),
        eager = false)
      val edges = pairs
        .select($"id_a".as("src"), $"id_b".as("dst"), $"shared".as("w"))
        .unionByName(pairs
          .select($"id_b".as("src"), $"id_a".as("dst"), $"shared".as("w")))
      val lpa = LabelProp.run(edges, "src", "dst", "w", rounds = Rounds)
        .select($"id".as("member"), $"label")
      val cc = ConnectedComponents.minLabel(
          pairs.select($"id_a", $"id_b"), "id_a", "id_b")
        .select($"id".as("ccid"), $"component")
      lpa.join(cc, $"member" === $"ccid")
        .select($"member", $"label", $"component")
    }
  )
}
