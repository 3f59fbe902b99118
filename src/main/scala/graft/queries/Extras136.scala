package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Scc
import graft.sources.Tables

/** Hundred-thirty-sixth coverage wave: strongly connected components
  * of the DIRECTED trade-flow graph — the cycle/ring question the
  * undirected graph tier (CC/coreness/BFS/LPA/triangles) cannot ask.
  *
  *  - q349: [[graft.operators.Scc]] over the directed trade graph:
  *    customer→supplier edge for every trading pair (goods ordered),
  *    supplier→customer BACK-edge only for pairs with a returned item
  *    (l_returnflag = 'R') — the return flow closes cycles, so an SCC
  *    is a maximal set of parties mutually reachable through
  *    order/return chains: the circular-trading / link-farm detector
  *    (on citation or dedup-provenance graphs, the citation-ring
  *    finder). Output: every node's SCC id (the component's minimum
  *    member, decoded to kind/key) plus the component size.
  *
  *    Algorithm (deterministic multi-pivot FW-BW, r12 verdict ask):
  *    per peel round, f = min id reachable forward, b = min id
  *    reachable backward (both integer min-label fixpoints over the
  *    active subgraph); nodes with f = b belong to SCC(f) and peel
  *    off. The oracle unrolls 3 peel rounds × 10 plain propagation
  *    rounds per direction (the Spark side converges adaptively — 2
  *    peels, ≤5 pointer-jumped rounds at both gate SFs; plain
  *    propagation needs a few more, and every round past a fixed
  *    point is provably a no-op because labels are stationary there —
  *    the q262/q311/q312 proof shape). All-integer labels, so the
  *    unrolled CTE stack replays bit-for-bit; shared CTEs are
  *    MATERIALIZED (the q293/q328 DuckDB re-inlining lesson).
  *
  * Scale shape: the staged edge leaf is corpus-sized only in peel 1
  * (peeled components take their edges with them); label tables are
  * stats-carrying one-row-per-node slivers (Catalyst flips broadcast →
  * shuffle at 100×); convergence is the join-free monotone decimal
  * sum; the size tail is one groupBy + equi-join back, never a
  * window partitioned by a possibly-corpus-sized component.
  */
object Extras136 {

  /** Unrolled peel rounds (2 needed at both gate SFs + 1 no-op). */
  private val Peels = 3
  /** Unrolled plain-propagation rounds per direction (≤7 observed
    * without pointer jumping; extras are no-ops). */
  private val Inner = 10

  /** One plain min-label propagation round along `srcC` → adopt labels
    * seen at `dstC` (forward: src→dst; backward: swapped). The
    * explicit CASE mirrors the operator's min fold exactly. */
  private def reachRound(name: String, prev: String, e: String,
      srcC: String, dstC: String): String =
    s"""$name AS MATERIALIZED (SELECT p.node,
       |    CASE WHEN m.ml < p.l THEN m.ml ELSE p.l END AS l
       |  FROM $prev p LEFT JOIN (
       |    SELECT t.$srcC AS node, MIN(pl.l) AS ml
       |    FROM $e t JOIN $prev pl ON pl.node = t.$dstC GROUP BY 1) m
       |  ON m.node = p.node)""".stripMargin

  /** One peel round: restrict edges to the active set, run both
    * directed fixpoints, assign f = b, shrink the active set. */
  private def peelBlock(k: Int, act: String,
      inner: Int = Inner): String = {
    val e = s"e$k"
    def chain(pfx: String, srcC: String, dstC: String): String =
      (1 to inner).map(j =>
        reachRound(s"$pfx${k}_$j", s"$pfx${k}_${j - 1}", e, srcC, dstC))
        .mkString(",\n")
    Seq(
      s"""$e AS MATERIALIZED (SELECT t.src, t.dst FROM e0 t
         |  JOIN $act x ON t.src = x.node
         |  JOIN $act y ON t.dst = y.node)""".stripMargin,
      s"f${k}_0 AS (SELECT node, node AS l FROM $act)",
      chain("f", "src", "dst"),
      s"b${k}_0 AS (SELECT node, node AS l FROM $act)",
      chain("b", "dst", "src"),
      s"""d$k AS MATERIALIZED (SELECT f.node, f.l AS scc
         |  FROM f${k}_$inner f JOIN b${k}_$inner b
         |    ON b.node = f.node AND b.l = f.l)""".stripMargin,
      s"""act$k AS MATERIALIZED (SELECT x.node FROM $act x
         |  LEFT JOIN d$k d ON d.node = x.node
         |  WHERE d.node IS NULL)""".stripMargin).mkString(",\n")
  }

  /** CTE prefix of the SCC oracle (everything up to `sz`), exposed as
    * an explicit composable unit so q358 extends it structurally
    * instead of string surgery on the rendered SQL (r13 advisory).
    *
    * BOUND GUARDS (r13 advisory): the unroll depths (Peels × Inner)
    * are fixture-calibrated, so a deeper SF could silently outrun
    * them and make the ORACLE wrong while the adaptive Spark side is
    * right. `asg` therefore unions in sentinel rows that fire ONLY
    * when a bound was insufficient: one per (peel, direction) when
    * the last inner round was NOT a fixpoint (min-label propagation
    * is monotone, so a stationary round is a proof of convergence),
    * and one when the active set survives the last peel. A violated
    * bound surfaces as an impossible (-1|-2) node row — a loud rows
    * mismatch that implicates the oracle's unroll depth, never the
    * engine. */
  /** [[SccOracleCtes]] generalized over the graph header (round 14):
    * `header` must define CTEs `e0` (the directed edge set the peels
    * run on) and `n0` (the node universe — may be WIDER than e0's
    * endpoints: q365 seeds it with the pre-deletion node set, so nodes
    * stripped of every edge still assign as singletons in peel 1).
    * The unroll bounds stay guarded per (peel, direction) regardless
    * of the parameterization. */
  private[queries] def sccOracleCtesOver(header: String,
      peels: Int = Peels, inner: Int = Inner): String = {
    val peelsSql = (1 to peels)
      .map(k => peelBlock(k, if (k == 1) "n0" else s"act${k - 1}", inner))
      .mkString(",\n")
    val guards = (1 to peels).flatMap { k =>
      Seq("f", "b").map { pfx =>
        s"""SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
           |    WHERE EXISTS (SELECT 1 FROM ${pfx}${k}_$inner a
           |      JOIN ${pfx}${k}_${inner - 1} p
           |      ON p.node = a.node AND p.l <> a.l)""".stripMargin
      }
    } :+ s"""SELECT CAST(-2 AS BIGINT), CAST(-2 AS BIGINT)
            |    WHERE EXISTS (SELECT 1 FROM act$peels)""".stripMargin
    val asg = ((1 to peels).map(k => s"SELECT node, scc FROM d$k")
      ++ guards).mkString("\n  UNION ALL ")
    s"""$header,
       |$peelsSql,
       |asg AS MATERIALIZED ($asg),
       |sz AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS csize
       |       FROM asg GROUP BY 1)""".stripMargin
  }

  /** The directed trade-flow graph header (b → e0 → n0) shared by
    * every SCC oracle over the full graph. */
  private[queries] val TradeGraphCtes: String =
    """b AS MATERIALIZED (SELECT o_custkey AS c, l_suppkey AS s,
      |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |e0 AS MATERIALIZED (SELECT CAST(2 * c AS BIGINT) AS src,
      |    CAST(2 * s + 1 AS BIGINT) AS dst FROM b
      |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
      |    CAST(2 * c AS BIGINT) FROM b WHERE ret = 1),
      |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM (
      |    SELECT src FROM e0 UNION ALL SELECT dst FROM e0))""".stripMargin

  private[queries] val SccOracleCtes: String =
    sccOracleCtesOver(TradeGraphCtes)

  /** Final projection shared by every SCC-labels oracle (decodes the
    * 2k/2k+1 node encoding and joins the size tail). */
  private[queries] val SccFinalSelect: String =
    """SELECT node % 2 AS kind, node // 2 AS key,
      |  scc % 2 AS scc_kind, scc // 2 AS scc_key, sz.csize
      |FROM asg JOIN sz USING (scc)""".stripMargin

  private[queries] val SccOracle: String =
    s"""WITH $SccOracleCtes
       |$SccFinalSelect""".stripMargin

  /** Directed trade-flow edges from an orders subset: c→s for every
    * trading pair, s→c for pairs with a returned item. Shared with the
    * incremental twin q357 (corpus/delta splits union to exactly the
    * full graph, so both gate against [[SccOracle]] verbatim). */
  private[queries] def tradeFlowEdges(
      orders: org.apache.spark.sql.DataFrame,
      lineitem: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import orders.sparkSession.implicits._
    val b = orders
      .join(lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey".cast(LongType).as("c"),
        $"l_suppkey".cast(LongType).as("s"))
      .agg(max(when($"l_returnflag" === "R", 1).otherwise(0)).as("ret"))
    b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
      .unionByName(b.filter($"ret" === 1)
        .select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst")))
  }

  /** Size tail shared with q357: groupBy + equi-join back, never a
    * window partitioned by a possibly-corpus-sized component. */
  private[queries] def sccOut(res: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import res.sparkSession.implicits._
    val sz = res.groupBy($"scc".as("__scc"))
      .agg(count(lit(1)).cast(LongType).as("csize"))
    res.join(sz, $"scc" === $"__scc")
      .select(($"id" % 2).as("kind"), expr("id DIV 2").as("key"),
        ($"scc" % 2).as("scc_kind"), expr("scc DIV 2").as("scc_key"),
        $"csize")
  }

  val all: Seq[Qry] = Seq(

    Qry("q349_scc_trade", SccOracle) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val e = tradeFlowEdges(tt.orders, tt.lineitem)
      // trade edges are distinct with no self-loops by construction
      // (groupBy-derived pairs; src/dst parity differs within each
      // branch and across branches) — skip run()'s renormalization
      val res = Scc.run(e, "src", "dst", edgesClean = true)
      sccOut(res)
    }
  )
}
