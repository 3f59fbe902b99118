package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Scc, Staging, TextOps}
import graft.sources.Tables

/** Hundred-forty-fourth coverage wave: deletion-tolerant DIRECTED
  * graph maintenance — the decremental half of the SCC lifecycle,
  * finishing what q361 did for undirected components (r13 verdict ask
  * #4's "SCC if it fits" rider).
  *
  *  - q365: [[graft.operators.Scc.decremental]] over the directed
  *    trade graph. The deletion fixture strips EVERY return back-edge
  *    of a deterministic ~quarter of suppliers (supplier-keyed hash —
  *    the shape a real pipeline sees when a source's provenance is
  *    revoked wholesale): a supplier whose back-edges all vanish sits
  *    on no cycle any more, so the giant order/return SCC genuinely
  *    SPLITS — the case the insert-only incremental (q357) documents
  *    as needing a rebuild. The operator rebuilds ONLY the touched
  *    components (those owning a deleted intra-component arc):
  *    cross-component arcs lie on no cycle (a cycle's nodes are
  *    mutually reachable, hence one SCC), so their deletion can never
  *    change membership — and deletion never merges (reachability
  *    only shrinks), so every touched component rebuilds
  *    independently on its own induced surviving edges while
  *    untouched labels pass through bit-identical.
  *
  *    Oracle: q349's unrolled FW-BW peeling replayed over the
  *    SURVIVING edge set with the node universe seeded from the
  *    PRE-deletion graph ([[Extras136.sccOracleCtesOver]] — nodes
  *    stripped of every edge still assign as singletons in peel 1),
  *    so decremental == batch-over-survivors is one hash: q361's
  *    proof shape on directed reachability. The unroll-bound sentinel
  *    guards stay active per (peel, direction).
  *
  * Scale shape: touched components resolve through one broadcast
  * probe of the delta; the corpus edge leaf streams ONCE through the
  * directed anti-join + label probes; the rebuild runs on the induced
  * subgraph only (delta-component-bounded in production; the gate's
  * giant-SCC touch is gate construction, the q357 adjudication); the
  * splice is an anti-probe passthrough plus a left-outer singleton
  * fallback — never a second corpus shuffle.
  */
object Extras144 {

  /** Supplier-hash deletion bound: ~1/4 of suppliers lose every
    * return back-edge (whole-source revocation, q361's DelFrac
    * convention keyed by supplier rather than edge so the deletion
    * actually splits the giant SCC instead of thinning it). */
  private val DelFrac = 4L

  private val DelPredSql =
    s"""src % 2 = 1 AND ${TextOps.oracleHashSql(
        "'sccdel:' || CAST(src // 2 AS VARCHAR)")}
       |      < ${TextOps.P / DelFrac}""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q365_decremental_scc", {
        val header =
          s"""b AS MATERIALIZED (SELECT o_custkey AS c, l_suppkey AS s,
             |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2),
             |ea AS MATERIALIZED (SELECT CAST(2 * c AS BIGINT) AS src,
             |    CAST(2 * s + 1 AS BIGINT) AS dst FROM b
             |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
             |    CAST(2 * c AS BIGINT) FROM b WHERE ret = 1),
             |e0 AS MATERIALIZED (SELECT src, dst FROM ea
             |  WHERE NOT ($DelPredSql)),
             |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM (
             |    SELECT src FROM ea UNION ALL SELECT dst FROM ea))""".stripMargin
        // deletion thins the back-edge side, so plain min-label
        // propagation runs deeper than the full graph's 10-round
        // unroll (the sentinel guard caught exactly this at sf0.01)
        // and the condensation grows a level — 4 peels x 18 rounds,
        // still guard-protected at every (peel, direction)
        s"""WITH ${Extras136.sccOracleCtesOver(header,
              peels = 4, inner = 18)}
           |${Extras136.SccFinalSelect}""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val eAll = Staging.stage(
        Extras136.tradeFlowEdges(tt.orders, tt.lineitem), eager = true)
      val standing = Scc.run(eAll, "src", "dst")
      val deleted = eAll.filter($"src" % 2 === 1 &&
        TextOps.hashMod(concat(lit("sccdel:"),
          expr("src DIV 2").cast("string")))
          < lit(TextOps.P / DelFrac))
      val labels = Scc.decremental(standing, eAll, deleted,
        "src", "dst")
      val out = Extras136.sccOut(labels)
      Staging.release(eAll)
      out
    }
  )
}
