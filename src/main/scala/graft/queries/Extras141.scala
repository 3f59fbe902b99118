package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Scc
import graft.sources.Tables

/** Hundred-forty-first coverage wave: incremental SCC maintenance —
  * the q307/q328 production shape (standing state + today's delta,
  * never a corpus rebuild) on DIRECTED reachability.
  *
  *  - q357: yesterday's standing state is the PAIR the directed case
  *    needs — (labels, condensation edges) — because a new arc u→v
  *    merges every old component on a v⇝…⇝u path THROUGH THE OLD
  *    GRAPH, which labels alone cannot see (the fundamental asymmetry
  *    vs undirected CC, where labels are the whole reachability
  *    story). Contracting SCCs preserves reachability, so the new
  *    components are exactly the SCCs of condensation ∪
  *    quotient(delta) — a graph bounded by #components + delta —
  *    and each merged group's label collapses to the global min
  *    member id, [[graft.operators.Scc.run]]'s invariant. The
  *    corpus/delta split is q328's (orders by key mod 10); corpus ∪
  *    delta edges reconstruct the full trade-flow graph exactly, so
  *    the query gates against q349's oracle VERBATIM — delta == batch
  *    is ONE hash. Insert-only, like CC.incremental (deletions can
  *    split an SCC, which requires rebuilding the affected component).
  *
  * Scale shape: the standing label table streams once through a
  * broadcast endpoint probe and once through the broadcast remap —
  * never shuffled or self-joined; the iterated loop runs on the
  * condensation-sized quotient (3 peels would be a catastrophe-free
  * worst case here: the trade condensation is 2 levels at every
  * tested SF).
  */
object Extras141 {

  val all: Seq[Qry] = Seq(

    Qry("q357_incremental_scc", Extras136.SccOracle) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val corpus = Extras136.tradeFlowEdges(
        tt.orders.filter($"o_orderkey" % 10 =!= 0), tt.lineitem)
      val delta = Extras136.tradeFlowEdges(
        tt.orders.filter($"o_orderkey" % 10 === 0), tt.lineitem)
      val standing = Scc.run(corpus, "src", "dst")
      val condE = Scc.condensationEdges(corpus, standing, "src", "dst")
      val (labels, _) =
        Scc.incremental(standing, condE, delta, "src", "dst")
      Extras136.sccOut(labels)
    }
  )
}
