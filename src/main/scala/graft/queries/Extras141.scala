package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Scc, Staging}
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
      // ONE orders⋈lineitem pass builds both slices: grouping by
      // (c, s, isDelta) then slicing on the flag produces exactly the
      // per-slice (c, s, max-ret) pairs the two separate
      // tradeFlowEdges calls produced — which, with the condensation
      // pass below also re-reading `corpus`, re-executed the corpus
      // join+groupBy pipeline three times. Staged once; every
      // consumer reads the staged pair table. Not released in-query
      // (the returned plan reads it lazily); the harness's per-query
      // Staging.sweep owns the release.
      val b = Staging.stage(
        tt.orders
          .join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey".cast(LongType).as("c"),
            $"l_suppkey".cast(LongType).as("s"),
            ($"o_orderkey" % 10 === 0).as("isDelta"))
          .agg(max(when($"l_returnflag" === "R", 1).otherwise(0))
            .as("ret")),
        eager = true)
      def edgesOf(slice: org.apache.spark.sql.DataFrame) =
        slice.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
          .unionByName(slice.filter($"ret" === 1)
            .select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst")))
      val corpus = edgesOf(b.filter(!$"isDelta"))
      val delta = edgesOf(b.filter($"isDelta"))
      val standing = Scc.run(corpus, "src", "dst", edgesClean = true)
      val condE = Scc.condensationEdges(corpus, standing, "src", "dst")
      val (labels, _) =
        Scc.incremental(standing, condE, delta, "src", "dst")
      Extras136.sccOut(labels)
    }
  )
}
