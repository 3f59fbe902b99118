package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.HopDistance
import graft.sources.Tables

/** Hundred-twenty-fifth coverage wave: incremental shortest-path
  * maintenance — the q307 (incremental CC) production shape on the
  * graph profile's DISTANCE metric.
  *
  *  - q328: yesterday's standing (node, dist) table + today's delta
  *    edges → today's exact hop distances, WITHOUT re-running BFS over
  *    the corpus. Soundness is the insert-only monotonicity argument:
  *    new edges only shorten distances, so the standing table is a
  *    pointwise upper bound and warm-started min-plus relaxation
  *    (seeds pinned at 0) converges to the exact new fixed point —
  *    Bellman–Ford from an admissible estimate. Efficiency is the
  *    frontier discipline: round 0 relaxes across the DELTA edges
  *    only; each later round probes the staged full-edge leaf with
  *    the FRONTIER (nodes improved last round) — a delta-bounded
  *    sliver, so per-round work scales with the affected region.
  *    Untouched nodes' rows pass through bit-identical (spec-pinned).
  *
  *    Construction mirrors q307: orders split by key (a tenth are the
  *    "new day's trades"); standing distances = batch BFS over the
  *    corpus-only trade graph; delta edges = trading pairs that the
  *    delta orders introduce. The oracle is q312's full-graph BFS CTE
  *    stack VERBATIM over corpus ∪ delta — delta == batch is itself
  *    in-gate, one hash. (The same (customer, supplier) pair can
  *    appear in both corpus and delta orders; re-inserting an existing
  *    edge is a no-op improvement, which the relaxation absorbs.)
  */
object Extras125 {

  val all: Seq[Qry] = Seq(

    Qry("q328_incremental_hop_distance", Extras115.BfsOracle) {
      (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      // ONE orders⋈lineitem pass builds the corpus, delta AND full
      // edge sets: grouped by (c, s, isDelta) and staged, all three
      // edge lists are slices of the staged pair sliver — the old
      // shape re-ran the corpus join+groupBy three times (corpus
      // slice, delta slice, Extras115.tradeEdges for the full graph).
      // The q357 single-pass device (r14), applied to the BFS epoch.
      val b = graft.operators.Staging.stage(
        tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey".cast(LongType).as("c"),
            $"l_suppkey".cast(LongType).as("s"),
            ($"o_orderkey" % 10 === 0).as("isDelta"))
          .agg(count(lit(1)).as("w")),
        eager = true)
      def edgesOf(slice: org.apache.spark.sql.DataFrame) =
        slice.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
          .unionByName(slice.select(($"s" * 2 + 1).as("src"),
            ($"c" * 2).as("dst")))
      val corpus = edgesOf(b.filter(!$"isDelta"))
      val delta = edgesOf(b.filter($"isDelta"))
      // full graph = distinct trading pairs across both slices (a pair
      // ordered in both slices appears once, exactly tradeEdges' set)
      val full = edgesOf(b.select($"c", $"s").distinct())
      val seeds = spark.range(1, Extras115.SeedMax + 1)
        .select(($"id" * 2 + 1).as("sid"))
      val standing = HopDistance.run(corpus, "src", "dst", seeds, "sid")
      // seeds passed through: a seed supplier whose orders all landed
      // in the delta split would otherwise enter as a new node with
      // NULL distance and settle WRONG via other seeds (r12 advisory);
      // on this fixture every seed has corpus orders, so the pin is a
      // behavioral no-op — same hash — but the operator contract is
      // airtight for arbitrary splits
      HopDistance.incremental(standing, full, delta, "src", "dst",
          seeds = Some(seeds), seedCol = "sid")
        .select(($"id" % 2).as("kind"), expr("id DIV 2").as("key"),
          $"dist")
    }
  )
}
