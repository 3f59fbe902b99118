package graft

import graft.operators.LabelProp

/** Semantics pins for the fixed-round synchronous self-vote LPA loop
  * (operators.LabelProp; q293 gates it against the unrolled oracle).
  */
class LabelPropSpec extends SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], rounds: Int) =
    LabelProp.run(edges.toDF("src", "dst", "w"), "src", "dst", "w", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def sym(e: Seq[(Long, Long, Long)]) =
    e ++ e.map { case (a, b, w) => (b, a, w) }

  test("pair converges to the min label and does NOT oscillate") {
    // the case that kills neighbors-only synchronous LPA: a pair swaps
    // labels forever. With the self vote both nodes tie self-vs-partner
    // and take the min — and STAY there on every later round.
    val pair = sym(Seq((1L, 2L, 5L)))
    assert(run(pair, 1) == Map(1L -> 1L, 2L -> 1L))
    assert(run(pair, 2) == Map(1L -> 1L, 2L -> 1L),
      "round 2 must be a fixed point, not a swap-back")
  }

  test("triangle converges to the min label in one round") {
    val r = run(sym(Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))), 1)
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"min-label tie-break violated: $r")
  }

  test("synchronous rounds: labels update simultaneously, not in sequence") {
    // path 1-2-3-4 (unweighted), one round. With self votes:
    //   1 ties {1,2} -> 1; 2 ties {1,2,3} -> 1;
    //   3 ties {2,3,4} -> 2; 4 ties {3,4} -> 3.
    // A sequential sweep would leak label 1 to node 3 in round 1.
    val r = run(sym(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))), 1)
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"expected the synchronous round-1 state: $r")
  }

  test("aggregate label mass beats the self vote (switch needs a majority)") {
    // heavy pair {8,9} w=10; node 5 hangs off both (w=4 each) plus a
    // light edge to 1 (w=3). Round 1: 8,9 agree on 8; 5 keeps 5 (all
    // its votes tie at 4, min{5,8,9}=5). Round 2: 5 hears label 8 with
    // mass 8 > self 4 + nothing -> switches. A lone tied neighbor never
    // flips a node, an agreeing pair does.
    val edges = sym(Seq((8L, 9L, 10L), (5L, 8L, 4L), (5L, 9L, 4L),
      (5L, 1L, 3L)))
    val r1 = run(edges, 1)
    assert(r1(5L) == 5L && r1(8L) == 8L && r1(9L) == 8L,
      s"round-1 state wrong: $r1")
    val r2 = run(edges, 2)
    assert(r2(5L) == 8L, s"aggregate mass must beat the self vote: $r2")
  }

  test("a node with no in-edges keeps its label") {
    // directed-only edge 1->2 (NOT symmetrized): node 1 has no in-edge
    // and therefore no self vote either — coalesce keeps its label
    val r = LabelProp.run(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
      "src", "dst", "w", rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L, s"no-in-edge node must keep its label: $r")
    assert(r(2L) == 1L, s"sink ties {1,2} and takes the min: $r")
  }

  test("communities refine connected components (two cliques, one bridge)") {
    // two triangles {1,2,3} and {7,8,9} joined by a light bridge 3-7:
    // one component, but LPA keeps two communities (the bridge's lone
    // weight-1 vote never outweighs the intra-clique mass)
    val edges = sym(Seq(
      (1L, 2L, 3L), (2L, 3L, 3L), (1L, 3L, 3L),
      (7L, 8L, 3L), (8L, 9L, 3L), (7L, 9L, 3L),
      (3L, 7L, 1L)))
    val r = run(edges, 3)
    assert(Set(r(1L), r(2L), r(3L)) == Set(1L), s"left clique: $r")
    assert(Set(r(7L), r(8L), r(9L)) == Set(7L), s"right clique: $r")
  }
}
