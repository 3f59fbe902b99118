package graft

import org.apache.spark.sql.functions._

import graft.operators.HopDistance

/** Incremental hop-distance maintenance (HopDistance.incremental) —
  * warm-started min-plus relaxation with the frontier discipline,
  * pinned on hand graphs: shortcut propagation, untouched passthrough,
  * delta-only new nodes, and no-op re-insertions.
  */
class IncrementalBfsSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) = {
    val df = pairs.toDF("src", "dst")
    df.unionByName(df.select($"dst".as("src"), $"src".as("dst")))
  }

  private def dists(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Option[Long]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("delta shortcut shortens and propagates; untouched rows pass") {
    // corpus: path 1-2-3-4-5-6 seeded at 1; delta: edge 1-5
    val corpus = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val delta = Seq(1L -> 5L)
    val standing = HopDistance.run(sym(corpus), "src", "dst",
      Seq(1L).toDF("sid"), "sid")
    val out = dists(HopDistance.incremental(standing,
      sym(corpus ++ delta), sym(delta), "src", "dst"))
    // 5 improves 4 -> 1, 6 improves 5 -> 2 (via the frontier), 4 stays
    // min(3, 1+1=2)... 4 improves too via the new 5
    assert(out === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(2L), 5L -> Some(1L), 6L -> Some(2L)))
    // matches a from-scratch run on the union
    val batch = dists(HopDistance.run(sym(corpus ++ delta), "src", "dst",
      Seq(1L).toDF("sid"), "sid"))
    assert(out === batch)
  }

  test("new nodes enter via delta; unreachable stays NULL") {
    val corpus = Seq(1L -> 2L)
    val delta = Seq(2L -> 7L, 10L -> 11L) // 7 attaches; 10-11 floats
    val standing = HopDistance.run(sym(corpus), "src", "dst",
      Seq(1L).toDF("sid"), "sid")
    val out = dists(HopDistance.incremental(standing,
      sym(corpus ++ delta), sym(delta), "src", "dst"))
    assert(out(7L) === Some(2L))
    assert(out(10L) === None); assert(out(11L) === None)
  }

  test("seed arriving IN the delta pins to 0 and propagates through " +
      "corpus edges (r12 advisory)") {
    // corpus: 1-2-3 seeded at {1}; delta: edge 9-3 where 9 is ALSO a
    // seed whose first edge arrives in the delta. Without the seeds
    // param, 9 enters as a new node with NULL distance and settles to
    // a WRONG dist 3 (via seed 1); with it, 9 pins to 0 and IMPROVES
    // node 3 from 2 to 1 — propagation through corpus edges requires
    // the seed to enter the initial frontier, not just the node set.
    val corpus = Seq(1L -> 2L, 2L -> 3L)
    val delta = Seq(9L -> 3L)
    val standing = HopDistance.run(sym(corpus), "src", "dst",
      Seq(1L).toDF("sid"), "sid")
    val out = dists(HopDistance.incremental(standing,
      sym(corpus ++ delta), sym(delta), "src", "dst",
      seeds = Some(Seq(1L, 9L).toDF("sid")), seedCol = "sid"))
    val batch = dists(HopDistance.run(sym(corpus ++ delta), "src", "dst",
      Seq(1L, 9L).toDF("sid"), "sid"))
    assert(out === batch)
    assert(out === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(1L),
      9L -> Some(0L)))
    // and: seeds param with every seed already standing at 0 is a
    // behavioral no-op (the q328 call-site situation)
    val noop = dists(HopDistance.incremental(standing,
      sym(corpus), sym(Seq(1L -> 2L)), "src", "dst",
      seeds = Some(Seq(1L).toDF("sid")), seedCol = "sid"))
    assert(noop === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L)))
  }

  test("re-inserting an existing edge is a no-op (one empty round)") {
    val corpus = Seq(1L -> 2L, 2L -> 3L)
    val standing = HopDistance.run(sym(corpus), "src", "dst",
      Seq(1L).toDF("sid"), "sid")
    val out = dists(HopDistance.incremental(standing,
      sym(corpus), sym(Seq(1L -> 2L)), "src", "dst"))
    assert(out === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L)))
  }
}
