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

  test("re-inserting an existing edge is a no-op (one empty round)") {
    val corpus = Seq(1L -> 2L, 2L -> 3L)
    val standing = HopDistance.run(sym(corpus), "src", "dst",
      Seq(1L).toDF("sid"), "sid")
    val out = dists(HopDistance.incremental(standing,
      sym(corpus), sym(Seq(1L -> 2L)), "src", "dst"))
    assert(out === Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L)))
  }
}
