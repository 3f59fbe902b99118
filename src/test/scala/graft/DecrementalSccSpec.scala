package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.coalesce

import graft.operators.{Scc, Staging}

/** Semantics of Scc.decremental (the deletion-tolerant maintainer
  * behind q365): affected-component rebuild must equal full batch SCC
  * over (edges ∖ deletions) seeded with the original node set —
  * component SPLITS, cross-component no-ops (a cross arc lies on no
  * cycle), redundant intra-component deletions, and untouched
  * components passing through bit-identical.
  */
class DecrementalSccSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*): DataFrame =
    es.toSeq.toDF("src", "dst")

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** decremental == batch SCC over survivors, original nodes seeded
    * (q365's oracle shape). */
  private def check(corpus: DataFrame, deleted: DataFrame): Unit = {
    val standing = Scc.run(corpus, "src", "dst")
    val out = Scc.decremental(standing, corpus, deleted, "src", "dst")
    val kept = corpus.join(
      deleted.select($"src".as("__ds"), $"dst".as("__dd")),
      $"src" === $"__ds" && $"dst" === $"__dd", "left_anti")
    val batchLab = Scc.run(kept, "src", "dst")
      .select($"id".as("bid"), $"scc".as("bscc"))
    val nodes = corpus.select($"src".as("id"))
      .unionByName(corpus.select($"dst".as("id"))).distinct()
    val batch = nodes.join(batchLab, $"id" === $"bid", "left_outer")
      .select($"id", coalesce($"bscc", $"id").as("scc"))
    assert(asMap(out) == asMap(batch))
    Staging.sweep(spark)
  }

  test("deleting one arc of a 2-cycle splits it into two singletons") {
    val corpus = edges((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    check(corpus, edges((2L, 1L)))
    val standing = Scc.run(corpus, "src", "dst")
    val out = Scc.decremental(standing, corpus, edges((2L, 1L)),
      "src", "dst")
    val m = asMap(out)
    assert(m(1L) == 1L && m(2L) == 2L)
    // the 10-component is untouched: labels pass through identically
    assert(m(10L) == 10L && m(11L) == 10L)
    Staging.sweep(spark)
  }

  test("deleting a chord of a cycle is a no-op (cycle survives)") {
    // 1→2→3→1 plus chord 1→3: SCC {1,2,3} persists without the chord
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    check(corpus, edges((1L, 3L)))
    val standing = Scc.run(corpus, "src", "dst")
    val m = asMap(Scc.decremental(standing, corpus, edges((1L, 3L)),
      "src", "dst"))
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    Staging.sweep(spark)
  }

  test("deleting a cross-component arc never changes membership") {
    // A = {1,2}, B = {3,4}, bridge 2→3 deleted: labels identical
    val corpus = edges((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L))
    check(corpus, edges((2L, 3L)))
    val standing = Scc.run(corpus, "src", "dst")
    val out = Scc.decremental(standing, corpus, edges((2L, 3L)),
      "src", "dst")
    assert(asMap(out) == asMap(standing))
    Staging.sweep(spark)
  }

  test("deleting a cycle arc shatters the component into singletons") {
    // 4-cycle 1→2→3→4→1: removing 3→4 leaves a path — all singletons
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    check(corpus, edges((3L, 4L)))
    val standing = Scc.run(corpus, "src", "dst")
    val m = asMap(Scc.decremental(standing, corpus, edges((3L, 4L)),
      "src", "dst"))
    assert(Seq(1L, 2L, 3L, 4L).forall(n => m(n) == n))
    Staging.sweep(spark)
  }

  test("partial split: a figure-eight loses one lobe") {
    // two cycles sharing node 3: 1→2→3→1 and 3→4→5→3; deleting 4→5
    // keeps {1,2,3} strongly connected, 4 and 5 fall out
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L))
    check(corpus, edges((4L, 5L)))
    val standing = Scc.run(corpus, "src", "dst")
    val m = asMap(Scc.decremental(standing, corpus, edges((4L, 5L)),
      "src", "dst"))
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    assert(m(4L) == 4L && m(5L) == 5L)
    Staging.sweep(spark)
  }

  private def asArcs(df: DataFrame): Map[(Long, Long), Long] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** decrementalState == (batch labels, condensationSupport over the
    * survivors under those labels) — q367's oracle shape. */
  private def checkState(corpus: DataFrame, deleted: DataFrame): Unit = {
    val standing = Scc.run(corpus, "src", "dst")
    val condSup = Scc.condensationSupport(corpus, standing,
      "src", "dst")
    val (lab, cond) = Scc.decrementalState(standing, condSup, corpus,
      deleted, "src", "dst")
    val kept = corpus.join(
      deleted.select($"src".as("__ds"), $"dst".as("__dd")),
      $"src" === $"__ds" && $"dst" === $"__dd", "left_anti")
    val batch = Scc.decremental(standing, corpus, deleted, "src", "dst")
    assert(asMap(lab) == asMap(batch))
    val expect = Scc.condensationSupport(kept,
      lab.select($"id", $"scc"), "src", "dst")
    assert(asArcs(cond) == asArcs(expect))
    Staging.sweep(spark)
  }

  test("state: a split exposes new condensation arcs with supports") {
    // figure-eight: cycles 1→2→3→1 and 3→4→5→3 share node 3 (one
    // SCC); deleting 4→5 leaves {1,2,3} + singletons 4, 5 with arcs
    // 3→4 and 5→3 each carrying support 1
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L))
    checkState(corpus, edges((4L, 5L)))
    val standing = Scc.run(corpus, "src", "dst")
    val condSup = Scc.condensationSupport(corpus, standing,
      "src", "dst")
    val (_, cond) = Scc.decrementalState(standing, condSup, corpus,
      edges((4L, 5L)), "src", "dst")
    assert(asArcs(cond) == Map((1L, 4L) -> 1L, (5L, 1L) -> 1L))
    Staging.sweep(spark)
  }

  test("state: cross-component deletion decrements support in place") {
    // A = {1,2}, B = {3,4}; two A→B arcs (2→3, 1→4) → support 2;
    // deleting 2→3 leaves support 1 with no membership change
    val corpus = edges((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L),
      (2L, 3L), (1L, 4L))
    checkState(corpus, edges((2L, 3L)))
    val standing = Scc.run(corpus, "src", "dst")
    val condSup = Scc.condensationSupport(corpus, standing,
      "src", "dst")
    val (_, cond) = Scc.decrementalState(standing, condSup, corpus,
      edges((2L, 3L)), "src", "dst")
    assert(asArcs(cond) == Map((1L, 3L) -> 1L))
    Staging.sweep(spark)
  }

  test("state: support reaching zero drops the arc entirely") {
    val corpus = edges((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L),
      (2L, 3L), (1L, 4L))
    checkState(corpus, edges((2L, 3L), (1L, 4L)))
    val standing = Scc.run(corpus, "src", "dst")
    val condSup = Scc.condensationSupport(corpus, standing,
      "src", "dst")
    val (_, cond) = Scc.decrementalState(standing, condSup, corpus,
      edges((2L, 3L), (1L, 4L)), "src", "dst")
    assert(asArcs(cond).isEmpty)
    Staging.sweep(spark)
  }

  test("state: split with an incident cross arc recomputes both sides") {
    // A = 4-cycle {1,2,3,4} with arc 2→10 into singleton-cycle
    // B = {10,11}; deleting 3→4 shatters A; the surviving cross arc
    // 2→10 must re-key to the new singleton component 2
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L), (11L, 10L), (2L, 10L))
    checkState(corpus, edges((3L, 4L)))
    Staging.sweep(spark)
  }

  test("epoch handoff: decrementalState's pair feeds incremental and " +
      "the composition equals batch over the net edge set") {
    // corpus: 4-cycle {1,2,3,4} + 2-cycle {10,11}; epoch deletes 3→4
    // (shatters the 4-cycle) and inserts 4→1-closing arc 2→1 plus a
    // bridge-and-back 11→1, 1→11 (merges {10,11} with {1,2})
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L), (11L, 10L))
    val del = edges((3L, 4L))
    val ins = edges((2L, 1L), (11L, 1L), (1L, 11L))
    val standing = Scc.run(corpus, "src", "dst")
    val condSup = Scc.condensationSupport(corpus, standing,
      "src", "dst")
    val (lab1, cond1) = Scc.decrementalState(standing, condSup, corpus,
      del, "src", "dst")
    val lab1s = Staging.stage(lab1, eager = true)
    val cond1s = Staging.stage(cond1, eager = true)
    val (labels, _) = Scc.incremental(lab1s,
      cond1s.select($"csrc", $"cdst"), ins, "src", "dst")
    val net = corpus.join(del.select($"src".as("__ds"),
        $"dst".as("__dd")),
      $"src" === $"__ds" && $"dst" === $"__dd", "left_anti")
      .unionByName(ins)
    val batch = Scc.run(net, "src", "dst")
    assert(asMap(labels) == asMap(batch))
    // {1,2} close via 2→1; {10,11} merges in via 11→1/1→11; 3, 4
    // stay singletons (3's only cycle died with the deletion)
    val m = asMap(labels)
    assert(m(1L) == 1L && m(2L) == 1L && m(10L) == 1L && m(11L) == 1L)
    assert(m(3L) == 3L && m(4L) == 4L)
    Staging.sweep(spark)
  }

  test("empty deletion set: every label passes through bit-identical") {
    val corpus = edges((1L, 2L), (2L, 1L), (5L, 6L))
    val standing = Scc.run(corpus, "src", "dst")
    val out = Scc.decremental(standing, corpus,
      edges().limit(0), "src", "dst")
    assert(asMap(out) == asMap(standing))
    Staging.sweep(spark)
  }
}
