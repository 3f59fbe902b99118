package graft

import org.apache.spark.sql.DataFrame

import graft.operators.ConnectedComponents

/** Semantics of ConnectedComponents.incremental (the delta-CC operator
  * behind q307): quotient-graph min-label over standing labels + delta
  * edges must equal full batch CC over the union edge set, with
  * untouched components' labels passing through bit-identical — and the
  * operator never sees the corpus edges at all (its signature is the
  * proof: standing labels + delta edges only).
  */
class IncrementalCcSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*): DataFrame =
    es.toSeq.toDF("a", "b")

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("delta == batch: merges, chains, new nodes, internal no-ops") {
    val corpus = edges((10L, 11L), (12L, 13L), (20L, 21L), (40L, 41L))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    // (11,12): merges components 10 and 12 -> min 10
    // (5,20): NEW node with a smaller id rewrites component 20 -> 5
    // (21,20): internal to component 20 — a no-op
    // (30,31): two new nodes forming a fresh component -> 30
    // (13,30): chains the new pair into the 10/12 merge -> all min 10
    val delta = edges((11L, 12L), (5L, 20L), (21L, 20L), (30L, 31L),
      (13L, 30L))
    val inc = ConnectedComponents.incremental(standing, delta, "a", "b")
    val batch = ConnectedComponents.minLabel(
      corpus.unionByName(delta), "a", "b")
    assert(asMap(inc) == asMap(batch))
    // the interesting minima, spelled out
    val m = asMap(inc)
    assert(Seq(10L, 11L, 12L, 13L, 30L, 31L).forall(m(_) == 10L))
    assert(Seq(5L, 20L, 21L).forall(m(_) == 5L))
    assert(m(40L) == 40L && m(41L) == 40L)
  }

  test("untouched components pass through bit-identical") {
    val corpus = edges((1L, 2L), (7L, 8L), (7L, 9L))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val delta = edges((100L, 101L)) // touches nothing standing
    val out = ConnectedComponents.incremental(standing, delta, "a", "b")
    val untouched = out.filter($"id" < 100L)
    assert(asMap(untouched) == asMap(standing))
    assert(asMap(out.filter($"id" >= 100L)) ==
      Map(100L -> 100L, 101L -> 100L))
  }

  test("all-internal delta (empty quotient graph) is the identity") {
    val corpus = edges((1L, 2L), (2L, 3L))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val delta = edges((1L, 3L), (3L, 2L)) // both inside component 1
    val out = ConnectedComponents.incremental(standing, delta, "a", "b")
    assert(asMap(out) == asMap(standing))
  }

  test("delta-only growth: standing may be empty") {
    val standing = Seq.empty[(Long, Long)].toDF("id", "component")
    val delta = edges((3L, 4L), (4L, 5L))
    val out = ConnectedComponents.incremental(standing, delta, "a", "b")
    assert(asMap(out) == Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }
}
