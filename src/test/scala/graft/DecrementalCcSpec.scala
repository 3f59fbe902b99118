package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, greatest, least}

import graft.operators.{ConnectedComponents, Staging}

/** Semantics of ConnectedComponents.decremental (the deletion-tolerant
  * maintainer behind q361): affected-component rebuild must equal full
  * batch CC over (edges ∖ deletions) — component SPLITS, orphaned
  * singletons, and untouched components passing through bit-identical.
  */
class DecrementalCcSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*): DataFrame =
    es.toSeq.toDF("a", "b")

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(corpus: DataFrame, deleted: DataFrame): Unit = {
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val out = ConnectedComponents.decremental(standing, corpus, deleted,
      "a", "b")
    // batch oracle over the surviving edges, seeded with EVERY original
    // node (orphans keep a singleton row) — q361's oracle shape
    val kept = corpus
      .select(least($"a", $"b").as("ka"), greatest($"a", $"b").as("kb"))
      .join(deleted.select(least($"a", $"b").as("da"),
          greatest($"a", $"b").as("db")),
        $"ka" === $"da" && $"kb" === $"db", "left_anti")
    val batchLab = ConnectedComponents.minLabel(kept, "ka", "kb")
      .select($"id".as("bid"), $"component".as("bc"))
    val nodes = corpus.select($"a".as("id"))
      .unionByName(corpus.select($"b".as("id"))).distinct()
    val batch = nodes.join(batchLab, $"id" === $"bid", "left_outer")
      .select($"id", coalesce($"bc", $"id").as("component"))
    assert(asMap(out) == asMap(batch))
    Staging.sweep(spark)
  }

  test("deleting a bridge splits the component into two") {
    // path 1-2-3-4: deleting (2,3) splits {1,2,3,4} -> {1,2} {3,4}
    val corpus = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    check(corpus, edges((2L, 3L)))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val m = asMap(ConnectedComponents.decremental(
      standing, corpus, edges((2L, 3L)), "a", "b"))
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 3L && m(4L) == 3L)
    assert(m(10L) == 10L && m(11L) == 10L)
    Staging.sweep(spark)
  }

  test("orphaned endpoints become singletons; untouched pass through") {
    // deleting the only edge of {5,6} orphans both
    val corpus = edges((5L, 6L), (20L, 21L), (21L, 22L))
    check(corpus, edges((5L, 6L)))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val out = ConnectedComponents.decremental(
      standing, corpus, edges((5L, 6L)), "a", "b")
    val m = asMap(out)
    assert(m(5L) == 5L && m(6L) == 6L)
    // the 20-component was untouched: labels identical to standing
    assert(asMap(out.filter($"id" >= 20L)) ==
      asMap(standing.filter($"id" >= 20L)))
    Staging.sweep(spark)
  }

  test("redundant edge deletion is a no-op (cycle stays connected)") {
    // triangle 1-2-3: deleting (1,2) leaves it connected via 3
    val corpus = edges((1L, 2L), (2L, 3L), (1L, 3L))
    check(corpus, edges((1L, 2L)))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val m = asMap(ConnectedComponents.decremental(
      standing, corpus, edges((1L, 2L)), "a", "b"))
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    Staging.sweep(spark)
  }

  test("multi-way split with reversed-orientation deletions") {
    // star around 50: deleting two spokes (given reversed) leaves
    // 51,52 orphaned, 50-53 intact
    val corpus = edges((50L, 51L), (50L, 52L), (50L, 53L))
    val dels = edges((51L, 50L), (52L, 50L)) // reversed orientation
    check(corpus, dels)
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val m = asMap(ConnectedComponents.decremental(
      standing, corpus, dels, "a", "b"))
    assert(m(51L) == 51L && m(52L) == 52L)
    assert(m(50L) == 50L && m(53L) == 50L)
    Staging.sweep(spark)
  }

  test("empty deletion set: every label passes through bit-identical") {
    val corpus = edges((1L, 2L), (3L, 4L))
    val standing = ConnectedComponents.minLabel(corpus, "a", "b")
    val out = ConnectedComponents.decremental(standing, corpus,
      edges().limit(0), "a", "b")
    assert(asMap(out) == asMap(standing))
    Staging.sweep(spark)
  }
}
