package graft

import org.apache.spark.sql.functions._

import graft.operators.{Coreness, HopDistance}

/** Core-number decomposition (iterated H-indices) and multi-source BFS
  * hop distance — hand-derived graphs where the core numbers / BFS
  * distances are known in closed form.
  */
class CorenessSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) = {
    val df = pairs.toDF("src", "dst")
    df.unionByName(df.select($"dst".as("src"), $"src".as("dst")))
  }

  private def coreMap(pairs: (Long, Long)*): Map[Long, Long] =
    Coreness.run(sym(pairs: _*), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph is 1-core everywhere") {
    assert(coreMap(1L -> 2L, 2L -> 3L, 3L -> 4L) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("cycle is 2-core; pendant tail peels to 1") {
    // triangle 1-2-3 plus tail 3-4-5: triangle = core 2, tail = core 1
    assert(coreMap(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("K4 is 3-core; bridge node between two K4s keeps its own core") {
    val k4a = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L)
    val k4b = Seq(5L -> 6L, 5L -> 7L, 5L -> 8L, 6L -> 7L, 6L -> 8L,
      7L -> 8L)
    // node 9 bridges the cliques: degree 2 but core 2 is impossible —
    // removing all degree<2 nodes removes 9 first (its neighbors are in
    // cores, but 9 itself has only 2 edges and survives the k=2 peel;
    // H-index check: neighbors hold 3,3 → H=2, then min(deg,2)=2)
    val m = coreMap(k4a ++ k4b ++ Seq(9L -> 1L, 9L -> 5L): _*)
    (1L to 8L).foreach(id => assert(m(id) === 3L, s"node $id"))
    assert(m(9L) === 2L)
  }

  test("parallel edges count once toward degree") {
    val e = Seq(1L -> 2L, 1L -> 2L, 2L -> 1L).toDF("src", "dst")
    val m = Coreness.run(
      e.unionByName(e.select($"dst".as("src"), $"src".as("dst"))),
      "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 1L))
  }

  private def distMap(seeds: Seq[Long], pairs: (Long, Long)*)
      : Map[Long, Option[Long]] =
    HopDistance.run(sym(pairs: _*), "src", "dst",
        seeds.toDF("sid"), "sid")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("bfs on a path: distances count hops from the seed") {
    assert(distMap(Seq(1L), 1L -> 2L, 2L -> 3L, 3L -> 4L) ===
      Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
        4L -> Some(3L)))
  }

  test("multi-source takes the nearest seed; other component is NULL") {
    val m = distMap(Seq(1L, 6L),
      1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, // path 1..6
      10L -> 11L) // disconnected pair, no seed
    assert(m(3L) === Some(2L)) // 2 from node 1, 3 from node 6
    assert(m(4L) === Some(2L)) // nearer to seed 6
    assert(m(10L) === None)
    assert(m(11L) === None)
  }

  test("seed ids absent from the graph are ignored") {
    val m = distMap(Seq(99L, 1L), 1L -> 2L)
    assert(m === Map(1L -> Some(0L), 2L -> Some(1L)))
  }
}
