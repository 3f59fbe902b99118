package graft

import graft.operators.{DagLevels, Staging}

/** Longest-path DAG levels (DagLevels.run): hand graphs + the loud
  * cycle failure. */
class DagLevelsSpec extends SparkTestBase {
  import spark.implicits._

  private def levels(pairs: Seq[(Long, Long)],
      maxIterations: Int = 100): Map[Long, Long] = {
    val out = DagLevels.run(pairs.toDF("src", "dst"), "src", "dst",
      maxIterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Staging.sweep(spark)
    out
  }

  test("diamond takes the LONGEST path, not the shortest") {
    // 1->2->3->4 and 1->4: lvl(4) = 3 via the long arm
    val out = levels(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L))
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("independent sources sit at level 0; merge takes the max") {
    // 5->7, 6->7->8; also isolated arc 10->11
    val out = levels(Seq(5L -> 7L, 6L -> 7L, 7L -> 8L, 10L -> 11L))
    assert(out === Map(5L -> 0L, 6L -> 0L, 7L -> 1L, 8L -> 2L,
      10L -> 0L, 11L -> 1L))
  }

  test("a cycle fails loudly — levels are undefined, never wrong") {
    assertThrows[IllegalStateException] {
      levels(Seq(1L -> 2L, 2L -> 1L), maxIterations = 10)
    }
  }
}
