package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Pins edge semantics added by the hardening pass. */
class EdgeSemanticsSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join never matches NULL keys (equi-join semantics)") {
    val left = Seq((Some(1L), 100L, "has-key"), (None, 100L, "null-key"))
      .toDF("k", "t", "lv")
    val right = Seq((Some(1L), 50L, "r1"), (None, 40L, "r-null"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.backward(left, right,
        keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
        carry = Seq("rv" -> "rv"))
      .collect().map(r => (r.getString(2), r.getString(3))).toMap
    assert(out("has-key") == "r1")
    assert(out("null-key") == null) // NULL never equals NULL
  }

  test("as-of join ignores right rows with NULL time") {
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, Option.empty[Long], "null-time"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.backward(left, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv")).head()
    assert(out.getString(3) == null) // NULL <= t is unknown → no match
  }

  test("update output mode emits only changed aggregate rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = input.toDS().toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("s"))
      .writeStream.outputMode("update")
      .format("memory").queryName("upd_test").start()
    try {
      input.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      input.addData((1L, 5L)); q.processAllAvailable() // only k=1 changes
      val rows = spark.table("upd_test")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // batch1 emits (1,10),(2,20); batch2 emits ONLY (1,15) — k=2
      // untouched rows are not re-emitted in update mode
      assert(rows.sorted.toSeq == Seq((1L, 10L), (1L, 15L), (2L, 20L)))
    } finally q.stop()
  }

  test("cached dataframe plans as InMemoryTableScan and stays correct") {
    val df = spark.range(0, 10000).select($"id", ($"id" % 13).as("k"))
    df.cache()
    try {
      val agg = df.groupBy($"k").count()
      agg.collect() // materialize the cache
      assert(agg.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
      assert(agg.count() == 13)
    } finally df.unpersist()
  }
}
