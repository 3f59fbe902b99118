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

  test("zscoreOutliers on a zero-variance group flags nothing (no NaN leak)") {
    // σ = 0 ⇒ z is 0/0 = NaN; NaN > threshold is false, so constant
    // groups must produce zero outliers rather than NaN rows
    val df = (1 to 50).map(i => (i.toLong, "const", 7.5))
      .toDF("id", "k", "v")
    assert(graft.operators.Stats.zscoreOutliers(df, "k", "v", 3.0)
      .count() == 0)
  }

  test("linearFit with constant x yields null slope/r2, n still right") {
    val df = (1 to 20).map(i => (5.0, i.toDouble, 0)).toDF("x", "y", "g")
    val r = graft.operators.Stats.linearFit(df, $"x", $"y", Seq($"g"))
      .head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("cosine of a zero-norm vector is null, not a runtime failure") {
    val z = Array.fill(4)(0.0f)
    val v = Array(1.0f, 0f, 0f, 0f)
    val df = Seq((z, v)).toDF("a", "b").select(
      graft.operators.Vectors.cosine(
        graft.operators.Vectors.dot(
          graft.operators.Vectors.toDouble($"a"),
          graft.operators.Vectors.toDouble($"b")),
        graft.operators.Vectors.norm(graft.operators.Vectors.toDouble($"a")),
        graft.operators.Vectors.norm(graft.operators.Vectors.toDouble($"b")))
        .as("c"))
    assert(df.head().isNullAt(0))
  }

  test("ewma with taps=1 is the identity on the value column") {
    val df = Seq((1L, 1, 2.5), (1L, 2, -3.0)).toDF("k", "t", "v")
    val out = graft.operators.Stats.ewma(df, Seq($"k"), Seq($"t"), "v",
      alpha = 0.5, taps = 1).orderBy($"t")
      .select($"v", $"ewma").collect()
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("charNGramHashes on short and empty strings yields no rows") {
    val df = Seq((1L, ""), (2L, "ab"), (3L, "abc")).toDF("id", "s")
    val out = graft.operators.Dedup.charNGramHashes(df, "id", "s", 3)
    assert(out.select($"id").as[Long].collect().toSeq == Seq(3L))
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
