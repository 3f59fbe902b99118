package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, NativeAsOf}

/** The native as-of join plan node (AsOfJoinPlan → AsOfJoinExec via the
  * injected strategy) must agree exactly with the union+window
  * formulation, and must plan as one streaming merge over two
  * co-partitioned sorted children. */
class NativeAsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def unionImpl(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.backward(l, r, keys = Seq("k" -> "k"),
      leftTime = "t", rightTime = "t",
      carry = Seq("rv" -> "rv", "rid" -> "rid"),
      rightTieBreak = Seq("rid"))

  private def nativeImpl(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    NativeAsOf.backward(l, r, keys = Seq("k" -> "k"),
      leftTime = "t", rightTime = "t",
      carry = Seq("rv" -> "rv", "rid" -> "rid"),
      rightTieBreak = Seq("rid"))

  test("native as-of equals the union+window formulation (randomized)") {
    val rng = new scala.util.Random(42)
    // dense key space + duplicate timestamps to force tie handling
    val left = Seq.tabulate(400)(i =>
      (rng.nextInt(8).toLong, rng.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "lv")
    val right = Seq.tabulate(300)(i =>
      (rng.nextInt(10).toLong, rng.nextInt(50).toLong, rng.nextDouble(),
        i.toLong))
      .toDF("k", "t", "rv", "rid")
    val a = unionImpl(left, right).orderBy("k", "t", "lv")
      .collect().toSeq
    val b = nativeImpl(left, right).orderBy("k", "t", "lv")
      .collect().toSeq
    assert(a == b)
  }

  test("native as-of: null right keys/times never match") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), Option(5L), 0.5, 1L),
      (Option.empty[Long], Option(6L), 0.9, 2L),   // null key
      (Option(1L), Option.empty[Long], 0.7, 3L))   // null time
      .toDF("k", "t", "rv", "rid")
    val out = nativeImpl(left, right).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(3) == 0.5 && out.head.getLong(4) == 1L)
  }

  test("native as-of: null LEFT times carry nulls in both directions") {
    // regression (round-3 ADVICE): the merge read a NULL left time as
    // long 0 — backward matched it at epoch 0; forward (negated axis)
    // read it as the group MAXIMUM, consumed the whole right key group,
    // and poisoned lastCarry for every later left row in the group
    val left = Seq(
      (1L, Option.empty[Long], 1L),  // null time, sorts first in group
      (1L, Option(10L), 2L),
      (1L, Option.empty[Long], 3L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 0.5, 1L), (1L, 20L, 0.9, 2L))
      .toDF("k", "t", "rv", "rid")
    val back = nativeImpl(left, right).orderBy("lv").collect()
    assert(back(0).isNullAt(3) && back(2).isNullAt(3),
      "null left times must not match")
    assert(back(1).getDouble(3) == 0.5, "real left time matches t<=10")
    val fwd = NativeAsOf.forward(left, right, Seq("k" -> "k"), "t", "t",
      Seq("rv" -> "rv", "rid" -> "rid"), Seq("rid")).orderBy("lv").collect()
    assert(fwd(0).isNullAt(3) && fwd(2).isNullAt(3),
      "null left times must not match (forward)")
    assert(fwd(1).getDouble(3) == 0.9, "real left time matches t>=10")
  }

  test("native as-of rejects reserved/colliding output names") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 0.5, 1L)).toDF("k", "t", "rv", "rid")
    intercept[IllegalArgumentException] {
      NativeAsOf.backward(left, right, Seq("k" -> "k"), "t", "t",
        carry = Seq("rv" -> "lv"), tolerance = Some(1L)) // collides w/ left
    }
    intercept[IllegalArgumentException] {
      NativeAsOf.forward(left, right, Seq("k" -> "k"), "t", "t",
        carry = Seq("rv" -> "__nat_negl")) // reserved internal name
    }
  }

  test("native as-of: unmatched left rows carry nulls") {
    val left = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("k", "t", "lv")
    val right = Seq((1L, 20L, 0.5, 1L)).toDF("k", "t", "rv", "rid")
    val out = nativeImpl(left, right).orderBy("k").collect()
    assert(out.forall(_.isNullAt(3)) && out.forall(_.isNullAt(4)))
  }

  test("native as-of plans as AsOfJoinExec with exactly two exchanges") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 0.5, 1L)).toDF("k", "t", "rv", "rid")
    val df = nativeImpl(left, right)
    val plan = df.queryExecution.executedPlan.toString
    // Spark strips the Exec suffix in plan display; "!" would mark a
    // node with missing input attributes
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("!AsOfJoin"), plan)
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges == 2, s"expected 2 exchanges, plan:\n$plan")
  }

  test("native forward + tolerance agree with the union formulation") {
    val rng = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i =>
      (rng.nextInt(6).toLong, rng.nextInt(40).toLong, i.toLong))
      .toDF("k", "t", "lv")
    val right = Seq.tabulate(150)(i =>
      (rng.nextInt(8).toLong, rng.nextInt(40).toLong, rng.nextDouble(),
        i.toLong))
      .toDF("k", "t", "rv", "rid")
    val a = AsOfJoin.forward(left, right, Seq("k" -> "k"), "t", "t",
        Seq("rv" -> "rv", "rid" -> "rid"), Seq("rid"),
        tolerance = Some(5L))
      .orderBy("k", "t", "lv").collect().toSeq
    val b = NativeAsOf.forward(left, right, Seq("k" -> "k"), "t", "t",
        Seq("rv" -> "rv", "rid" -> "rid"), Seq("rid"),
        tolerance = Some(5L))
      .orderBy("k", "t", "lv").collect().toSeq
    assert(a == b && a.nonEmpty)
    val c = AsOfJoin.backward(left, right, Seq("k" -> "k"), "t", "t",
        Seq("rv" -> "rv", "rid" -> "rid"), Seq("rid"),
        tolerance = Some(3L))
      .orderBy("k", "t", "lv").collect().toSeq
    val d = NativeAsOf.backward(left, right, Seq("k" -> "k"), "t", "t",
        Seq("rv" -> "rv", "rid" -> "rid"), Seq("rid"),
        tolerance = Some(3L))
      .orderBy("k", "t", "lv").collect().toSeq
    assert(c == d)
  }

  test("native as-of handles shared-lineage sides (self as-of)") {
    // both sides filtered from ONE DataFrame — the analyzer's
    // DeduplicateRelations remaps the right subtree's exprIds; the
    // builder's fresh-alias wrapping is what keeps the node's expression
    // fields valid (regression: ATTRIBUTE_NOT_FOUND at execution)
    val base = Seq((1L, 5L, 0.5, 10L), (1L, 10L, 0.7, 11L),
      (2L, 3L, 0.9, 12L)).toDF("k", "t", "rv", "rid")
    val l = base.filter($"rid" >= 11L).select($"k", $"t", $"rid".as("lv"))
    val r = base.filter($"rid" <= 11L)
    val out = nativeImpl(l, r).orderBy("lv").collect()
    assert(out.length == 2)
    // (1,10): latest right t<=10 for k=1 among rid<=11 is (t=10, rid=11)
    assert(out(0).getDouble(3) == 0.7 && out(0).getLong(4) == 11L)
    // (2,3): right (2,3,rid=12) filtered out of r
    assert(out(1).isNullAt(3))
  }

  test("native as-of matches union formulation on the events fixture") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.sources.Tables(spark, dir).events
      .select($"event_id", $"user_id", unix_millis($"ts").as("ms"),
        $"event_type", $"value")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("k"), $"ms".as("t"), $"event_id".as("lv"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("k"), $"ms".as("t"), $"value".as("rv"),
        $"event_id".as("rid"))
    val a = unionImpl(errors, clicks).orderBy("k", "t", "lv")
      .collect().toSeq
    val b = nativeImpl(errors, clicks).orderBy("k", "t", "lv")
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
