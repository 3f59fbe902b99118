package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 150L, "l3"), (3L, 50L, "l4"))
    .toDF("k", "t", "lv")
  private def right = Seq(
    (1L, 90L, "r-90"), (1L, 100L, "r-100"), (1L, 150L, "r-150"),
    (2L, 150L, "r-equal"), (2L, 149L, "r-before"))
    .toDF("k", "rt", "rv")

  test("backward as-of picks latest right row at or before left time") {
    val out = AsOfJoin.backward(left, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv", "rt" -> "matched_t"),
      rightTieBreak = Seq("rv"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSeq ==
      Seq(
        (1L, "l1", "r-100"),   // exact-time right row qualifies (<=)
        (1L, "l2", "r-150"),
        (2L, "l3", "r-equal"), // 150 <= 150 beats 149
        (3L, "l4", null)))     // no right row for key 3 → null carry
  }

  test("nearest as-of picks the closer side, ties to the past match") {
    // k=1 t=100: past r-100 (gap 0) vs future r-150 → past
    // k=1 t=200: past r-150 (gap 50), no future → past
    // k=2 t=150: r-equal gap 0 (tie with itself) → past semantics
    // k=3 t=50: no right rows at all → null carry, null gap
    val out = AsOfJoin.nearest(left, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv"), rightTieBreak = Seq("rv"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3),
      Option(r.get(4)).map(_.toString).orNull)).toSeq ==
      Seq((1L, "r-100", "0"), (1L, "r-150", "50"),
        (2L, "r-equal", "0"), (3L, null, null)))
    // and a future-closer case: left at t=140 for k=1 → r-150 (gap 10)
    // beats r-100 (gap 40)
    val single = Seq((1L, 140L, "lx")).toDF("k", "t", "lv")
    val got = AsOfJoin.nearest(single, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv"), rightTieBreak = Seq("rv")).head()
    assert(got.getString(3) == "r-150" && got.getLong(4) == 10L)
  }

  test("as-of with zero right rows yields all-null carry") {
    val out = AsOfJoin.backward(left, right.filter($"k" === 999),
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv"))
    assert(out.count() == 4 && out.filter($"rv".isNotNull).count() == 0)
  }

  test("as-of tolerance nulls matches older than the window") {
    val out = AsOfJoin.backward(left, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv"), rightTieBreak = Seq("rv"),
      tolerance = Some(10L))
      .orderBy("k", "t").collect()
    // l1@100 matches r-100 (gap 0 ≤ 10); l2@200's latest is r-150
    // (gap 50 > 10) → nulled; l3@150 matches r-equal (gap 0)
    assert(out.map(r => (r.getString(2), r.getString(3))).toSeq ==
      Seq(("l1", "r-100"), ("l2", null), ("l3", "r-equal"), ("l4", null)))
  }

  test("forward as-of picks earliest right row at or after left time") {
    val out = AsOfJoin.forward(left, right,
      keys = Seq("k" -> "k"), leftTime = "t", rightTime = "rt",
      carry = Seq("rv" -> "rv", "rt" -> "matched_t"),
      rightTieBreak = Seq("rv"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getString(2), r.getString(3))).toSeq == Seq(
      ("l1", "r-100"),   // 100 >= 100 qualifies
      ("l2", null),      // nothing at/after 200
      ("l3", "r-equal"), // 150 >= 150
      ("l4", null)))     // no key-3 right rows
  }
}

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("interval join honors [t-before, t+after) bounds across buckets") {
    val l = Seq((1L, 10_000L, "p")).toDF("k", "t", "lv")
    val r = Seq(
      (1L, 6_999L), (1L, 7_000L),   // 7_000 = t-3000 inclusive lower bound
      (1L, 9_999L), (1L, 10_000L),  // 10_000 = t+0 exclusive upper bound
      (2L, 8_000L))                 // wrong key
      .toDF("rk", "rt")
    val out = RangeJoin.intervalJoin(l, r, "k", "rk", "t", "rt",
      beforeMs = 3_000L, afterMs = 0L, bucketMs = 1_000L)
    assert(out.select("rt").as[Long].collect().sorted.toSeq ==
      Seq(7_000L, 9_999L))
  }
}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("gap reaching the threshold starts a new session (session_window)") {
    val df = Seq(
      (1L, 0L), (1L, 999L),                  // session 1
      (1L, 2_000L),                          // gap 1001 >= 1000 → session 2
      (1L, 3_000L),                          // gap exactly 1000 → session 3
      (1L, 3_999L),                          // gap 999 < 1000 → stays
      (2L, 0L))                              // separate key
      .toDF("k", "t")
    val out = Sessionize.byGap(df, Seq("k"), "t", gapMs = 1_000L)
      .orderBy("k", "t")
      .select($"k", $"t", $"session_id").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 0L, 1L), (1L, 999L, 1L), (1L, 2_000L, 2L),
      (1L, 3_000L, 3L), (1L, 3_999L, 3L), (2L, 0L, 1L)))
  }
}

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("min-label propagation converges on chains, stars, and islands") {
    // chain 1-2-3-4-5 (needs >1 iteration), star 10-{11,12,13},
    // isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (13L, 10L), (20L, 21L))
      .toDF("a", "b")
    val cc = ConnectedComponents.minLabel(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
  }

  test("pointer jumping converges a 40-node chain within default rounds") {
    // plain min-propagation needs 39 rounds here — past the default cap
    // of 20; the label-of-label shortcut (enabled from round 3) doubles
    // progress per round, so convergence is ~2 + log2(39) rounds
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = ConnectedComponents.minLabel(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 40L).forall(cc(_) == 1L))
  }

  test("an unconverged component fails loudly, never silently truncates") {
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.minLabel(edges, "a", "b", maxIterations = 2)
    }
  }
}

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens drop empties; shingles need >= n tokens") {
    val df = Seq("one two three", "a b", "").toDF("text")
      .select(TextOps.tokens($"text").as("tk"))
      .select($"tk", TextOps.shingles($"tk", 3).as("sh"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("one", "two", "three"))
    assert(rows(0).getSeq[String](1) == Seq("one two three"))
    assert(rows(1).getSeq[String](1) == Seq.empty)
    assert(rows(2).getSeq[String](0) == Seq.empty)
  }

  test("fingerprint is order-sensitive and stable") {
    val fps = Seq("alpha beta", "beta alpha", "alpha beta")
      .toDF("text")
      .select(TextOps.docFingerprint($"text").as("fp"))
      .as[Long].collect()
    assert(fps(0) == fps(2) && fps(0) != fps(1))
    assert(fps.forall(fp => fp >= 0 && fp < TextOps.P))
  }

  test("identical docs share MinHash signatures and SimHash") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    val sh = docs.select($"doc_id", TextOps.tokens($"text").as("tk"))
      .select($"doc_id", explode(array_distinct(TextOps.shingles($"tk", 3))).as("s"))
      .select($"doc_id", TextOps.hashMod($"s").as("h")).distinct()
    val sig = Dedup.minhashSignatures(sh, "doc_id", "h", 8)
      .orderBy("doc_id").collect()
    assert(sig(0).toSeq.tail == sig(1).toSeq.tail)
    assert(sig(0).toSeq.tail != sig(2).toSeq.tail)
    val cand = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(sh, "doc_id", "h", 8), "doc_id", 2, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)) && !cand.contains((1L, 3L)))
  }
}

class VectorsSpec extends SparkTestBase {
  import spark.implicits._

  test("dot, norm, distSq on known values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
      .select(
        Vectors.dot(Vectors.toDouble($"a"), Vectors.toDouble($"b")).as("d"),
        Vectors.norm(Vectors.toDouble($"a")).as("na"),
        Vectors.distSq(Vectors.toDouble($"a"), Vectors.toDouble($"b")).as("d2"))
    val Row(d: Double, na: Double, d2: Double) = df.head()
    assert(d == 8.0 && na == 3.0 && d2 == 2.0)
  }

  test("srp bucket is deterministic and within range") {
    val v = (0 until 64).map(i => (i % 7 - 3).toFloat).toArray
    val df = Seq(v, v).toDF("e")
      .select(Vectors.srpBucket(Vectors.toDouble($"e"), 8).as("b"))
      .as[Long].collect()
    assert(df(0) == df(1) && df(0) >= 0 && df(0) < 256)
  }
}
