package graft

import org.apache.spark.sql.functions._

import graft.operators.QDigest

/** The q-digest contract (operators/QDigest.scala): the DataFrame
  * compression and the local/streaming compression implement ONE rule,
  * compression conserves mass, every interior node is created with
  * cnt <= t (the fact that bounds rank error), digest size respects the
  * O(K·levels) bound, and quantile answers meet the documented rank
  * bound. The oracle-side equivalence is gated by q287–q289.
  */
class QDigestSpec extends SparkTestBase {
  import spark.implicits._

  private val Levels = 6 // 64-leaf domain keeps cases readable
  private val Nleaf = 1L << Levels

  /** Deterministic pseudo-random leaf histogram (skewed: mass ~ 1/b). */
  private def histogram(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val b = (i * i * 2654435761L) % Nleaf
      (b, 1L + (i % 7))
    }.groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2).sum) }.toSeq

  private def dfDigest(hist: Seq[(Long, Long)], t: Long) = {
    val d0 = hist.toDF("bucket", "cnt").select(lit("g").as("g"),
      (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
      $"cnt", lit(t).as("t"))
    QDigest.compress(d0, Seq("g"), Levels)
      .select($"node", $"lv", $"cnt").as[(Long, Int, Long)]
      .collect().sortBy(_._1)
  }

  private def localDigest(hist: Seq[(Long, Long)], t: Long) =
    QDigest.compressLocal(
      hist.map { case (b, c) => (Nleaf + b, Levels, c) }, t, Levels)
      .sortBy(_._1)

  test("DataFrame and local compression implement the same rule") {
    val hist = histogram(200)
    for (t <- Seq(1L, 5L, 40L, 1000000L)) {
      val a = dfDigest(hist, t)
      val b = localDigest(hist, t)
      assert(a.toSeq == b.toSeq, s"t=$t: DF $a != local $b")
    }
  }

  test("compression conserves mass and bounds interior node counts by t") {
    val hist = histogram(300)
    val n = hist.map(_._2).sum
    for (t <- Seq(3L, 25L, 200L)) {
      val dig = localDigest(hist, t)
      assert(dig.map(_._3).sum == n, s"t=$t: mass not conserved")
      val interior = dig.filter(_._2 < Levels)
      assert(interior.forall(_._3 <= t),
        s"t=$t: interior node over t: ${interior.filter(_._3 > t)}")
      // size bound: every surviving sibling group witnesses > t mass
      // (paper bound 3·n/t, plus the root path)
      assert(dig.size <= 3 * (n / t).max(1) + Levels + 1,
        s"t=$t: digest size ${dig.size} exceeds bound")
    }
  }

  test("compressLocal is order-independent") {
    val hist = histogram(150)
    val t = 20L
    val a = QDigest.compressLocal(
      hist.map { case (b, c) => (Nleaf + b, Levels, c) }, t, Levels)
    val b = QDigest.compressLocal(
      hist.reverse.map { case (b0, c) => (Nleaf + b0, Levels, c) },
      t, Levels)
    assert(a.sortBy(_._1) == b.sortBy(_._1))
  }

  test("weighted leaves: heavy skew keeps the weighted-rank bound (q308)") {
    // leaf mass = SUM(weight), not row count — a handful of buckets carry
    // 1000x the rest; the digest must still answer within the bound
    // measured in WEIGHT units
    val hist = (0 until 40).map { i =>
      val b = (i * 13L + 3) % Nleaf
      (b, if (i % 11 == 0) 5000L else 1L + (i % 5))
    }.groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2).sum) }.toSeq
    val n = hist.map(_._2).sum
    val t = (n / 12).max(1)
    val dig = localDigest(hist, t)
    assert(dig.map(_._3).sum == n, "weighted mass not conserved")
    val exact = hist.sortBy(_._1)
    for (pct <- Seq(50, 95)) {
      val target = (pct * n + 99) / 100
      val geo = dig.map { case (node, lv, cnt) =>
        val span = 1L << (Levels - lv)
        val lo = node * span - Nleaf
        (lo, lo + span - 1, cnt)
      }.sortBy { case (lo, hi, _) => (hi, -lo) }
      val estHi = geo.scanLeft(0L)(_ + _._3).tail.zip(geo)
        .collectFirst { case (cum, (_, hi, _)) if cum >= target => hi }
        .get
      val rankLe = exact.filter(_._1 <= estHi).map(_._2).sum
      val chosenCnt = geo.find(_._2 == estHi).map(_._3).getOrElse(0L)
      assert(rankLe >= target &&
        rankLe - target <= chosenCnt + 2L * Levels * t,
        s"pct=$pct: weighted rank_le=$rankLe target=$target out of bound")
      // the exact weighted quantile bucket is never ABOVE the estimate
      val exactBucket = exact.scanLeft(0L)(_ + _._2).tail.zip(exact)
        .collectFirst { case (cum, (b, _)) if cum >= target => b }.get
      assert(exactBucket <= estHi,
        s"pct=$pct: exact bucket $exactBucket above estimate $estHi")
    }
  }

  test("merge(shard digests) + recompress meets the rank bound") {
    val hist = histogram(400)
    val n = hist.map(_._2).sum
    val t = (n / 16).max(1)
    // two shards: alternate buckets — digests built per shard, merged
    val s0 = hist.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val s1 = hist.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)
    val d0 = localDigest(s0, t)
    val d1 = localDigest(s1, t)
    val summed = (d0 ++ d1).groupBy(_._1).map { case (node, xs) =>
      (node, xs.head._2, xs.map(_._3).sum)
    }.toSeq
    val merged = QDigest.compressLocal(summed, t, Levels)
    assert(merged.map(_._3).sum == n, "merge lost mass")
    // quantile check at p50/p90 against the exact histogram
    val exact = hist.sortBy(_._1)
    for (pct <- Seq(50, 90)) {
      val target = (pct * n + 99) / 100
      val geo = merged.map { case (node, lv, cnt) =>
        val span = 1L << (Levels - lv)
        val lo = node * span - Nleaf
        (lo, lo + span - 1, cnt)
      }.sortBy { case (lo, hi, _) => (hi, -lo) }
      val estHi = geo.scanLeft(0L)(_ + _._3).zip(geo.map(_._2) :+ 0L)
        .tail.zip(geo).collectFirst {
          case ((cum, _), (_, hi, _)) if cum >= target => hi
        }.get
      val rankLe = exact.filter(_._1 <= estHi).map(_._2).sum
      val chosenCnt = geo.find(_._2 == estHi).map(_._3).getOrElse(0L)
      assert(rankLe >= target &&
        rankLe - target <= chosenCnt + 2L * Levels * t,
        s"pct=$pct: rank_le=$rankLe target=$target out of bound")
    }
  }
}
