package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Closed-form checks for the moment-based statistics operators (wave 8):
  * a perfect line must fit exactly, constructed outliers must be the only
  * rows flagged, and the EWMA kernel must reproduce its hand-computed
  * value — independent of the DuckDB oracle path. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("linearFit recovers an exact line (slope 2, intercept 1, r2 1)") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 1.0, i % 2))
      .toDF("x", "y", "g")
    val fits = Stats.linearFit(df, $"x", $"y", Seq($"g")).collect()
    assert(fits.length == 2)
    fits.foreach { r =>
      assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    }
  }

  test("linearFit r2 < 1 once noise breaks collinearity") {
    val df = (1 to 100)
      .map(i => (i.toDouble, 2.0 * i + (if (i % 3 == 0) 5.0 else -2.5), 0))
      .toDF("x", "y", "g")
    val r = Stats.linearFit(df, $"x", $"y", Seq($"g")).head()
    assert(r.getAs[Double]("r2") < 1.0 && r.getAs[Double]("r2") > 0.9)
  }

  test("zscoreOutliers flags exactly the planted outliers") {
    // 1000 values at 10±1 per group, two planted spikes far outside 3σ
    val base = (1 to 1000).map(i => (i.toLong, "a", 10.0 + (i % 3 - 1)))
    val spikes = Seq((2001L, "a", 300.0), (2002L, "a", -300.0))
    val df = (base ++ spikes).toDF("id", "k", "v")
    val out = Stats.zscoreOutliers(df, "k", "v", 3.0)
      .select($"id", $"z").collect()
    assert(out.map(_.getLong(0)).toSet == Set(2001L, 2002L))
    val zById = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zById(2001L) > 3.0 && zById(2002L) < -3.0)
  }

  test("ewma matches the hand-computed kernel and drops warm-up rows") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0))
      .toDF("k", "t", "v")
    val out = Stats.ewma(df, Seq($"k"), Seq($"t"), "v",
      alpha = 0.5, taps = 2).orderBy($"t").collect()
    // taps=2 ⇒ first row (no lag) dropped; ewma = (v + 0.5·prev) / 1.5
    assert(out.map(_.getAs[Int]("t")).toSeq == Seq(2, 3))
    assert(math.abs(out(0).getAs[Double]("ewma") - (2.0 + 0.5 * 1.0) / 1.5)
      < 1e-12)
    assert(math.abs(out(1).getAs[Double]("ewma") - (3.0 + 0.5 * 2.0) / 1.5)
      < 1e-12)
  }

  test("merge-upsert classification partitions the key space") {
    // mirrors q80's semantics on a small frame: update wins, inserts and
    // keeps pass through
    val base = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "price")
    val upd = Seq((2, 99.0), (4, 40.0)).toDF("uk", "uprice")
    val merged = base.join(upd, $"k" === $"uk", "full_outer")
      .select(coalesce($"k", $"uk").as("k"),
        coalesce($"uprice", $"price").as("price"),
        when($"k".isNull, "insert").when($"uk".isNull, "keep")
          .otherwise("update").as("action"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getString(2)))
      .toMap
    assert(merged == Map(
      1 -> (10.0, "keep"), 2 -> (99.0, "update"),
      3 -> (30.0, "keep"), 4 -> (40.0, "insert")))
  }
}
