package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Convergence + conservation properties of the fixed-point PageRank
  * loop (operators.PageRank; q159 pins one step against the oracle).
  */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  test("uniform cycle is a fixed point: every rank stays one uniform share") {
    // A→B→C→A, equal weights: the uniform vector is exactly stationary,
    // and the fixed-point arithmetic must reproduce it EXACTLY (base +
    // damping·Ppm/100 = Ppm with no floor loss at these values)
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 3)
    assert(r.values.forall(_ == PageRank.Ppm), s"expected uniform: $r")
  }

  test("hub collects rank; dangling mass is redistributed, not leaked") {
    // a,c,d all point at b; b has no out-edges (dangling). Without
    // redistribution b's mass would vanish and total mass would decay
    // toward the teleport floor; with it, total stays ~N·Ppm (floor
    // division loses at most a few ppm per node per round).
    val edges = Seq(("a", "b", 1L), ("c", "b", 1L), ("d", "b", 1L))
      .toDF("src", "dst", "w")
    val out = PageRank.run(edges, "src", "dst", "w")
    val r = out.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("b") > r("a") && r("a") == r("c") && r("c") == r("d"),
      s"hub must outrank spokes symmetrically: $r")
    val total = r.values.sum
    val n = r.size
    assert(math.abs(total - n * PageRank.Ppm) <= n * 100L,
      s"mass not conserved: total=$total expected≈${n * PageRank.Ppm}")
  }

  test("weighted edges skew rank toward the heavier target") {
    // a splits 3:1 between b and c (both sinks feed back to a so the
    // chain recirculates instead of dangling-averaging out)
    // a↔{b,c} is near-bipartite: the -0.85 eigenmode decays as 0.85^k,
    // so 10 ppm needs ~70 rounds — the loud-failure default (30) is for
    // real graphs, not this adversarial toy
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w",
      maxIterations = 120).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("b") > r("c"),
      s"3:1 weight split must rank b above c: $r")
  }

  test("non-convergence fails loudly instead of returning truncated ranks") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    intercept[IllegalStateException] {
      // tol 0 on a graph whose fixed-point arithmetic oscillates ±1 ppm
      // can still converge; force failure with zero allowed iterations…
      PageRank.run(edges, "src", "dst", "w", maxIterations = 0, tolPpm = 0L)
    }
  }

  test("fixed-iteration mode (tolPpm<0): exactly R rounds, no convergence throw") {
    // a->b with b dangling: round 1 from uniform gives
    //   dangShare = Ppm/2 = 500000
    //   r(a) = 150000 + 85*(0 + 500000) DIV 100      = 575000
    //   r(b) = 150000 + 85*(1000000 + 500000) DIV 100 = 1425000
    // One round is NOT the fixed point, so tolPpm>=0 with
    // maxIterations=1 must throw; tolPpm=-1 must return the exact
    // round-1 vector instead - the mode q262's unrolled oracle needs.
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(edges, "src", "dst", "w",
        maxIterations = 1, tolPpm = -1L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 575000L, "b" -> 1425000L),
      s"round-1 vector wrong: $r")
    intercept[IllegalStateException] {
      PageRank.run(edges, "src", "dst", "w",
        maxIterations = 1, tolPpm = 10L)
    }
  }

  test("personalized: teleport and mass return to the seed (2-cycle)") {
    // a<->b, seed {a}, 2 fixed rounds — hand-derived integer states:
    // init: a=2e6, b=0; teleport(a) = 15*2*1e6/100 = 300000
    // r1: a = 300000 + 0; b = 85*2e6/100 = 1700000
    // r2: a = 300000 + 85*1700000/100 = 1745000; b = 85*300000/100 = 255000
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("sid")
    val r = graft.operators.PageRank.runPersonalized(
        edges, "src", "dst", "w", seeds, "sid", rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1745000L, 2L -> 255000L), s"got $r")
  }

  test("personalized: dangling mass returns to the seeds, not uniform") {
    // seed a points at dangling sink b; b's mass must flow back to a
    // (uniform redistribution would leak half of it to b forever)
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("sid")
    val r = graft.operators.PageRank.runPersonalized(
        edges, "src", "dst", "w", seeds, "sid", rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round arithmetic: init a=2e6,b=0; teleport=3e5; dang(b)=r(b)
    // r1: dang=0;   a=3e5,            b=85*2e6/100=17e5
    // r2: dang=17e5; a=3e5+85*17e5/100=1745000, b=85*3e5/100=255000
    // r3: dang=255000; a=3e5+85*255000/100=516750, b=85*1745000/100=1483250
    assert(r == Map(1L -> 516750L, 2L -> 1483250L), s"got $r")
  }

  test("personalized: a seed set absent from the graph fails loudly") {
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(99L).toDF("sid")
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.runPersonalized(
        edges, "src", "dst", "w", seeds, "sid", rounds = 1)
    }
  }
}
