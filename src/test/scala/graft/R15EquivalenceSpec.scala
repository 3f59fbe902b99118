package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Coreness, LabelProp, QualityLr, Staging}

/** Round-15 rewrites changed three operators' INTERNALS while pinning
  * their outputs bit-identical; this spec re-derives each output with
  * the superseded formulation, spelled inline, and compares exactly.
  *
  *  - QualityLr.train: per-round two-pass (score join by doc, gradient
  *    join by bucket over the exploded leaf) → one pass over a per-doc
  *    feature-array table with an in-row fold. Weights must match to
  *    the decimal digit (the unrolled q350/q362/q363 oracles replay
  *    every round).
  *  - Coreness: per-round H-index via row_number over every neighbor
  *    row → cumulative counts over the per-node value histogram.
  *  - LabelProp: per-round winning vote via row_number window →
  *    two-level aggregate with lexicographic struct-min.
  */
class R15EquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private def mixedDocs = (1 to 120).map { i =>
    val words = (0 to i % 7).map(k => s"w${(i * 31 + k * 17) % 23}")
    (i.toLong, if (i % 3 == 0) "en" else "de", words.mkString(" "))
  }.toDF("doc_id", "lang", "text")

  /** The superseded two-pass training loop, verbatim. */
  private def trainTwoPass(feat: DataFrame, eta: Long, rounds: Int,
      b: Int): DataFrame = {
    val nDocs = feat.agg(countDistinct($"doc_id")).head().getLong(0)
    var w = spark.range(b).select($"id".as("b"),
      lit(0).cast(DecimalType(38, 0)).as("w"))
    for (_ <- 1 to rounds) {
      val z = feat.join(broadcast(w), "b")
        .groupBy($"doc_id", $"y")
        .agg(expr("CAST(SUM(w * x) DIV 1000000 AS DECIMAL(38,0))")
          .as("z"))
      val resid = z.select($"doc_id",
        (least(greatest(lit(500000).cast(DecimalType(38, 0)) +
          expr("z DIV 4"), lit(0)), lit(1000000)) - $"y").as("r"))
      val g = feat.join(resid, "doc_id")
        .groupBy($"b").agg(sum($"r" * $"x").as("g"))
      w = Staging.stage(
        w.join(g, Seq("b"), "left_outer")
          .select($"b",
            expr(s"CAST(w - ($eta * (COALESCE(g, 0) DIV " +
              s"CAST($nDocs AS DECIMAL(38,0)))) " +
              "DIV 1000000 AS DECIMAL(38,0))").as("w")),
        eager = true)
    }
    w
  }

  test("array-fold training == two-pass training, every weight") {
    val feat = QualityLr.features(mixedDocs)
    val now = QualityLr.train(feat).orderBy($"b")
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val old = trainTwoPass(feat, QualityLr.Eta, QualityLr.Rounds,
      QualityLr.B).orderBy($"b")
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    assert(now.toSeq === old.toSeq)
    // and the trained model is non-trivial on this corpus (guards
    // against an equivalence that holds only because everything is 0)
    assert(now.exists(_._2.signum != 0))
    Staging.sweep(spark)
  }

  test("histogram H-index == per-neighbor-row H-index (coreness)") {
    // ring + chords: mixed degrees, several H-index rounds
    val es = ((1 to 60).map(i => (i.toLong, (i % 60 + 1).toLong)) ++
      (1 to 20).map(i => (i.toLong, ((i * 7) % 60 + 1).toLong)))
      .filter { case (a, bb) => a != bb }
    val edges = es.toDF("a", "b")
    val sym = edges.unionByName(edges.select($"b".as("a"), $"a".as("b")))
    val now = Coreness.run(sym, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // superseded formulation, one full fixpoint, verbatim
    val e = sym.select($"a".as("src"), $"b".as("dst")).distinct()
      .cache()
    var vals = e.groupBy($"src".as("id")).agg(count(lit(1)).as("v"))
    val wDesc = Window.partitionBy($"node").orderBy($"nv".desc)
    var prev = ""
    var cur = "x"
    while (prev != cur) {
      prev = cur
      vals = e.join(vals, $"dst" === $"id")
        .select($"src".as("node"), $"v".as("nv"))
        .withColumn("rn", row_number().over(wDesc))
        .groupBy($"node".as("id"))
        .agg(max(least($"rn", $"nv")).as("v"))
        .localCheckpoint(true)
      cur = vals.orderBy($"id").collect().mkString
    }
    val old = vals.collect()
      .map(r => (r.getLong(0), r.get(1).toString.toLong)).sorted
    assert(now.toSeq === old.toSeq)
    Staging.sweep(spark)
  }

  test("struct-min vote == row_number vote (label propagation)") {
    val es = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 2L), (4L, 5L, 9L),
      (5L, 6L, 9L), (6L, 4L, 9L), (7L, 8L, 1L), (2L, 7L, 3L),
      (8L, 9L, 4L), (9L, 7L, 4L), (1L, 3L, 2L))
    val edges = es.toDF("a", "b", "w")
    val sym = edges.unionByName(
      edges.select($"b".as("a"), $"a".as("b"), $"w"))
    val now = LabelProp.run(sym, "a", "b", "w", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // superseded formulation, 3 synchronous rounds, verbatim
    val e = sym.select($"a".as("src"), $"b".as("dst"),
      $"w".cast("long").as("w")).cache()
    val selfW = e.groupBy($"dst").agg(max($"w").as("mw"))
      .select($"dst".as("sid"), $"mw")
    var labels = e.select($"src".as("id"))
      .unionByName(e.select($"dst".as("id"))).distinct()
      .withColumn("label", $"id")
    val wBest = Window.partitionBy($"dst")
      .orderBy($"f".desc, $"label")
    for (_ <- 1 to 3) {
      val votes = e.join(labels, $"src" === $"id")
        .select($"dst", $"label", $"w")
        .unionByName(selfW.join(labels, $"sid" === $"id")
          .select($"sid".as("dst"), $"label", $"mw".as("w")))
      val best = votes.groupBy($"dst", $"label")
        .agg(sum($"w").as("f"))
        .withColumn("rn", row_number().over(wBest))
        .filter($"rn" === 1)
        .select($"dst", $"label".as("nl"))
      labels = labels.join(best, $"id" === $"dst", "left_outer")
        .select($"id", coalesce($"nl", $"label").as("label"))
        .localCheckpoint(true)
    }
    val old = labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(now.toSeq === old.toSeq)
    Staging.sweep(spark)
  }
}
