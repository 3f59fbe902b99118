package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** In-engine trained quality classifier: a logistic-style linear model
  * over hashed token features, trained with fixed full-batch gradient
  * rounds ENTIRELY in integer-ppm weight space — deterministic,
  * partitioning-independent, and exactly re-derivable by an unrolled
  * SQL oracle (q350/q351).
  *
  * The transcendental-free device: the sigmoid is the HARD sigmoid
  * clamp(½ + z/4, 0, 1), piecewise-linear and exact in integer ppm
  * with truncating DIV, so weights/scores/residuals/gradients are all
  * bit-exact integers (real logistic exp() would drift across libms).
  * Saturated-correct documents contribute zero residual — updates
  * concentrate on the undecided band, perceptron-style.
  *
  * Features: token-count fractions (ppm of each document's tokens) in
  * B hashed buckets — q266's DSIR feature space. Label: a binary doc
  * predicate (the gated queries use lang = 'en').
  *
  * Scale shape: ONE corpus-sized explode builds the staged feature
  * leaf; each round is two passes over it (score aggregate by doc,
  * gradient aggregate by bucket) with the B-row weight table
  * broadcast back and re-staged per round, so lineage never
  * re-executes earlier rounds and the driver holds no data.
  */
object QualityLr {

  val B = 64
  val Eta = 64L
  val Rounds = 8

  /** Staged (doc_id, y, b, x) feature leaf from a documents-like frame
    * (doc_id, lang, text): y = 10⁶·[lang = positive], x = bucket token
    * fraction in ppm. Docs with zero tokens have no rows. Caller
    * releases via Staging.sweep.
    *
    * `b` sizes the hashed bucket space; `bigrams` widens the feature
    * stream to tokens ∪ word bigrams (q363's capacity rung — bigrams
    * are space-joined, tokens never contain spaces, so the streams
    * cannot collide pre-hash). Still ONE corpus-sized explode either
    * way. */
  def features(docs: DataFrame, positiveLang: String = "en",
      b: Int = B, bigrams: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    val tk = TextOps.tokens($"text")
    val farr = if (bigrams) concat(tk, TextOps.shingles(tk, 2)) else tk
    val tf = docs
      .select($"doc_id", $"lang", explode(farr).as("t"))
      .groupBy($"doc_id", $"lang",
        (TextOps.md5Long($"t") % lit(TextOps.P) % b).as("b"))
      .agg(count(lit(1)).cast(LongType).as("c"))
    val nt = tf.groupBy($"doc_id".as("__d")).agg(sum($"c").as("__nt"))
    Staging.stage(
      tf.join(nt, $"doc_id" === $"__d")
        .select($"doc_id",
          when($"lang" === positiveLang, lit(1000000L)).otherwise(lit(0L))
            .cast(DecimalType(38, 0)).as("y"),
          $"b",
          expr("CAST((1000000 * c) DIV __nt AS DECIMAL(38,0))").as("x")),
      eager = true)
  }

  /** Train on a staged feature leaf; returns the B-row (b, w) weight
    * frame (w in ppm, DECIMAL(38,0)), staged — caller releases. */
  def train(feat: DataFrame, eta: Long = Eta,
      rounds: Int = Rounds, b: Int = B): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    // the doc count is a training CONSTANT: collect it once instead of
    // re-deriving it inside every round's weight update (the old
    // crossJoin(broadcast(nd)) re-executed the countDistinct corpus
    // pass on each of the 8 rounds' eager stagings). Embedded back as
    // a DECIMAL(38,0) literal so the update expression tree — and the
    // unrolled oracle's replay of it — is unchanged.
    val nDocs = feat.agg(countDistinct($"doc_id")).head().getLong(0)
    var w = Staging.stage(
      spark.range(b).select($"id".as("b"),
        lit(0).cast(DecimalType(38, 0)).as("w")),
      eager = true)
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
      val wNext = Staging.stage(
        w.join(g, Seq("b"), "left_outer")
          .select($"b",
            expr(s"CAST(w - ($eta * (COALESCE(g, 0) DIV " +
              s"CAST($nDocs AS DECIMAL(38,0)))) " +
              "DIV 1000000 AS DECIMAL(38,0))").as("w")),
        eager = true)
      Staging.release(w)
      w = wNext
    }
    w
  }

  /** Per-document scores from a trained weight frame: (doc_id, y, z)
    * with z = Σ w·x DIV 10⁶ in ppm. */
  def score(feat: DataFrame, w: DataFrame): DataFrame = {
    import feat.sparkSession.implicits._
    feat.join(broadcast(w), "b")
      .groupBy($"doc_id", $"y")
      .agg(expr("CAST(SUM(w * x) DIV 1000000 AS BIGINT)").as("z"))
  }
}
