package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{QualityLr, TextOps}
import graft.sources.Tables

/** Hundred-thirty-seventh coverage wave: a quality classifier TRAINED
  * in-engine — the fastText-classifier rung every production curation
  * pipeline runs above heuristics (q34/q83), n-gram LMs (q158/q317)
  * and importance weights (q266), closing the r12 verdict's #3 ask.
  *
  *  - q350: logistic-style linear model over q266's B=64 hashed token
  *    features (bucket frequencies in ppm of each document's tokens),
  *    label = the English slice, trained with 8 fixed full-batch
  *    gradient rounds ENTIRELY in integer-ppm weight space — the
  *    q258/q162 fixed-point discipline. The transcendental-free
  *    device: the sigmoid is the HARD sigmoid clamp(½ + z/4, 0, 1)
  *    (piecewise-linear, exact in integer ppm with truncating DIV —
  *    both engines truncate toward zero, r11 parity probe), so every
  *    weight, score, residual and gradient is a bit-exact integer and
  *    the unrolled-round CTE oracle re-derives the trained weights
  *    EXACTLY — no float anywhere, unlike real logistic loss whose
  *    exp() would diverge across libms. Saturated-correct documents
  *    contribute zero residual, so updates concentrate on the
  *    undecided band (perceptron-like). Output: the 64 trained
  *    weights.
  *
  *  - q351: the eval twin — every document scored with q350's
  *    weights, and the learned score's exact AUC (q281's tie-credited
  *    Mann–Whitney machinery over quantized score levels) measured
  *    IN-GATE next to the q34 heuristic baseline's AUC on the same
  *    population; `learned_beats` asserts the ordering in the gated
  *    result (644 820 ppm vs 466 816 ppm at sf0.01 — the heuristic is
  *    anti-correlated with English here, the learned model is not).
  *
  * Scale shape: ONE corpus-sized explode builds the staged feature
  * leaf; each training round is two passes over that leaf (score
  * aggregate by doc, gradient aggregate by bucket) with the 64-row
  * weight table broadcast back — weights re-staged per round so the
  * lineage never re-executes earlier rounds; the driver holds no
  * data. The AUC tail cumulates over quantized score LEVELS (bounded,
  * q281's shape), never corpus rows.
  */
object Extras137 {

  private val B = 64
  private val Eta = 64L
  private[queries] val Rounds = 8

  /** Shared CTE prefix: feature table + nd + w0 + unrolled training
    * rounds, ending at w[Rounds]. */
  private[queries] def trainCtes: String =
    trainCtesG(B, "SELECT doc_id, lang, unnest(tk) AS t FROM toks")

  /** [[trainCtes]] generalized over bucket count and the exploded
    * (doc_id, lang, t) feature stream — the q362 train-split
    * restriction and the q363 bigram/B=1024 capacity rung rerender
    * the SAME unrolled-round machinery with only these two knobs
    * (the round CTEs are b-independent). */
  private[queries] def trainCtesG(b: Int, tSrc: String): String = {
    val rounds = (1 to Rounds).map { r =>
      s"""z$r AS MATERIALIZED (SELECT f.doc_id, f.y,
         |    SUM(w.w * f.x) // 1000000 AS z
         |  FROM feat f JOIN w${r - 1} w ON w.b = f.b GROUP BY 1, 2),
         |u$r AS (SELECT doc_id,
         |    LEAST(GREATEST(500000 + z // 4, 0), 1000000) - y AS r
         |  FROM z$r),
         |g$r AS (SELECT f.b, SUM(u.r * f.x) AS g
         |  FROM feat f JOIN u$r u ON u.doc_id = f.doc_id GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT w.b,
         |    w.w - ($Eta * (COALESCE(g.g, 0) // nd.n)) // 1000000 AS w
         |  FROM w${r - 1} w LEFT JOIN g$r g ON g.b = w.b
         |  CROSS JOIN nd)""".stripMargin
    }.mkString(",\n")
    s"""${TextOps.oracleToksCte},
       |tf AS (SELECT doc_id, lang,
       |    ${TextOps.oracleHashSql("t")} % $b AS b,
       |    CAST(COUNT(*) AS HUGEINT) AS c
       |  FROM ($tSrc)
       |  GROUP BY 1, 2, 3),
       |ntk AS (SELECT doc_id, SUM(c) AS nt FROM tf GROUP BY 1),
       |feat AS MATERIALIZED (SELECT tf.doc_id,
       |    CAST(CASE WHEN tf.lang = 'en' THEN 1000000 ELSE 0 END
       |      AS HUGEINT) AS y,
       |    tf.b, (1000000 * tf.c) // ntk.nt AS x
       |  FROM tf JOIN ntk USING (doc_id)),
       |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS HUGEINT) AS n
       |       FROM feat),
       |w0 AS (SELECT CAST(t.b AS BIGINT) AS b, CAST(0 AS HUGEINT) AS w
       |       FROM range($b) t(b)),
       |$rounds""".stripMargin
  }

  // Trained weights are a deterministic pure function of the fixture
  // dir; four catalog queries (q350/q351/q355/q356) consume them, so
  // the 8-round training loop is memoized per (dir) for the session —
  // 64 (b, w) longs driver-side, the linkDirs caching convention. The
  // feature leaf is NOT memoized (staged blocks are swept between
  // queries); each query re-stages its own.
  private val weightMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, java.math.BigDecimal)]]()

  /** Spark twin of [[trainCtes]] — the [[graft.operators.QualityLr]]
    * operator over the fixtures' documents. */
  private[queries] def train(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val feat = QualityLr.features(Tables(spark, dir).documents)
    val rows = weightMemo.computeIfAbsent(dir, { _ =>
      QualityLr.train(feat).collect()
        .map(r => (r.getLong(0), r.getDecimal(1)))
    })
    (feat, wFrame(spark, rows))
  }

  /** Weights ONLY — for consumers that never read the batch feature
    * leaf (q356 scores a STREAM with the standing weights): on a memo
    * hit this touches no corpus table at all, where [[train]] would
    * eagerly stage the full tokenize→explode feature leaf just to
    * throw it away. Training on a memo miss builds the leaf, trains,
    * and releases it. */
  private[queries] def trainedW(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val rows = weightMemo.computeIfAbsent(dir, { _ =>
      val feat = QualityLr.features(Tables(spark, dir).documents)
      val out = QualityLr.train(feat).collect()
        .map(r => (r.getLong(0), r.getDecimal(1)))
      graft.operators.Staging.release(feat)
      out
    })
    wFrame(spark, rows)
  }

  private def wFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(Long, java.math.BigDecimal)]): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("b", "w")
      .select($"b", $"w".cast(org.apache.spark.sql.types
        .DecimalType(38, 0)).as("w"))
  }

  /** Learned-score level table (sm, pos, neg): every document scored
    * with the trained weights, quantized to milli. */
  private[queries] def learnedLevels(feat: DataFrame, w: DataFrame): DataFrame = {
    import feat.sparkSession.implicits._
    QualityLr.score(feat, w)
      .select($"y", expr("z DIV 1000").as("sm"))
      .groupBy($"sm")
      .agg(sum(when($"y" > 0, 1L).otherwise(0L)).as("pos"),
        sum(when($"y" > 0, 0L).otherwise(1L)).as("neg"))
  }

  val all: Seq[Qry] = Seq(

    Qry(
      "q350_quality_train",
      s"""WITH $trainCtes
         |SELECT b, CAST(w AS BIGINT) AS w_ppm FROM w$Rounds"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      // weights only — the feature leaf is training-internal here
      val w = trainedW(spark, dir)
      w.select($"b", $"w".cast(LongType).as("w_ppm"))
    },

    Qry(
      "q351_quality_auc",
      s"""WITH $trainCtes,
         |zf AS (SELECT f.doc_id, f.y, SUM(w.w * f.x) // 1000000 AS z
         |  FROM feat f JOIN w$Rounds w ON w.b = f.b GROUP BY 1, 2),
         |gl AS (SELECT z // 1000 AS sm,
         |    CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS pos,
         |    CAST(SUM(CASE WHEN y > 0 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS neg
         |  FROM zf GROUP BY 1),
         |cl AS (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY sm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumneg FROM gl),
         |al AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         |    CAST(SUM(neg) AS BIGINT) AS n_neg,
         |    CAST(1000000 * SUM(pos * (2 * cumneg + neg))
         |      // (2 * SUM(pos) * SUM(neg)) AS BIGINT) AS auc_l
         |  FROM cl),
         |hq AS (SELECT doc_id, lang,
         |    ${Extras94.ScoreMilliSql} AS sm
         |  FROM toks WHERE len(tk) > 0),
         |gh AS (SELECT sm,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS pos,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS neg
         |  FROM hq GROUP BY 1),
         |ch AS (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY sm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumneg FROM gh),
         |ah AS (SELECT CAST(1000000 * SUM(pos * (2 * cumneg + neg))
         |      // (2 * SUM(pos) * SUM(neg)) AS BIGINT) AS auc_h
         |  FROM ch)
         |SELECT al.n_pos, al.n_neg, al.auc_l AS auc_learned_ppm,
         |  ah.auc_h AS auc_heur_ppm,
         |  al.auc_l - ah.auc_h AS delta_ppm,
         |  CAST(CASE WHEN al.auc_l > ah.auc_h THEN 1 ELSE 0 END
         |    AS BIGINT) AS learned_beats
         |FROM al CROSS JOIN ah""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (feat, w) = train(spark, dir)
      val al = Extras94.aucTail(learnedLevels(feat, w))
        .select($"n_pos", $"n_neg", $"auc_ppm".as("auc_learned_ppm"))
      // heuristic baseline over the same population (docs with >= 1
      // token — exactly the feature table's doc set)
      val hLevels = Tables(spark, dir).documents
        .select($"lang", $"text", TextOps.tokens($"text").as("tk"))
        .filter(size($"tk") > 0)
        .select($"lang", Extras94.scoreMilli.as("sm"))
        .groupBy($"sm")
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
          sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
      val ah = Extras94.aucTail(hLevels)
        .select($"auc_ppm".as("auc_heur_ppm"))
      al.crossJoin(broadcast(ah))
        .select($"n_pos", $"n_neg", $"auc_learned_ppm", $"auc_heur_ppm",
          ($"auc_learned_ppm" - $"auc_heur_ppm").as("delta_ppm"),
          when($"auc_learned_ppm" > $"auc_heur_ppm", 1L).otherwise(0L)
            .as("learned_beats"))
    }
  )
}
