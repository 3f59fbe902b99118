package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Hundred-nineteenth coverage wave: language-model fluency scoring
  * WITHOUT floating point — the quality-filter tier's "does this text
  * read like the corpus" signal as exact integer arithmetic.
  *
  *  - q317: a bigram language model with add-one smoothing, trained on
  *    the corpus itself and used to score every document:
  *    P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), where c(w₁·) counts w₁ as a
  *    HISTORY (bigram-initial occurrences — the estimate's own
  *    normalizer, so probabilities over each history sum to exactly 1)
  *    and V is the corpus vocabulary. A document's fluency is the MEAN
  *    conditional probability over its bigram instances, in ppm. The
  *    standard formulation (mean log-prob → perplexity) needs
  *    transcendentals that no two engines round identically; the mean
  *    raw conditional probability is order-equivalent for ranking
  *    quality filters at a fixed length band and is EXACT — integral
  *    division only, both engines bit-identical. Gibberish scores near
  *    the smoothing floor 10⁶/(c+V); corpus-typical text scores by its
  *    bigram reuse — the fixture spreads 30k–39k ppm.
  *
  * Scale shape: the bigram and history count tables collapse map-side
  * to vocabulary-bounded tables (broadcast when they fit, shuffled
  * equi-join at 100×); the only corpus-sized stages are the bigram
  * explode and the final per-doc aggregate. V is one scalar crossed in
  * by a broadcast 1-row frame.
  */
object Extras119 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q317_lm_fluency",
      s"""WITH toks AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text),
         |    '${TextOps.TokenReDuck}'), t -> len(t) > 0) AS tk
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
         |    i -> array_to_string(tk[i+1:i+2], ' '))) AS bg
         |  FROM toks WHERE len(tk) >= 2),
         |v AS (SELECT COUNT(DISTINCT t) AS v FROM
         |  (SELECT unnest(tk) AS t FROM toks)),
         |cbg AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
         |ch AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
         |  FROM bg GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM((1000000 * (cbg.c12 + 1)) // (ch.c1 + v.v))
         |    // COUNT(*) AS BIGINT) AS fluency_ppm
         |FROM bg JOIN cbg USING (bg)
         |  JOIN ch ON ch.w1 = split_part(bg.bg, ' ', 1) CROSS JOIN v
         |GROUP BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val toks = Tables(spark, dir).documents
        .select($"doc_id", TextOps.tokens($"text").as("tk"))
      // bigram INSTANCES (not per-doc distinct — LM counts are
      // frequency counts, unlike the dedup shingle path)
      val bg = toks.filter(size($"tk") >= 2)
        .select($"doc_id",
          explode(TextOps.shingles($"tk", 2)).as("bg"))
      val v = toks.select(explode($"tk").as("t"))
        .agg(countDistinct($"t").as("v"))
      val cbg = bg.groupBy($"bg").agg(count(lit(1)).as("c12"))
      val ch = bg.select(expr("split_part(bg, ' ', 1)").as("w1"))
        .groupBy($"w1").agg(count(lit(1)).as("c1"))
      bg.join(cbg, "bg")
        .join(ch, expr("split_part(bg, ' ', 1)") === ch("w1"))
        .crossJoin(broadcast(v))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("SUM((1000000 * (c12 + 1)) DIV (c1 + v)) " +
            "DIV COUNT(*)").as("fluency_ppm"))
    }
  )
}
