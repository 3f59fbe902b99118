package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Dedup, Staging, TextOps}
import graft.sources.Tables

/** Thirty-ninth coverage wave: corpus-curation diagnostics over the
  * dedup/tokenizer families.
  *
  *  - Near-dup source attribution (q161): WHICH sources duplicate each
  *    other — the q36 pair list rolled up to a source×source matrix.
  *    This is the diagnostic a curation team reads before dropping a
  *    crawl: a source pair with high dup mass means one of the two is
  *    redundant, high self-mass means the source re-publishes itself.
  *  - One BPE merge step (q162): the vocabulary-learning primitive.
  *    BPE training is "count adjacent symbol pairs over the word-
  *    frequency table, merge the argmax" iterated; the catalog pins the
  *    first step exactly (top-20 pairs), the same fixed-point-step
  *    discipline as q120 (k-means) and q159 (PageRank).
  *  - Train/val unigram drift (q163): smoothed KL(train‖val) over the
  *    q150 content-hash split, with the top drift-driving tokens. The
  *    release-hygiene twin of q157: leakage says the splits are too
  *    CLOSE, drift says they are too FAR (a skewed split breaks early
  *    stopping); shipping both bounds the split from both sides.
  */
object Extras39 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // q150's split geometry (80/10/10 by content-hash range)
  private val TrainBound = TextOps.P * 8 / 10
  private val ValBound = TextOps.P * 9 / 10
  private val TopK = 20

  val all: Seq[Qry] = Seq(

    // ---- near-dup source-attribution matrix ---------------------------
    // The q36 pair list (staged shared-shingle family, df-capped,
    // jaccard >= 0.5) joined back to the (doc_id, source) projection on
    // each side, normalized to an unordered source pair, and rolled up.
    // Scale shape: the pair list is LSH/df-cap-bounded (never all-pairs)
    // and tiny relative to the corpus; the two source-attach joins
    // shuffle only the pair list against a two-column corpus projection
    // (AQE broadcasts the pair side), and the final aggregate is
    // |sources|^2 rows. avg_jaccard routes through the decimal
    // accumulator so the rollup is order-independent.
    Qry(
      "q161_dup_source_matrix",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
         |          FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |nd AS (SELECT da, db,
         |    CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
         |  FROM pairs
         |    JOIN sizes sa ON da = sa.doc_id
         |    JOIN sizes sb ON db = sb.doc_id
         |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5e0)
         |SELECT LEAST(x.source, y.source) AS src_a,
         |  GREATEST(x.source, y.source) AS src_b,
         |  COUNT(*) AS n_pairs, ${davgSql("jaccard")} AS avg_jaccard
         |FROM nd
         |  JOIN documents x ON nd.da = x.doc_id
         |  JOIN documents y ON nd.db = y.doc_id
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir).documents
      val src = docs.select($"doc_id", $"source")
      Dedup.jaccardPairs(
          Dedup.shingleHashes(docs, "doc_id", "text", 3), "doc_id")
        .filter($"jaccard" >= 0.5)
        .join(src.select($"doc_id".as("id_a"), $"source".as("sa")), "id_a")
        .join(src.select($"doc_id".as("id_b"), $"source".as("sb")), "id_b")
        .groupBy(least($"sa", $"sb").as("src_a"),
          greatest($"sa", $"sb").as("src_b"))
        .agg(count(lit(1)).as("n_pairs"), davg($"jaccard").as("avg_jaccard"))
    },

    // ---- one BPE vocabulary merge step --------------------------------
    // Count adjacent character pairs over the word-FREQUENCY table (not
    // the corpus): the corpus collapses to its vocabulary first (one
    // token explode + hash aggregate — the only corpus-sized pass), and
    // the pair explosion runs over distinct words weighted by corpus
    // frequency. At 100 TB that second stage is vocabulary-bounded
    // (millions of rows, not billions) and the pair aggregate is bounded
    // by alphabet² — the reason real BPE trainers iterate over the word
    // table, re-expressed as two hash aggregates. Top-20 rides the
    // rank-limit pushdown (partial top-k per partition, no global sort).
    Qry(
      "q162_bpe_merge",
      s"""WITH ${TextOps.oracleToksCte},
         |w AS (SELECT unnest(tk) AS w FROM toks),
         |wc AS (SELECT w, COUNT(*) AS f FROM w GROUP BY 1),
         |p AS (SELECT unnest(list_transform(range(1, len(w)),
         |      i -> substr(w, i, 2))) AS pair, f
         |  FROM wc WHERE len(w) >= 2),
         |a AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS n_occ,
         |      COUNT(*) AS n_word_types
         |      FROM p GROUP BY 1)
         |SELECT rn, pair, n_occ, n_word_types
         |FROM (SELECT *, row_number() OVER (ORDER BY n_occ DESC, pair)
         |        AS rn FROM a)
         |WHERE rn <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wc = t(spark, dir).documents
        .select(explode(TextOps.tokens($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
      val agg = wc.filter(length($"w") >= 2)
        .select($"f", explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy($"pair")
        .agg(sum($"f").as("n_occ"), count(lit(1)).as("n_word_types"))
      agg
        .withColumn("rn", row_number().over(
          Window.orderBy($"n_occ".desc, $"pair")))
        .filter($"rn" <= TopK)
        .select($"rn", $"pair", $"n_occ", $"n_word_types")
    },

    // ---- train/val unigram distribution drift -------------------------
    // Add-one-smoothed KL(train‖val) over the joint vocabulary, in ppm
    // (the raw per-token contributions sit at 1e-6 where the decimal
    // accumulator's 6-dp grid would swallow them; scaling by 1e6 FIRST
    // keeps the order-independent sum meaningful). Per-token contribution
    // is row-local double math on exact BIGINT counts — identical IEEE in
    // both engines — and the total routes through Exact.dsum. Scale
    // shape: ONE corpus-sized explode+count per split (partial-agg
    // map-side), then everything downstream is vocabulary-bounded; the
    // joined count table is staged so the totals pass, the contribution
    // pass, and the top-k pass re-read one materialized vocab table
    // instead of re-running the corpus explode three times.
    Qry(
      "q163_unigram_kl",
      s"""WITH sp AS (SELECT doc_id, text,
         |    ${TextOps.oracleHashSql("text")} AS h FROM documents),
         |spl AS (SELECT doc_id, text,
         |    CASE WHEN h < $TrainBound THEN 'train'
         |         WHEN h < $ValBound THEN 'val'
         |         ELSE 'test' END AS split FROM sp),
         |tok AS (SELECT split,
         |    unnest(list_filter(string_split_regex(lower(text),
         |      '${TextOps.TokenReDuck}'), x -> len(x) > 0)) AS tok
         |  FROM spl WHERE split <> 'test'),
         |tc AS (SELECT tok, COUNT(*) AS ct FROM tok
         |       WHERE split = 'train' GROUP BY 1),
         |vc AS (SELECT tok, COUNT(*) AS cv FROM tok
         |       WHERE split = 'val' GROUP BY 1),
         |j AS (SELECT COALESCE(tc.tok, vc.tok) AS tok,
         |    COALESCE(ct, 0) AS ct, COALESCE(cv, 0) AS cv
         |  FROM tc FULL OUTER JOIN vc ON tc.tok = vc.tok),
         |tot AS (SELECT SUM(ct) AS nt, SUM(cv) AS nv, COUNT(*) AS vsz
         |        FROM j),
         |c AS (SELECT tok, ct, cv,
         |    round(1.0e6 * ((ct + 1.0) / (nt + vsz))
         |      * ln(((ct + 1.0) / (nt + vsz)) / ((cv + 1.0) / (nv + vsz))),
         |      6) AS contrib_ppm
         |  FROM j CROSS JOIN tot),
         |k AS (SELECT ${dsumSql("contrib_ppm")} AS kl_ppm FROM c)
         |SELECT rn, tok, ct, cv, contrib_ppm, kl_ppm
         |FROM (SELECT *, row_number() OVER (ORDER BY contrib_ppm DESC, tok)
         |        AS rn FROM c) CROSS JOIN k
         |WHERE rn <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tok = t(spark, dir).documents
        .select(
          when(TextOps.hashMod($"text") < TrainBound, "train")
            .when(TextOps.hashMod($"text") < ValBound, "val")
            .otherwise("test").as("split"),
          explode(TextOps.tokens($"text")).as("tok"))
        .filter($"split" =!= "test")
      val tc = tok.filter($"split" === "train")
        .groupBy($"tok").agg(count(lit(1)).as("ct"))
      val vc = tok.filter($"split" === "val")
        .groupBy($"tok").agg(count(lit(1)).as("cv"))
      // vocab-sized joined count table: staged once, read three times
      // (totals, contributions+total-KL, top-k) — the corpus-sized
      // explode never re-runs
      val j = Staging.stage(
        tc.join(vc, Seq("tok"), "full_outer")
          .select($"tok", coalesce($"ct", lit(0L)).as("ct"),
            coalesce($"cv", lit(0L)).as("cv")),
        eager = false)
      val tot = j.agg(sum($"ct").as("nt"), sum($"cv").as("nv"),
        count(lit(1)).as("vsz"))
      // emitted contributions are 6-dp-rounded on BOTH sides: the raw
      // ln() differs in the last ulp across libm implementations (one
      // sorted-row mismatch observed at sf0.01), and the window order
      // must use the rounded value so rank assignment can't diverge
      val c = j.crossJoin(broadcast(tot))
        .select($"tok", $"ct", $"cv",
          round(lit(1.0e6) * (($"ct" + lit(1.0)) / ($"nt" + $"vsz"))
            * log((($"ct" + lit(1.0)) / ($"nt" + $"vsz"))
              / (($"cv" + lit(1.0)) / ($"nv" + $"vsz"))), 6)
            .as("contrib_ppm"))
      val k = c.agg(dsum($"contrib_ppm").as("kl_ppm"))
      c.withColumn("rn", row_number().over(
          Window.orderBy($"contrib_ppm".desc, $"tok")))
        .filter($"rn" <= TopK)
        .crossJoin(broadcast(k))
        .select($"rn", $"tok", $"ct", $"cv", $"contrib_ppm", $"kl_ppm")
    }
  )
}
