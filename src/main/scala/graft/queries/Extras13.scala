package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Thirteenth coverage wave: equi-depth histograms, per-group mode, and
  * MinHash-estimate-vs-exact validation (closing the sketch-error-budget
  * trio opened by q86/q88). */
object Extras13 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- equi-depth histogram (deciles) --------------------------------
    // ntile over a TOTAL order (value, event_id — no tie ambiguity)
    // partitioned by event_type. Exact equi-depth needs the per-group
    // sort; the approx path at 100 TB is q88's percentile sketch for
    // boundaries + a map-side bucket assignment.
    Qry(
      "q101_decile_stats",
      s"""WITH d AS (SELECT event_type, value,
         |    ntile(10) OVER (PARTITION BY event_type
         |      ORDER BY value, event_id) AS decile
         |  FROM events)
         |SELECT event_type, decile, COUNT(*) AS n,
         |  MIN(value) AS lo, MAX(value) AS hi,
         |  ${dsumSql("value")} AS val_sum
         |FROM d GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"value", $"event_id")
      t(spark, dir).events
        .select($"event_type", $"event_id", $"value")
        .withColumn("decile", ntile(10).over(w))
        .groupBy($"event_type", $"decile")
        .agg(count(one).as("n"), min($"value").as("lo"),
          max($"value").as("hi"), dsum($"value").as("val_sum"))
    },

    // ---- per-group mode (most frequent token per language) -------------
    Qry(
      "q102_mode_token",
      s"""WITH ${TextOps.oracleToksCte},
         |tok AS (SELECT lang, unnest(tk) AS tok FROM toks),
         |cnt AS (SELECT lang, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
         |r AS (SELECT lang, tok, n, row_number() OVER
         |    (PARTITION BY lang ORDER BY n DESC, tok) AS rn
         |  FROM cnt)
         |SELECT lang, tok AS top_tok, n FROM r WHERE rn = 1""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        // mode = min_by over the (-n, tok) ordering struct: identical
        // tie-break to ORDER BY n DESC, tok (highest count, then
        // lexicographically smallest token) but partial-aggregable — a
        // Window.partitionBy(lang) here would sort the whole (lang, tok,
        // n) table on 5 tasks (one per language) at corpus scale, while
        // min_by folds map-side and exchanges one row per group
        t(spark, dir).documents
          .select($"lang", explode(TextOps.tokens($"text")).as("tok"))
          .groupBy($"lang", $"tok").agg(count(one).as("n"))
          .groupBy($"lang")
          .agg(min_by(struct($"tok", $"n"), struct((-$"n").as("nn"), $"tok"))
            .as("m"))
          .select($"lang", $"m.tok".as("top_tok"), $"m.n".as("n"))
    },

    // ---- MinHash estimate vs exact Jaccard -----------------------------
    // For every true near-dup pair (exact J >= 0.5), emit the exact
    // Jaccard AND the K=16 signature-agreement count. Signatures are
    // deterministic (shared md5 hash + modpow coefficient family — see
    // TextOps.aParam), so n_match is gate-checked EXACTLY at any scale;
    // the statistical quality claim (estimate within 0.3 of exact, the
    // binomial-noise budget for K=16) lives in OperatorsSpec at fixture
    // scale, where it is a property of the coefficient family rather
    // than a per-pair oracle assertion — at corpus scale some pair
    // always sits in the binomial tail (observed at 10x: 1 of 250k
    // pairs), which is estimator honesty, not a defect. BOTH the exact
    // pair join and the signatures run over the df-CAPPED shingle space
    // — identical results at fixture scale (max df 25 << 256) and a
    // bounded join at corpus scale.
    Qry(
      "q103_minhash_estimate", {
        val K = 16
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) " +
            s"% ${TextOps.P}) AS m$i").mkString(", ")
        val matchSum = (0 until K).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |sig AS (SELECT doc_id, $minCols FROM shc GROUP BY doc_id),
           |ex AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
           |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
           |exact AS (SELECT da, db,
           |    CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS j
           |  FROM ex JOIN sizes sa ON da = sa.doc_id
           |    JOIN sizes sb ON db = sb.doc_id
           |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared)
           |    >= 0.5e0)
           |SELECT da AS doc_a, db AS doc_b, round(j, 6) AS jaccard,
           |  CAST($matchSum AS BIGINT) AS n_match
           |FROM exact
           |  JOIN sig sa ON da = sa.doc_id
           |  JOIN sig sb ON db = sb.doc_id""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val K = 16
      // ONE staged leaf feeds every consumer (exact-pair self-join ×2
      // sides + signatures): countedShingles stages the raw shingle
      // pipeline once and keeps the df-cap semi-join + size attach lazy
      // above it; the signature aggregate ignores the extra __n column.
      val shc = Dedup.countedShingles(
        Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
        "doc_id")
      val exact = Dedup.jaccardPairsFromCounted(shc, "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b", $"jaccard")
      val sig = Dedup.minhashSignatures(shc, "doc_id", "h", K)
      val sa = sig.select($"doc_id".as("ka") +:
        (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = sig.select($"doc_id".as("kb") +:
        (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)
      val nMatch = (0 until K).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
      exact.join(sa, $"id_a" === $"ka").join(sb, $"id_b" === $"kb")
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
          round($"jaccard", 6).as("jaccard"),
          nMatch.cast("long").as("n_match"))
    }
  )
}
