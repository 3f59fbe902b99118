package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Twenty-eighth coverage wave: the end-to-end curation funnel — the
  * capstone composition of the training-data pipeline. */
object Extras28 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- corpus curation funnel ----------------------------------------
    // The whole pipeline as one report row per language: raw docs →
    // quality filter (q65's rule) → near-dup removal among the quality
    // survivors (q66's greedy keep-lowest-id over df-capped shingles) →
    // final doc count and token budget. Every stage reuses the library
    // operator, so the funnel is the integration test of the pipeline
    // composition (filters push into the shingle machinery; the dedup
    // join runs over the ALREADY-FILTERED corpus).
    Qry(
      "q143_curation_funnel",
      s"""WITH ${TextOps.oracleToksCte},
         |q AS (SELECT doc_id, lang, tk FROM toks
         |  WHERE len(tk) >= 10
         |    AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / greatest(length(text), 1) < 0.1e0),
         |sh AS (SELECT doc_id, ${TextOps.oracleHashSql("sh")} AS h
         |  FROM (SELECT doc_id,
         |          unnest(list_distinct(list_transform(range(len(tk) - 2),
         |            i -> array_to_string(tk[i+1:i+3], ' ')))) AS sh
         |        FROM q WHERE len(tk) >= 3)),
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |drop_list AS (
         |  SELECT DISTINCT b.doc_id AS victim
         |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |    JOIN sizes sa ON a.doc_id = sa.doc_id
         |    JOIN sizes sb ON b.doc_id = sb.doc_id
         |  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*))
         |    >= 0.5e0),
         |tot AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY 1),
         |fin AS (SELECT q.lang, COUNT(*) AS n_quality,
         |    CAST(SUM(CASE WHEN victim IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_final,
         |    CAST(SUM(CASE WHEN victim IS NULL THEN len(tk) ELSE 0 END)
         |      AS BIGINT) AS tok_budget
         |  FROM q LEFT JOIN drop_list ON q.doc_id = victim
         |  GROUP BY 1)
         |SELECT tot.lang, tot.n_raw, fin.n_quality, fin.n_final,
         |  fin.tok_budget
         |FROM tot JOIN fin ON tot.lang = fin.lang""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val docs = t(spark, dir).documents
        val q = docs
          .select($"doc_id", $"lang", $"text",
            TextOps.tokens($"text").as("tk"))
          .filter(size($"tk") >= 10 &&
            (size(regexp_extract_all($"text", lit("[.,!?;:]"), lit(0)))
              .cast("double") / greatest(length($"text"), one)) < 0.1)
        val victims = Dedup
          .jaccardPairs(Dedup.shingleHashes(
            q.select($"doc_id", $"text"), "doc_id", "text"), "doc_id")
          .filter($"jaccard" >= 0.5)
          .select($"id_b".as("victim")).distinct()
        val fin = q.join(victims, $"doc_id" === $"victim", "left")
          .groupBy($"lang")
          .agg(count(one).as("n_quality"),
            sum(when($"victim".isNull, 1L).otherwise(0L)).as("n_final"),
            sum(when($"victim".isNull, size($"tk").cast("long"))
              .otherwise(0L)).as("tok_budget"))
        docs.groupBy($"lang").agg(count(one).as("n_raw"))
          .join(fin, Seq("lang"))
          .select($"lang", $"n_raw", $"n_quality", $"n_final",
            $"tok_budget")
    }
  )
}
