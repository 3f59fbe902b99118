package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Forty-fifth coverage wave: the three dedup-suite members that close
  * the near-duplicate story opened by q32/q36/q37/q103/q156 —
  *
  *   - q178 containment: the ASYMMETRIC near-dup measure (Broder's
  *     C = shared/min(|A|,|B|)) that catches subset/quote duplication a
  *     Jaccard threshold misses (a short doc embedded in a long one has
  *     C = 1 but J → 0 as the length ratio grows);
  *   - q179 LSH blocking quality: precision/recall of the banded MinHash
  *     candidate set against the exact Jaccard truth — the number a
  *     curation engineer reads before picking (bands, rows) for a
  *     corpus-scale dedup run (q103 validates the ESTIMATOR per pair;
  *     this validates the BLOCKING, which is what bounds the join);
  *   - q180 boilerplate shingles: per-source high-document-frequency
  *     n-grams (site templates, headers/footers). The df-cap inside the
  *     near-dup pipeline DROPS these as noise; boilerplate detection is
  *     the same aggregate read the other way — the hot keys ARE the
  *     signal — so it runs over the UNCAPPED shingle stream with the
  *     source carried through the map stage (no corpus-sized re-join).
  *
  * All three reuse the canonical tokenizer/shingle-hash primitives
  * (operators.TextOps / operators.Dedup), so their DuckDB oracles are
  * generated from the same constants and cannot drift.
  */
object Extras45 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  private val K = 16; private val B = 4; private val R = 4

  val all: Seq[Qry] = Seq(

    // ---- asymmetric containment near-dup pairs -------------------------
    // Threshold as INTEGER arithmetic (shared·5 ≥ 4·min ⇔ C ≥ 0.8) so no
    // boundary pair can flip on FP representation; the reported ratios
    // are round(·, 6) on both engines. Same bounded shared-shingle
    // equi-join as q36 — at 100 TB the df-cap keeps the per-key fanout
    // quadratic in 256, not in corpus size.
    Qry(
      "q178_containment",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
         |          FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, shared,
         |  sa.n AS n_a, sb.n AS n_b,
         |  round(CAST(shared AS DOUBLE) / least(sa.n, sb.n), 6)
         |    AS containment,
         |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6)
         |    AS jaccard
         |FROM pairs
         |  JOIN sizes sa ON da = sa.doc_id
         |  JOIN sizes sb ON db = sb.doc_id
         |WHERE shared * 5 >= least(sa.n, sb.n) * 4""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        Dedup.containmentPairs(
            Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
            "doc_id")
          .filter($"shared" * 5 >= least($"n_a", $"n_b") * 4)
          .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"shared",
            $"n_a", $"n_b",
            round($"containment", 6).as("containment"),
            round($"jaccard", 6).as("jaccard"))
    },

    // ---- LSH blocking precision/recall vs exact truth ------------------
    // One row: TP/FP/FN of the (B=4, R=4) banded candidate set against
    // exact-Jaccard-≥-0.5 truth, both computed over the SAME df-capped
    // shingle space from ONE staged leaf (countedShingles: the expensive
    // tokenize→shingle pipeline runs once; the pair join, the signature
    // aggregate and the band join are lazy consumers above it). The
    // full-outer pair match is bounded by |exact| + |candidates| — never
    // corpus-sized. At scale this is the tuning harness you run on a
    // sampled slice before committing a (bands, rows) choice to the full
    // corpus; the exact side is affordable precisely because it is
    // df-capped and sampled, while the banded side is what ships.
    Qry(
      "q179_lsh_quality", {
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) " +
            s"% ${TextOps.P}) AS m$i").mkString(", ")
        val bandSelects = (0 until B).map { b =>
          val ks = (0 until R).map(r => s"m${b * R + r}").mkString(", ")
          s"SELECT doc_id, $b AS band_idx, concat_ws(':', $ks) AS band_key" +
            " FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
           |ex AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
           |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |exact AS (SELECT da, db
           |  FROM ex JOIN sizes sa ON da = sa.doc_id
           |    JOIN sizes sb ON db = sb.doc_id
           |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared)
           |    >= 0.5e0),
           |sig AS (SELECT doc_id, $minCols FROM shc GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
           |         FROM banded a JOIN banded b
           |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |          AND a.doc_id < b.doc_id),
           |m AS (SELECT (e.da IS NOT NULL) AS is_ex,
           |             (c.ida IS NOT NULL) AS is_cd
           |      FROM exact e FULL JOIN cand c
           |        ON e.da = c.ida AND e.db = c.idb)
           |SELECT
           |  CAST(SUM(CASE WHEN is_ex AND is_cd THEN 1 ELSE 0 END)
           |    AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN is_cd AND NOT is_ex THEN 1 ELSE 0 END)
           |    AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN is_ex AND NOT is_cd THEN 1 ELSE 0 END)
           |    AS BIGINT) AS fn,
           |  round(CAST(SUM(CASE WHEN is_ex AND is_cd THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / greatest(SUM(CASE WHEN is_cd THEN 1 ELSE 0 END), 1), 6)
           |    AS precision,
           |  round(CAST(SUM(CASE WHEN is_ex AND is_cd THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / greatest(SUM(CASE WHEN is_ex THEN 1 ELSE 0 END), 1), 6)
           |    AS recall
           |FROM m""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val shc = Dedup.countedShingles(
        Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
        "doc_id")
      val exact = Dedup.jaccardPairsFromCounted(shc, "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b", one.as("__ex"))
      val sig = Dedup.minhashSignatures(shc, "doc_id", "h", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", B, R)
        .select($"ida", $"idb", one.as("__cd"))
      val m = exact.join(cand,
        $"id_a" === $"ida" && $"id_b" === $"idb", "full_outer")
      val isEx = $"__ex".isNotNull
      val isCd = $"__cd".isNotNull
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      m.agg(
          cnt(isEx && isCd).as("tp"),
          cnt(isCd && !isEx).as("fp"),
          cnt(isEx && !isCd).as("fn"),
          cnt(isCd).as("__nc"),
          cnt(isEx).as("__ne"))
        .select($"tp", $"fp", $"fn",
          round($"tp".cast("double") / greatest($"__nc", lit(1L)), 6)
            .as("precision"),
          round($"tp".cast("double") / greatest($"__ne", lit(1L)), 6)
            .as("recall"))
    },

    // ---- per-source boilerplate shingles -------------------------------
    // Template/boilerplate detection: shingles present in ≥ 10% of a
    // source's documents (and ≥ 3 documents absolutely — a floor that
    // keeps tiny sources from flagging noise). UNCAPPED shingle stream:
    // the near-dup df-cap exists to DROP exactly these hot keys; here
    // they are the signal. Staged-leaf + distinct-document counts +
    // integer ratio floor: operators.Dedup.boilerplateShingles is the
    // single source of truth (the facade and this query both delegate).
    // `source` rides the shingle explode as a carried column (no
    // corpus-sized id join); the per-source totals table — one row per
    // source — broadcasts into the final join. The output is what a
    // curation pass subtracts from documents before near-dup and
    // quality scoring.
    Qry(
      "q180_boilerplate",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |s AS (SELECT sh.doc_id, d.source, sh.h
         |      FROM sh JOIN documents d USING (doc_id)),
         |nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs
         |       FROM s GROUP BY 1),
         |f AS (SELECT source, h, COUNT(DISTINCT doc_id) AS df
         |      FROM s GROUP BY 1, 2)
         |SELECT f.source, f.h, f.df, nd.n_docs,
         |  round(CAST(f.df AS DOUBLE) / nd.n_docs, 6) AS df_ratio
         |FROM f JOIN nd USING (source)
         |WHERE f.df * 10 >= nd.n_docs AND f.df >= 3""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        Dedup.boilerplateShingles(
            Dedup.shingleHashes(t(spark, dir).documents,
              "doc_id", "text", n = 3, carry = Seq("source")),
            "doc_id", "source")
          .select($"source", $"h", $"df", $"n_docs",
            round($"df_ratio", 6).as("df_ratio"))
    }
  )
}
