package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextOps}
import graft.operators.TextOps.{P, TokenReDuck}
import graft.sources.Tables

/** Text-analysis + deduplication surface over the `documents` fixture
  * (LLM-data-pipeline operators, BASELINE.json): exact dedup, token
  * statistics, quality scoring, language ID, n-gram Jaccard near-dup,
  * MinHash+LSH, SimHash, and document fingerprinting.
  *
  * Every query is oracle-checked: the tokenizer/hash primitives are
  * bit-identical across Spark and DuckDB (see TextOps + ProbeParity).
  * The oracle SQL for MinHash/SimHash is GENERATED from the same K/band
  * constants as the Spark plan, so the two sides cannot drift.
  */
object Text {

  private def docs(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir).documents
  private val one = lit(1)

  private val K = 16; private val B = 4; private val R = 4

  // BPE-ish pre-tokenizer (canonical copy in TextOps; see q78)
  private val BpeTokSql = TextOps.BpeTokSql

  // ---- shared DuckDB CTE fragments (canonical copies in TextOps) ------
  private val toksCte = TextOps.oracleToksCte
  private def hashSql(e: String) = TextOps.oracleHashSql(e)
  private val sh3Cte = TextOps.oracleSh3Cte

  // Spark-side distinct 3-gram shingle hashes per doc (operators.Dedup
  // is the single source of truth for the pipeline).
  private def shingleHashes(d: org.apache.spark.sql.DataFrame) =
    Dedup.shingleHashes(d, "doc_id", "text")

  val all: Seq[Qry] = Seq(

    // ---- exact deduplication (hash groupBy) ----------------------------
    Qry(
      "q32_exact_dedup",
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      docs(spark, dir)
        .groupBy(md5($"text").as("content_hash"))
        .agg(min($"doc_id").as("keep_id"), count(one).as("n_copies"))
    },

    // ---- token statistics per language ---------------------------------
    Qry(
      "q33_token_stats",
      s"""WITH $toksCte
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(tk)) AS BIGINT) AS tok_sum,
         |  CAST(SUM(len(tk)) AS DOUBLE) / COUNT(*) AS tok_avg,
         |  CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS chars_avg
         |FROM toks GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      docs(spark, dir)
        .select($"lang", size(TextOps.tokens($"text")).cast(LongType).as("nt"),
          length($"text").cast(LongType).as("nc"))
        .groupBy($"lang")
        .agg(count(one).as("n_docs"), sum($"nt").as("tok_sum"),
          (sum($"nt").cast("double") / count(one)).as("tok_avg"),
          (sum($"nc").cast("double") / count(one)).as("chars_avg"))
    },

    // ---- BPE-style subword pre-tokenization count ----------------------
    // The GPT-2 pre-tokenizer regex family (contractions, space-prefixed
    // letter/digit/symbol runs, whitespace runs), minus the trailing
    // lookahead RE2 cannot express. Whitespace is an EXPLICIT class —
    // Java's \s includes \x0B, RE2's does not — and the one pattern
    // constant feeds both engines (quote-doubled into the oracle), so
    // the two sides cannot drift. A per-row codegen'd regex scan + one
    // hash agg: embarrassingly parallel at any scale.
    Qry(
      "q78_bpe_tokens",
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '$BpeTokSql'))
         |    ) AS BIGINT) AS bpe_sum,
         |  ROUND(CAST(SUM(len(regexp_extract_all(text, '$BpeTokSql'))
         |    ) AS DOUBLE) / COUNT(*), 6) AS bpe_avg,
         |  CAST(MAX(len(regexp_extract_all(text, '$BpeTokSql'))
         |    ) AS BIGINT) AS bpe_max
         |FROM documents GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      docs(spark, dir)
        .select($"lang", TextOps.bpeTokenCount($"text").as("nb"))
        .groupBy($"lang")
        .agg(count(one).as("n_docs"), sum($"nb").as("bpe_sum"),
          round(sum($"nb").cast("double") / count(one), 6).as("bpe_avg"),
          max($"nb").as("bpe_max"))
    },

    // ---- quality scoring ------------------------------------------------
    Qry(
      "q34_quality_score",
      s"""WITH $toksCte
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tok,
         |  CAST(length(text) AS BIGINT) AS n_char,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |    / greatest(length(text), 1) AS punct_ratio,
         |  CAST(len(regexp_extract_all(lower(text),
         |    '\\b(the|and|of|to|in|is|that|it|was|for)\\b')) AS DOUBLE)
         |    / greatest(len(tk), 1) AS stop_ratio,
         |  CAST(length(array_to_string(tk, '')) AS DOUBLE)
         |    / greatest(length(text), 1) AS alnum_ratio,
         |  0.5e0 * (CAST(len(regexp_extract_all(lower(text),
         |      '\\b(the|and|of|to|in|is|that|it|was|for)\\b')) AS DOUBLE)
         |      / greatest(len(tk), 1))
         |    + 0.3e0 * (CAST(length(array_to_string(tk, '')) AS DOUBLE)
         |      / greatest(length(text), 1))
         |    - 0.2e0 * (CAST(len(regexp_extract_all(text, '[.,!?;:]'))
         |      AS DOUBLE) / greatest(length(text), 1)) AS quality_score,
         |  len(tk) >= 10 AS long_enough
         |FROM toks""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stopRe = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
      val base = docs(spark, dir).select($"doc_id", $"text",
        TextOps.tokens($"text").as("tk"))
        .select($"doc_id",
          size($"tk").cast(LongType).as("n_tok"),
          length($"text").cast(LongType).as("n_char"),
          (size(regexp_extract_all($"text", lit("[.,!?;:]"), lit(0)))
            .cast("double") / greatest(length($"text"), one)).as("punct_ratio"),
          (size(regexp_extract_all(lower($"text"), lit(stopRe), lit(0)))
            .cast("double") / greatest(size($"tk"), one)).as("stop_ratio"),
          (length(concat_ws("", $"tk")).cast("double") /
            greatest(length($"text"), one)).as("alnum_ratio"))
      base.select($"doc_id", $"n_tok", $"n_char", $"punct_ratio",
        $"stop_ratio", $"alnum_ratio",
        (lit(0.5) * $"stop_ratio" + lit(0.3) * $"alnum_ratio"
          - lit(0.2) * $"punct_ratio").as("quality_score"),
        ($"n_tok" >= 10).as("long_enough"))
    },

    // ---- language identification (stopword/CJK heuristic) --------------
    Qry(
      "q35_lang_id", {
        val en = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
        val de = "\\b(der|die|das|und|ist|nicht|ein|zu|den|von)\\b"
        val fr = "\\b(le|la|les|et|est|un|une|des|du|que)\\b"
        val es = "\\b(el|los|las|es|y|una|por|con|para|que)\\b"
        s"""WITH scored AS (
           |  SELECT lang,
           |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh,
           |    len(regexp_extract_all(lower(text), '$en')) AS s_en,
           |    len(regexp_extract_all(lower(text), '$de')) AS s_de,
           |    len(regexp_extract_all(lower(text), '$fr')) AS s_fr,
           |    len(regexp_extract_all(lower(text), '$es')) AS s_es
           |  FROM documents)
           |SELECT lang, CASE
           |    WHEN s_zh > 0 AND s_zh >= greatest(s_en, s_de, s_fr, s_es)
           |      THEN 'zh'
           |    WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
           |    WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
           |    WHEN s_fr >= s_es THEN 'fr'
           |    ELSE 'es' END AS pred_lang,
           |  COUNT(*) AS n
           |FROM scored GROUP BY 1, 2""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      def score(re: String) =
        size(regexp_extract_all(lower($"text"), lit(re), lit(0)))
      val scored = docs(spark, dir).select($"lang",
        size(regexp_extract_all($"text", lit("[一-鿿]"), lit(0))).as("s_zh"),
        score("\\b(the|and|of|to|in|is|that|it|was|for)\\b").as("s_en"),
        score("\\b(der|die|das|und|ist|nicht|ein|zu|den|von)\\b").as("s_de"),
        score("\\b(le|la|les|et|est|un|une|des|du|que)\\b").as("s_fr"),
        score("\\b(el|los|las|es|y|una|por|con|para|que)\\b").as("s_es"))
      scored.select($"lang",
          when($"s_zh" > 0 &&
            $"s_zh" >= greatest($"s_en", $"s_de", $"s_fr", $"s_es"), "zh")
          .when($"s_en" >= greatest($"s_de", $"s_fr", $"s_es"), "en")
          .when($"s_de" >= greatest($"s_fr", $"s_es"), "de")
          .when($"s_fr" >= $"s_es", "fr")
          .otherwise("es").as("pred_lang"))
        .groupBy($"lang", $"pred_lang")
        .agg(count(one).as("n"))
    },

    // ---- n-gram Jaccard near-duplicate pairs ---------------------------
    Qry(
      "q36_ngram_jaccard",
      s"""WITH $toksCte,
         |$sh3Cte,
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
         |          FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b, shared,
         |  sa.n AS n_a, sb.n AS n_b,
         |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
         |FROM pairs
         |  JOIN sizes sa ON da = sa.doc_id
         |  JOIN sizes sb ON db = sb.doc_id
         |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5e0"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.jaccardPairs(shingleHashes(docs(spark, dir)), "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"shared",
          $"n_a", $"n_b", $"jaccard")
    },

    // ---- MinHash + LSH near-duplicate candidates -----------------------
    Qry(
      "q37_minhash_lsh", {
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) % $P) AS m$i")
          .mkString(", ")
        val bandSelects = (0 until B).map { b =>
          val ks = (0 until R).map(r => s"m${b * R + r}").mkString(", ")
          s"SELECT doc_id, $b AS band_idx, concat_ws(':', $ks) AS band_key FROM sig"
        }.mkString("\n  UNION ALL ")
        val matchSum = (0 until K).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH $toksCte,
           |$sh3Cte,
           |sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
           |         FROM banded a JOIN banded b
           |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |          AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, n_match,
           |  CAST(n_match AS DOUBLE) / $K AS est_jaccard
           |FROM (SELECT c.ida AS doc_a, c.idb AS doc_b,
           |        $matchSum AS n_match
           |      FROM cand c
           |        JOIN sig sa ON c.ida = sa.doc_id
           |        JOIN sig sb ON c.idb = sb.doc_id)
           |WHERE n_match >= ${K / 2}""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val sh = shingleHashes(docs(spark, dir))
      val sig = Dedup.minhashSignatures(sh, "doc_id", "h", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", B, R)
      val sa = sig.select($"doc_id".as("ka") +:
        (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = sig.select($"doc_id".as("kb") +:
        (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)
      val nMatch = (0 until K).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
      cand.join(sa, $"ida" === $"ka").join(sb, $"idb" === $"kb")
        .select($"ida".as("doc_a"), $"idb".as("doc_b"),
          nMatch.as("n_match"))
        .filter($"n_match" >= K / 2)
        .withColumn("est_jaccard", $"n_match".cast("double") / K)
    },

    // ---- SimHash near-duplicate histogram (hamming <= 3) ----------------
    // Hamming-LSH banding (Manku/Jain/Sarma, WWW 2007): the 31-bit
    // fingerprint is cut into 4 bands (8+8+8+7 bits); a pair within
    // hamming distance 3 has its <= 3 differing bits in at most 3 bands,
    // so it matches at least one band EXACTLY (pigeonhole) — candidate
    // generation is an equi-join on (band index, band value), complete
    // for d <= 3, never an all-pairs product. The oracle states the same
    // result declaratively (thresholded all-pairs is exact at oracle SF).
    Qry(
      "q38_simhash", {
        val bitSums = (0 until 31).map(j =>
          s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
          .mkString(", ")
        val fpSum = (0 until 31).map(j =>
          s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
        s"""WITH $toksCte,
           |th AS (SELECT DISTINCT doc_id, ${hashSql("tok")} AS h
           |       FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)),
           |bits AS (SELECT doc_id, $bitSums FROM th GROUP BY 1),
           |fp AS (SELECT doc_id, CAST($fpSum AS BIGINT) AS simhash FROM bits),
           |fpc AS (SELECT simhash, COUNT(*) AS c FROM fp GROUP BY 1),
           |cross_pairs AS (
           |  SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming,
           |    a.c * b.c AS w
           |  FROM fpc a JOIN fpc b ON a.simhash < b.simhash
           |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
           |same_pairs AS (
           |  SELECT 0 AS hamming, c * (c - 1) // 2 AS w FROM fpc WHERE c > 1)
           |SELECT CAST(hamming AS BIGINT) AS hamming,
           |  CAST(SUM(w) AS BIGINT) AS n_pairs
           |FROM (SELECT * FROM cross_pairs UNION ALL SELECT * FROM same_pairs)
           |GROUP BY 1""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val tk = docs(spark, dir)
        .select($"doc_id", TextOps.tokens($"text").as("tk"))
      val th = tk.select($"doc_id", explode($"tk").as("tok"))
        .select($"doc_id", TextOps.hashMod($"tok").as("h")).distinct()
      val fp = Dedup.simhash(th, "doc_id", "h")
      // Multiplicity compression: group identical fingerprints first so
      // banding runs over DISTINCT fingerprints weighted by their counts
      // (at scale, near-dup corpora collapse heavily here);
      // same-fingerprint doc pairs contribute c·(c−1)/2 at hamming 0.
      val fpc = fp.groupBy($"simhash").agg(count(one).as("c"))
      // 4 bands over bits [0,8) [8,16) [16,24) [24,31)
      val bandDefs = Seq((0, 8), (8, 8), (16, 8), (24, 7))
      val banded = fpc.select($"simhash", $"c",
          explode(array(bandDefs.zipWithIndex.map { case ((off, w), i) =>
            struct(lit(i).as("bi"),
              shiftright($"simhash", off).bitwiseAND(lit((1L << w) - 1))
                .as("bv"))
          }: _*)).as("b"))
        .select($"simhash", $"c", $"b.bi".as("bi"), $"b.bv".as("bv"))
      val a = banded.select($"simhash".as("fa"), $"c".as("ca"), $"bi", $"bv")
      val b = banded.select($"simhash".as("fb"), $"c".as("cb"),
        $"bi".as("bi2"), $"bv".as("bv2"))
      // a pair can match in several bands — distinct before weighting
      val cross = a.join(b, $"bi" === $"bi2" && $"bv" === $"bv2" &&
          $"fa" < $"fb")
        .select($"fa", $"fb", $"ca", $"cb").distinct()
        .select(bit_count($"fa".bitwiseXOR($"fb")).cast(LongType)
          .as("hamming"), ($"ca" * $"cb").as("w"))
        .filter($"hamming" <= 3)
      val same = fpc.select(lit(0L).as("hamming"),
        // integral DIV: double `/` rounds once c*(c-1) exceeds 2^53
        expr("c * (c - 1) DIV 2").as("w")).filter($"w" > 0)
      cross.unionByName(same)
        .groupBy($"hamming").agg(sum($"w").as("n_pairs"))
    },

    // ---- order-sensitive document fingerprint --------------------------
    Qry(
      "q39_fingerprint",
      s"""WITH $toksCte
         |SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(tk, tok -> ${hashSql("tok")})),
         |    (acc, h) -> (acc * 31 + h) % $P) AS fp,
         |  CAST(len(tk) AS BIGINT) AS n_tokens
         |FROM toks""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      docs(spark, dir).select($"doc_id",
        TextOps.docFingerprint($"text").as("fp"),
        size(TextOps.tokens($"text")).cast(LongType).as("n_tokens"))
    }
  )
}
