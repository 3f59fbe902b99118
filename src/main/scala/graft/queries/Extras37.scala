package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact.{dsumSql, dsum}
import graft.operators.{Dedup, TextOps}
import graft.operators.TextOps.P
import graft.sources.Tables

/** Thirty-seventh coverage wave: release hygiene.
  *
  *  - Cross-split leakage audit (q157): before a corpus version ships,
  *    verify no eval-split document has a NEAR-duplicate in train —
  *    exact duplicates can never leak (identical text hashes to the
  *    same split), so the q150 content-hash split is already exact-dup
  *    safe and the residual risk is precisely the near-dup kind this
  *    query hunts with the q37 MinHash geometry.
  *  - Char-trigram LM quality score (q158): the CCNet-style "train a
  *    small LM on trusted text, score candidates by perplexity"
  *    filter, with a trigram character model in place of the 5-gram
  *    KenLM — same pipeline shape (model = a broadcastable count
  *    table, scoring = one map-side pass + per-doc rollup), fully
  *    oracle-checkable because the model is a deterministic aggregate
  *    of the train split rather than an opaque binary.
  */
object Extras37 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // q150's split geometry (80/10/10 by content-hash range)
  private val TrainBound = TextOps.P * 8 / 10
  private val ValBound = TextOps.P * 9 / 10
  // q37/q103/q156's MinHash geometry
  private val K = 16; private val B = 4; private val R = 4

  private def splitCol(h: org.apache.spark.sql.Column) =
    when(h < TrainBound, "train").when(h < ValBound, "val")
      .otherwise("test")

  private val splitSqlCase =
    s"""CASE WHEN h < $TrainBound THEN 'train'
       |     WHEN h < $ValBound THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- cross-split near-dup leakage audit ---------------------------
    // Eval-side (val+test) bands probe the train-side bands; candidates
    // are verified against the full signatures (>= K/2 matching
    // min-hashes, est Jaccard >= 0.5) and rolled up per leaked eval
    // doc. The corpus is banded ONCE (one staged signature frame feeds
    // both sides, as in q156) and train never self-joins. At 100 TB
    // `split` is a stored column of the corpus table (the q150
    // assignment is pure map-side), the train band index is the same
    // stored table q156 probes, and the verdict join shuffles on
    // (band_idx, band_key) — bounded by bucket width, never all-pairs.
    Qry(
      "q157_split_leakage", {
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) % $P) AS m$i")
          .mkString(", ")
        val bandSelects = (0 until B).map { b =>
          val ks = (0 until R).map(r => s"m${b * R + r}").mkString(", ")
          s"SELECT doc_id, $b AS band_idx, concat_ws(':', $ks) AS band_key FROM sig"
        }.mkString("\n  UNION ALL ")
        val matchSum = (0 until K).map(i =>
          s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |sp AS (SELECT doc_id,
           |    ${TextOps.oracleHashSql("text")} AS h FROM documents),
           |spl AS (SELECT doc_id, $splitSqlCase AS split FROM sp),
           |bsp AS (SELECT b.doc_id, b.band_idx, b.band_key, s.split
           |        FROM banded b JOIN spl s ON b.doc_id = s.doc_id),
           |cand AS (SELECT DISTINCT e.doc_id AS eid, e.split AS esplit,
           |           tr.doc_id AS tid
           |         FROM (SELECT * FROM bsp WHERE split <> 'train') e
           |         JOIN (SELECT * FROM bsp WHERE split = 'train') tr
           |           ON e.band_idx = tr.band_idx
           |          AND e.band_key = tr.band_key),
           |ver AS (SELECT eid, esplit, tid, $matchSum AS n_match
           |        FROM cand c
           |          JOIN sig sa ON c.eid = sa.doc_id
           |          JOIN sig sb ON c.tid = sb.doc_id)
           |SELECT eid AS doc_id, esplit AS split,
           |  COUNT(*) AS n_leaks,
           |  CAST(MAX(n_match) AS DOUBLE) / $K AS worst_est
           |FROM ver WHERE n_match >= ${K / 2}
           |GROUP BY 1, 2""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir).documents
      val spl = d.select($"doc_id",
        splitCol(TextOps.hashMod($"text")).as("split"))
      val sig = Dedup.minhashSignatures(
        Dedup.shingleHashes(d, "doc_id", "text"), "doc_id", "h", K)
      val bsp = Dedup.lshBands(sig, "doc_id", B, R).join(spl, "doc_id")
      val evalB = bsp.filter($"split" =!= "train")
        .select($"doc_id".as("eid"), $"split".as("esplit"),
          $"band_idx", $"band_key")
      val trainB = bsp.filter($"split" === "train")
        .select($"doc_id".as("tid"), $"band_idx".as("bi2"),
          $"band_key".as("bk2"))
      val cand = evalB.join(trainB,
          $"band_idx" === $"bi2" && $"band_key" === $"bk2")
        .select($"eid", $"esplit", $"tid").distinct()
      val sa = sig.select($"doc_id".as("ka") +:
        (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = sig.select($"doc_id".as("kb") +:
        (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)
      val nMatch = (0 until K).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
      cand.join(sa, $"eid" === $"ka").join(sb, $"tid" === $"kb")
        .select($"eid", $"esplit", nMatch.as("n_match"))
        .filter($"n_match" >= K / 2)
        .groupBy($"eid", $"esplit")
        .agg(count(lit(1)).as("n_leaks"),
          (max($"n_match").cast("double") / K).as("worst_est"))
        .select($"eid".as("doc_id"), $"esplit".as("split"),
          $"n_leaks", $"worst_est")
    },

    // ---- char-trigram LM perplexity scoring ---------------------------
    // Model: trigram conditional P(c3 | c1c2) with add-one smoothing
    // over the train split's third-character alphabet, all derived as
    // aggregates of the train text (no RNG, no opaque artifact — the
    // "LM" is two count tables plus one scalar). Score: mean negative
    // log-likelihood per eval-doc trigram; high avg_nll = unlike the
    // training distribution (the CCNet keep/drop signal). Scale shape:
    // the model tables are bounded by alphabet^3 regardless of corpus
    // size → broadcast; scoring is one map-side explode + two
    // broadcast lookups + a per-doc partial+final rollup. The nll sum
    // routes through the decimal accumulator (Exact.dsum) so the
    // per-doc mean is order-independent and hash-matches the oracle.
    Qry(
      "q158_trigram_lm_score",
      s"""WITH sp AS (SELECT doc_id, text,
         |    ${TextOps.oracleHashSql("text")} AS h FROM documents),
         |spl AS (SELECT doc_id, text, $splitSqlCase AS split FROM sp),
         |trn AS (SELECT unnest(list_transform(range(1, len(text) - 1),
         |      i -> substr(text, i, 3))) AS g
         |  FROM spl WHERE split = 'train'),
         |tc AS (SELECT g, COUNT(*) AS c FROM trn GROUP BY 1),
         |pc AS (SELECT substr(g, 1, 2) AS p, SUM(c) AS pcnt
         |       FROM tc GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT substr(g, 3, 1)) AS vsz FROM tc),
         |ev AS (SELECT doc_id, split,
         |    unnest(list_transform(range(1, len(text) - 1),
         |      i -> substr(text, i, 3))) AS g
         |  FROM spl WHERE split <> 'train'),
         |sc AS (SELECT e.doc_id, e.split,
         |    -ln((COALESCE(tc.c, 0) + 1.0) / (COALESCE(pc.pcnt, 0) + vsz))
         |      AS nll
         |  FROM ev e
         |    LEFT JOIN tc ON e.g = tc.g
         |    LEFT JOIN pc ON substr(e.g, 1, 2) = pc.p
         |    CROSS JOIN v)
         |SELECT doc_id, split, COUNT(*) AS n_tri,
         |  ${dsumSql("nll")} / COUNT(*) AS avg_nll
         |FROM sc GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val spl = t(spark, dir).documents
        .select($"doc_id", $"text",
          splitCol(TextOps.hashMod($"text")).as("split"))
      // explode guard: sequence(1, len-2) DESCENDS for len < 3 — the
      // when-null branch is dropped by non-outer explode (q155 pattern)
      def triExplode = explode(when(length($"text") >= 3, expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")))
      val trn = spl.filter($"split" === "train")
        .select(triExplode.as("g"))
      val tc = trn.groupBy($"g").agg(count(lit(1)).as("c"))
      val pc = tc.groupBy(substring($"g", 1, 2).as("p"))
        .agg(sum($"c").as("pcnt"))
      val v = tc.agg(
        countDistinct(substring($"g", 3, 1)).as("vsz"))
      spl.filter($"split" =!= "train")
        .select($"doc_id", $"split", triExplode.as("g"))
        .join(broadcast(tc), Seq("g"), "left_outer")
        .join(broadcast(pc), substring($"g", 1, 2) === $"p", "left_outer")
        .crossJoin(broadcast(v))
        .select($"doc_id", $"split",
          (-log((coalesce($"c", lit(0L)) + lit(1.0)) /
            (coalesce($"pcnt", lit(0L)) + $"vsz"))).as("nll"))
        .groupBy($"doc_id", $"split")
        .agg(count(lit(1)).as("n_tri"),
          (dsum($"nll") / count(lit(1))).as("avg_nll"))
    }
  )
}
