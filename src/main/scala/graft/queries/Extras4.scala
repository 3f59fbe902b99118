package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{TextOps, Vectors}
import graft.operators.TextOps.TokenReDuck
import graft.sources.Tables

/** Fourth coverage wave — the end-to-end LLM-pipeline compositions:
  * IVF-restricted ANN search (cluster assignment bounds the candidate
  * set), TF-IDF scoring, a corpus quality filter, and greedy near-dup
  * removal driven by the Jaccard pair list. */
object Extras4 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- IVF-restricted top-k: search only the query's cluster ---------
    Qry(
      "q63_ivf_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, cid,
        |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
        |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
        |      (acc, x) -> acc + x) AS d2
        |  FROM e, c),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
        |n AS (SELECT e.vec_id, a.cid, v, sqrt(list_dot_product(v, v)) AS nr
        |      FROM e JOIN assign a ON e.vec_id = a.vec_id),
        |q AS (SELECT vec_id AS qid, cid AS qcid, v AS qv, nr AS qnr
        |      FROM n WHERE vec_id < 10),
        |pairs AS (SELECT qid, n.vec_id,
        |    list_dot_product(qv, v) / (qnr * nr) AS cosine
        |  FROM n JOIN q ON n.cid = q.qcid AND n.vec_id <> q.qid)
        |SELECT qid, vec_id AS neighbor_id, rn AS rank, cosine
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cosine DESC, vec_id) AS rn FROM pairs)
        |WHERE rn <= 3""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"cid")
      val n = e.join(assign, $"vec_id" === $"aid")
        .select($"vec_id", $"cid", $"v", Vectors.norm($"v").as("nr"))
      val q = n.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"cid".as("qcid"),
          $"v".as("qv"), $"nr".as("qnr"))
      val wRank = Window.partitionBy($"qid").orderBy($"cosine".desc, $"vec_id")
      n.join(broadcast(q), $"cid" === $"qcid" && $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          Vectors.cosine(Vectors.dot($"qv", $"v"), $"qnr", $"nr").as("cosine"))
        .withColumn("rn", row_number().over(wRank))
        .filter($"rn" <= 3)
        .select($"qid", $"vec_id".as("neighbor_id"), $"rn".as("rank"),
          $"cosine")
    },

    // ---- TF-IDF: top term per doc (log arithmetic parity) --------------
    Qry(
      "q64_tfidf",
      s"""WITH ${TextOps.oracleToksCte},
         |tf AS (SELECT doc_id, tok, COUNT(*) AS f
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
         |  GROUP BY doc_id, tok),
         |nt AS (SELECT doc_id, len(tk) AS ntok FROM toks),
         |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS d FROM tf GROUP BY 1),
         |ndocs AS (SELECT COUNT(*) AS n FROM documents),
         |scored AS (SELECT tf.doc_id AS doc_id, tf.tok AS tok,
         |    (CAST(f AS DOUBLE) / ntok)
         |      * ln(CAST(n AS DOUBLE) / d) AS tfidf
         |  FROM tf
         |    JOIN nt ON tf.doc_id = nt.doc_id
         |    JOIN df ON tf.tok = df.tok
         |  CROSS JOIN ndocs)
         |SELECT doc_id, tok AS top_term, round(tfidf, 6) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, tok) AS rn FROM scored)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir).documents
      val toks = docs.select($"doc_id", TextOps.tokens($"text").as("tk"))
      val tf = toks.select($"doc_id", size($"tk").as("ntok"),
          explode($"tk").as("tok"))
        .groupBy($"doc_id", $"tok")
        .agg(count(one).as("f"), first($"ntok").as("ntok"))
      val df = tf.groupBy($"tok".as("dtok"))
        .agg(countDistinct($"doc_id").as("d"))
      // corpus size rides inside the lazy plan (broadcast 1-row agg), not
      // as an eager count() — no extra scan per invocation
      val nDocs = docs.agg(count(one).cast("double").as("__n"))
      val wTop = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"tok")
      tf.join(df, $"tok" === $"dtok")
        .crossJoin(broadcast(nDocs))
        .select($"doc_id", $"tok",
          (($"f".cast("double") / $"ntok") *
            log($"__n" / $"d")).as("tfidf"))
        .withColumn("rn", row_number().over(wTop))
        .filter($"rn" === 1)
        .select($"doc_id", $"tok".as("top_term"),
          round($"tfidf", 6).as("score"))
    },

    // ---- corpus quality filter (training-data selection) ---------------
    Qry(
      "q65_corpus_filter",
      s"""WITH ${TextOps.oracleToksCte}
         |SELECT lang, COUNT(*) AS n_kept,
         |  CAST(SUM(len(tk)) AS BIGINT) AS tok_budget
         |FROM toks
         |WHERE len(tk) >= 10
         |  AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |    / greatest(length(text), 1) < 0.1e0
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .select($"lang", $"text", TextOps.tokens($"text").as("tk"))
        .filter(size($"tk") >= 10 &&
          (size(regexp_extract_all($"text", lit("[.,!?;:]"), lit(0)))
            .cast("double") / greatest(length($"text"), one)) < 0.1)
        .groupBy($"lang")
        .agg(count(one).as("n_kept"),
          sum(size($"tk").cast(LongType)).as("tok_budget"))
    },

    // ---- greedy near-dup removal (keep lowest doc_id of each pair) -----
    Qry(
      "q66_neardup_dedup",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(graft.operators.Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |drop_list AS (
         |  SELECT DISTINCT b.doc_id AS victim
         |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |    JOIN sizes sa ON a.doc_id = sa.doc_id
         |    JOIN sizes sb ON b.doc_id = sb.doc_id
         |  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*))
         |    >= 0.5e0)
         |SELECT d.doc_id, d.lang, d.n_chars
         |FROM documents d LEFT JOIN drop_list ON d.doc_id = victim
         |WHERE victim IS NULL""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir).documents
      val victims = graft.operators.Dedup
        .jaccardPairs(
          graft.operators.Dedup.shingleHashes(docs, "doc_id", "text"),
          "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_b".as("victim")).distinct()
      docs.join(victims, $"doc_id" === $"victim", "left_anti")
        .select($"doc_id", $"lang", $"n_chars")
    }
  )
}
