package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact.{dsum, dsumSql}
import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Ninety-third coverage wave: hybrid-retrieval fusion and rank
  * agreement.
  *
  *  - q278: reciprocal-rank fusion of two lexical retrieval systems
  *    over the same candidate set (docs containing >= 1 query term):
  *    q242's BM25 ranking fused with a plain TF-IDF-sum ranking (no
  *    saturation, no length norm — the two systems genuinely disagree
  *    on long/repetitive docs, which is what fusion exists to hedge).
  *    RRF score = Σ 1e6 DIV (60 + rank) over the rankings an item
  *    appears in (the standard k=60 constant) — EXACT integer
  *    arithmetic over integer ranks, so the fused ranking is
  *    cross-engine provable even though each system's scores are
  *    floats. Scale shape: both scorers share one staged
  *    (doc, term, tf) leaf; rankings are global top via rank-limit
  *    pushdown; the fusion joins two rank-bounded tables.
  *  - q279: Kendall tau between the two rankings, restricted to the
  *    BM25 top-50 (the declared, scale-bounded contract: at 100 TB
  *    the candidate set is corpus-sized but the agreement question is
  *    about what the user SEES — the head). row_number ranks admit no
  *    ties, so tau = (C − D) / (C + D) over all 1225 head pairs in
  *    ppm, pure integers.
  */
object Extras93 {

  private val one = lit(1)
  private val Terms = Seq("stream", "window", "join")
  private val RrfK = 60
  private val TopK = 10
  private val TauHead = 50

  /** Shared oracle CTEs: candidate (doc, tok, tf) + both score tables
    * + both rankings. */
  private def rankCtes: String = {
    val inList = Terms.map(t => s"'$t'").mkString(", ")
    s"""${TextOps.oracleToksCte},
       |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
       |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
       |  WHERE tok IN ($inList) GROUP BY 1, 2),
       |dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM tf GROUP BY 1),
       |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |bs AS (SELECT tf.doc_id,
       |    ln((nn - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)
       |      / (tf + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
       |        / avgdl)) AS s
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
       |  CROSS JOIN nd),
       |bm AS (SELECT doc_id, ${dsumSql("s")} AS score FROM bs
       |       GROUP BY 1),
       |rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC,
       |    doc_id) AS r1 FROM bm),
       |ts2 AS (SELECT tf.doc_id, tf * ln(nn / df) AS s
       |  FROM tf JOIN dft USING (tok) CROSS JOIN nd),
       |ti AS (SELECT doc_id, ${dsumSql("s")} AS score FROM ts2
       |       GROUP BY 1),
       |rt AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC,
       |    doc_id) AS r2 FROM ti)""".stripMargin
  }

  /** Spark twin of [[rankCtes]]: (doc_id, r1) and (doc_id, r2). */
  private def rankings(spark: org.apache.spark.sql.SparkSession,
      dir: String) = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"doc_id", TextOps.tokens($"text").as("tk"))
    val dl = toks.select($"doc_id", size($"tk").cast(LongType).as("dl"))
    // staged: the candidate (doc, term, tf) leaf feeds BOTH scorers
    val tf = Staging.stage(
      toks.select($"doc_id", explode($"tk").as("tok"))
        .filter($"tok".isin(Terms: _*))
        .groupBy($"doc_id", $"tok").agg(count(one).as("tf")),
      eager = false)
    val dft = tf.groupBy($"tok").agg(countDistinct($"doc_id").as("df"))
    val nd = dl.agg(count(one).cast("double").as("nn"),
      (sum($"dl").cast("double") / count(one)).as("avgdl"))
    // q242's term-score text verbatim (one spelling, no drift)
    val bs = tf.join(dft, "tok").join(dl, "doc_id")
      .crossJoin(broadcast(nd))
      .select($"doc_id", expr(
        "ln((nn - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)" +
          " / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))")
        .as("s"))
    val rb = bs.groupBy($"doc_id").agg(dsum($"s").as("score"))
      .withColumn("r1", row_number().over(
        Window.orderBy($"score".desc, $"doc_id")))
      .select($"doc_id", $"r1")
    val ts2 = tf.join(dft, "tok").crossJoin(broadcast(nd))
      .select($"doc_id", expr("tf * ln(nn / df)").as("s"))
    val rt = ts2.groupBy($"doc_id").agg(dsum($"s").as("score"))
      .withColumn("r2", row_number().over(
        Window.orderBy($"score".desc, $"doc_id")))
      .select($"doc_id".as("doc_id2"), $"r2")
    (rb, rt)
  }

  val all: Seq[Qry] = Seq(

    // ---- reciprocal-rank fusion --------------------------------------------
    Qry(
      "q278_rrf_fusion",
      s"""WITH $rankCtes,
         |fused AS (SELECT COALESCE(rb.doc_id, rt.doc_id) AS doc_id,
         |    rb.r1, rt.r2,
         |    COALESCE(1000000 // ($RrfK + rb.r1), 0)
         |      + COALESCE(1000000 // ($RrfK + rt.r2), 0) AS rrf_ppm
         |  FROM rb FULL JOIN rt ON rb.doc_id = rt.doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id)
         |    AS BIGINT) AS rank,
         |  doc_id, r1 AS r_bm25, r2 AS r_tfidf,
         |  CAST(rrf_ppm AS BIGINT) AS rrf_ppm
         |FROM fused
         |QUALIFY rank <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (rb, rt) = rankings(spark, dir)
      val fused = rb.join(rt, $"doc_id" === $"doc_id2", "full")
        .select(coalesce($"doc_id", $"doc_id2").as("doc_id"),
          $"r1", $"r2",
          (coalesce(expr(s"1000000 DIV ($RrfK + r1)"), lit(0L)) +
            coalesce(expr(s"1000000 DIV ($RrfK + r2)"), lit(0L)))
            .as("rrf_ppm"))
      fused.withColumn("rank", row_number().over(
          Window.orderBy($"rrf_ppm".desc, $"doc_id")).cast(LongType))
        .filter($"rank" <= TopK)
        .select($"rank", $"doc_id", $"r1".as("r_bm25"),
          $"r2".as("r_tfidf"), $"rrf_ppm")
    },

    // ---- Kendall tau over the BM25 head ------------------------------------
    Qry(
      "q279_rank_tau",
      s"""WITH $rankCtes,
         |head AS (SELECT rb.doc_id, rb.r1, rt.r2
         |  FROM rb JOIN rt ON rb.doc_id = rt.doc_id
         |  WHERE rb.r1 <= $TauHead),
         |pairs AS (SELECT
         |    CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0
         |      THEN 1 ELSE 0 END AS conc
         |  FROM head a JOIN head b ON a.doc_id < b.doc_id)
         |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS n_items,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(conc) AS BIGINT) AS concordant,
         |  CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
         |  CAST(floor(1000000.0 * (2 * SUM(conc) - COUNT(*))
         |    / COUNT(*)) AS BIGINT) AS tau_ppm
         |FROM pairs""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (rb, rt) = rankings(spark, dir)
      val head = rb.filter($"r1" <= TauHead)
        .join(rt, $"doc_id" === $"doc_id2")
        .select($"doc_id", $"r1", $"r2")
      val pairs = head.select($"doc_id".as("da"), $"r1".as("a1"),
          $"r2".as("a2"))
        .join(head.select($"doc_id".as("db"), $"r1".as("b1"),
          $"r2".as("b2")), $"da" < $"db")
        .select(when((($"a1" - $"b1") * ($"a2" - $"b2")) > 0, 1L)
          .otherwise(0L).as("conc"))
      val nItems = head.agg(count(one).as("n_items"))
      pairs.agg(count(one).as("n_pairs"), sum($"conc").as("concordant"))
        .crossJoin(broadcast(nItems))
        .select($"n_items", $"n_pairs",
          $"concordant",
          ($"n_pairs" - $"concordant").as("discordant"),
          // floor-on-double, not integer DIV: tau can be negative;
          // both engines' integer division truncates toward zero in
          // DuckDB 1.0.0 (probe_parity neg_intdiv), but floor-on-double
          // stays pinned if a DuckDB upgrade changes // semantics
          // (q275's convention)
          expr("CAST(floor(1000000.0 * (2 * concordant - n_pairs)" +
            " / n_pairs) AS BIGINT)").as("tau_ppm"))
    }
  )
}
