package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Thirty-eighth coverage wave: graph centrality + weighted curation
  * sampling.
  *
  *  - PageRank power-iteration step (q159): one step of weighted
  *    PageRank over the customer→supplier purchase graph, in exact
  *    FIXED-POINT arithmetic. A double formulation can never
  *    hash-match across engines (per-node inflow is an
  *    accumulation-order-dependent double sum, and unlike money
  *    values the summands aren't 6-dp-exact), so the step is defined
  *    in parts-per-million with BIGINT floor division — the same
  *    move q81/q110 make by keeping regression moments integral. The
  *    iterated loop lives in operators (ConnectedComponents shows the
  *    loop discipline); the catalog pins one exactly-checkable step.
  *  - Weighted sample without RNG (q160): Efraimidis–Spirakis
  *    weighted reservoir sampling with the content hash as the
  *    uniform draw — key = ln(u)/w, top-k per stratum by key. The
  *    ordering transform ln(u^(1/w)) is monotone, so this IS the E-S
  *    scheme, but deterministic: re-runs, repartitions, and both
  *    engines draw the identical sample.
  */
object Extras38 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  /** Fixed-point scale: ranks in parts-per-million of uniform mass. */
  private val Ppm = 1000000L
  private val SampleK = 10

  val all: Seq[Qry] = Seq(

    // ---- one weighted-PageRank step, exact fixed-point ----------------
    // Edges: (custkey → suppkey) with multiplicity = lineitem count.
    // Starting from the uniform vector, one damped step in ppm units:
    //   inflow_ppm(d) = Σ_src  (1e6 · w(s,d)) DIV W(s)
    //   rank_ppm(d)   = 150000 + (85 · inflow_ppm(d)) DIV 100
    // Every operation is BIGINT (DIV = floor division in both
    // engines), so the result is bit-exact regardless of partial-agg
    // order. Scale shape: edge build = one orders⋈lineitem join
    // shuffled on orderkey; out-strength = agg on src; inflow = agg on
    // dst — the canonical two-shuffle PR step. Across iterations the
    // rank vector stays co-partitioned with edges on dst and only the
    // (node, rank) table moves; 1e6·w ≤ 9.2e18/|W| guards overflow up
    // to ~10^12-row per-src strength.
    Qry(
      "q159_pagerank_step",
      s"""WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst,
         |    COUNT(*) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |os AS (SELECT src, SUM(w) AS tw FROM e GROUP BY 1),
         |inf AS (SELECT dst, COUNT(*) AS n_in,
         |    SUM(($Ppm * w) // tw) AS inflow_ppm
         |  FROM e JOIN os USING (src) GROUP BY 1)
         |SELECT dst AS suppkey, CAST(n_in AS BIGINT) AS n_in,
         |  CAST(inflow_ppm AS BIGINT) AS inflow_ppm,
         |  CAST(150000 + (85 * inflow_ppm) // 100 AS BIGINT) AS rank_ppm
         |FROM inf""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = t(spark, dir)
      // the edge list feeds BOTH the out-strength agg and the inflow
      // join — stage it so orders⋈lineitem runs once (the first plan
      // dump showed the full join+agg duplicated under each consumer);
      // an iterated PR loop would keep exactly this frame materialized
      val e = graft.operators.Staging.stage(
        tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey".as("src"), $"l_suppkey".as("dst"))
          .agg(count(lit(1)).as("w")),
        eager = false)
      val os = e.groupBy($"src").agg(sum($"w").as("tw"))
      e.join(os, "src")
        .select($"dst", expr(s"($Ppm * w) DIV tw").as("c"))
        .groupBy($"dst")
        .agg(count(lit(1)).as("n_in"), sum($"c").as("inflow_ppm"))
        .select($"dst".as("suppkey"), $"n_in", $"inflow_ppm",
          (lit(150000L) + expr("(85 * inflow_ppm) DIV 100"))
            .as("rank_ppm"))
    },

    // ---- deterministic weighted sample (Efraimidis–Spirakis) ----------
    // Inclusion probability ∝ n_chars (the curation weight); the
    // uniform draw u = (hash(text)+1)/P is content-derived, so the
    // sample is a pure function of the corpus. Top-k per language by
    // ln(u)/w rides the rank-limit pushdown (WindowGroupLimit keeps a
    // partial top-k per input partition BEFORE the per-lang exchange —
    // q150's shape), so the corpus is never globally sorted and the
    // shuffled volume is k rows per partition per stratum. The sort
    // key is row-local double math on identical inputs in both
    // engines and never emitted.
    Qry(
      "q160_weighted_sample",
      s"""WITH k AS (SELECT lang, doc_id, n_chars,
         |    ln((${TextOps.oracleHashSql("text")} + 1.0e0)
         |        / ${TextOps.P}) / n_chars AS key
         |  FROM documents)
         |SELECT lang, rn, doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |FROM (SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY key DESC, doc_id) AS rn FROM k)
         |WHERE rn <= $SampleK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"lang")
        .orderBy($"key".desc, $"doc_id")
      t(spark, dir).documents
        .select($"lang", $"doc_id", $"n_chars",
          (log((TextOps.hashMod($"text") + lit(1.0)) / TextOps.P)
            / $"n_chars").as("key"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= SampleK)
        .select($"lang", $"rn", $"doc_id", $"n_chars")
    }
  )
}
