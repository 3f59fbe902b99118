package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{TextOps, Vectors}
import graft.sources.Tables

/** Hundred-twenty-second coverage wave: rank-sensitive ANN evaluation,
  * per-stratum priority sampling, and the bounded-influence mean.
  *
  *  - q322: MRR@10 for the IVF ANN path — recall (q292) says whether
  *    the true neighbor is retrieved at all; mean reciprocal rank says
  *    WHERE it lands: per query (q41's query set), the exact nearest
  *    neighbor is computed brute-force, the 1-probe IVF candidate list
  *    (q42's nearest-centroid cells) is ranked by cosine, and the
  *    query scores 10⁶ DIV rank if the true neighbor appears in the
  *    top 10, else 0 — reciprocal rank with the standard cutoff, kept
  *    exact by integral division (no transcendental discounts; MRR is
  *    the rank-eval member whose discount IS rational). The corpus
  *    mrr_ppm rides a bounded window. Completes the eval tier next to
  *    recall (q292), AUC (q281/q296), RRF (q278) and capture (q282).
  *
  *  - q323: q318's Duffield–Lund–Thorup priority sampling run
  *    PER STRATUM (order status) — the training-mix shape: one
  *    bounded sample per source with an unbiased per-stratum total
  *    estimator, all strata in one pass. Per-stratum threshold τ,
  *    Σ max(w, τ) estimator, exact stratum total and signed err_ppm,
  *    gated row-by-row. The per-stratum rank is a partitioned
  *    row_number + filter — WindowGroupLimit per group, never a
  *    global sort.
  *
  *  - q324: 10% trimmed mean of customer balance per nation — the
  *    robust-statistics tier's bounded-influence MEAN next to the
  *    median/MAD pair (q295): drop ⌊n/10⌋ rows at each tail (exact
  *    order statistics via dual row_numbers, ties broken by key so
  *    both engines trim the identical multiset) and average the
  *    interior at cents grain. Balances go negative, so the signed
  *    integral divisions exercise the truncate-toward-zero parity
  *    pinned by the r11 probe.
  *
  * Scale shapes: q322's corpus-sized stages are the centroid
  * assignment pass and the per-query-cell candidate scan (queries
  * broadcast); q323/q324 are one window pass over a key-partitioned
  * corpus each.
  */
object Extras122 {

  private val eCte =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  private val nCte =
    "n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nr FROM e)"

  private val StratK = 16

  val all: Seq[Qry] = Seq(

    Qry(
      "q322_ivf_mrr",
      s"""WITH $eCte, $nCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (SELECT e.vec_id, c.cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv, nr AS qnr FROM n
         |      WHERE vec_id < 10),
         |ex AS (SELECT qid, vec_id AS nn FROM (
         |    SELECT q.qid, n.vec_id, row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_dot_product(q.qv, n.v) / (q.qnr * n.nr) DESC,
         |               n.vec_id) AS rn
         |    FROM n, q WHERE n.vec_id <> q.qid) WHERE rn = 1),
         |qa AS (SELECT q.qid, a.cid, q.qv, q.qnr FROM q
         |       JOIN assign a ON a.vec_id = q.qid),
         |cand AS (SELECT qa.qid, n.vec_id,
         |    row_number() OVER (PARTITION BY qa.qid
         |      ORDER BY list_dot_product(qa.qv, n.v) / (qa.qnr * n.nr)
         |        DESC, n.vec_id) AS rnk
         |  FROM qa JOIN assign a2 ON a2.cid = qa.cid
         |  JOIN n ON n.vec_id = a2.vec_id WHERE n.vec_id <> qa.qid),
         |hit AS (SELECT ex.qid, ex.nn, c2.rnk FROM ex
         |  LEFT JOIN cand c2 ON c2.qid = ex.qid AND c2.vec_id = ex.nn
         |    AND c2.rnk <= 10)
         |SELECT qid, nn AS true_nn, CAST(rnk AS BIGINT) AS found_rank,
         |  CAST(COALESCE(1000000 // rnk, 0) AS BIGINT) AS rr_ppm,
         |  CAST(SUM(COALESCE(1000000 // rnk, 0)) OVER ()
         |    // COUNT(*) OVER () AS BIGINT) AS mrr_ppm
         |FROM hit""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val n = e.withColumn("nr", sqrt(Vectors.dot($"v", $"v")))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid",
          Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id", $"cid")
      val q = n.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nr".as("qnr"))
      val wEx = Window.partitionBy($"qid")
        .orderBy($"cos".desc, $"vec_id")
      val ex = n.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (Vectors.dot($"qv", $"v") / ($"qnr" * $"nr")).as("cos"))
        .withColumn("rn", row_number().over(wEx))
        .filter($"rn" === 1).select($"qid", $"vec_id".as("nn"))
      val qa = q.join(assign, $"qid" === assign("vec_id"))
        .select($"qid", $"cid", $"qv", $"qnr")
      val cand = broadcast(qa).join(assign.as("a2"), "cid")
        .join(n.select($"vec_id".as("nid"), $"v", $"nr"),
          $"a2.vec_id" === $"nid")
        .filter($"nid" =!= $"qid")
        .select($"qid", $"nid",
          (Vectors.dot($"qv", $"v") / ($"qnr" * $"nr")).as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")))
      val hit = ex.join(cand,
          cand("qid") === ex("qid") && cand("nid") === ex("nn") &&
            cand("rnk") <= 10, "left_outer")
        .select(ex("qid"), $"nn", $"rnk")
      hit
        .withColumn("rr_ppm",
          coalesce(expr("1000000 DIV rnk"), lit(0L)))
        .withColumn("mrr_ppm",
          expr("CAST(SUM(rr_ppm) OVER () DIV COUNT(*) OVER () " +
            "AS BIGINT)"))
        .select($"qid", $"nn".as("true_nn"),
          $"rnk".cast(LongType).as("found_rank"), $"rr_ppm", $"mrr_ppm")
    },

    Qry(
      "q323_stratified_priority_sample",
      s"""WITH it AS (SELECT o_orderstatus AS stratum, o_orderkey AS k,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS w,
         |    ${TextOps.oracleHashSql("CAST(o_orderkey AS VARCHAR)")} AS h
         |  FROM orders),
         |pr AS (SELECT stratum, k, w,
         |    (w * ${TextOps.P}) // (h + 1) AS q FROM it),
         |rk AS (SELECT stratum, k, w, q, row_number() OVER
         |    (PARTITION BY stratum ORDER BY q DESC, k) AS rnk FROM pr),
         |top AS (SELECT stratum, k, w, q, rnk,
         |    MIN(q) OVER (PARTITION BY stratum) AS tau
         |  FROM rk WHERE rnk <= ${StratK + 1}),
         |tot AS (SELECT stratum, CAST(SUM(w) AS BIGINT) AS tw FROM it
         |        GROUP BY 1),
         |samp AS (SELECT stratum, k, w, q, rnk, tau,
         |    GREATEST(w, tau) AS term FROM top WHERE rnk <= $StratK),
         |est AS (SELECT stratum, CAST(SUM(term) AS BIGINT) AS est
         |        FROM samp GROUP BY 1)
         |SELECT s.stratum, s.rnk, s.k AS orderkey, s.w AS w_cents,
         |  s.tau, est.est AS est_total_cents, tot.tw AS true_total_cents,
         |  CAST(((est.est - tot.tw) * 1000000) // tot.tw AS BIGINT)
         |    AS err_ppm
         |FROM samp s JOIN est ON est.stratum = s.stratum
         |JOIN tot ON tot.stratum = s.stratum""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val it = Tables(spark, dir).orders
        .select($"o_orderstatus".as("stratum"),
          $"o_orderkey".cast(LongType).as("k"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("w"),
          TextOps.hashMod($"o_orderkey".cast("string")).as("h"))
      val pr = it.select($"stratum", $"k", $"w",
        expr(s"(w * ${TextOps.P}) DIV (h + 1)").as("q"))
      val top = pr
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"stratum").orderBy($"q".desc, $"k")))
        .filter($"rnk" <= StratK + 1)
        .withColumn("tau",
          min($"q").over(Window.partitionBy($"stratum")))
      val samp = top.filter($"rnk" <= StratK)
        .withColumn("term", greatest($"w", $"tau"))
      val est = samp.groupBy($"stratum".as("es"))
        .agg(sum($"term").cast(LongType).as("est"))
      val tot = it.groupBy($"stratum".as("ts"))
        .agg(sum($"w").cast(LongType).as("tw"))
      samp.join(broadcast(est), $"stratum" === $"es")
        .join(broadcast(tot), $"stratum" === $"ts")
        .select($"stratum", $"rnk", $"k".as("orderkey"),
          $"w".as("w_cents"), $"tau", $"est".as("est_total_cents"),
          $"tw".as("true_total_cents"),
          expr("CAST(((est - tw) * 1000000) DIV tw AS BIGINT)")
            .as("err_ppm"))
    },

    Qry(
      "q324_trimmed_mean",
      """WITH v AS (SELECT c_nationkey AS g, c_custkey AS id,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |rk AS (SELECT g, id, cents,
        |    row_number() OVER (PARTITION BY g ORDER BY cents, id) AS ra,
        |    row_number() OVER (PARTITION BY g ORDER BY cents DESC,
        |      id DESC) AS rd,
        |    COUNT(*) OVER (PARTITION BY g) AS n FROM v)
        |SELECT g AS nationkey, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(n) // 10 AS BIGINT) AS trimmed_each,
        |  CAST(SUM(CASE WHEN ra > n // 10 AND rd > n // 10
        |      THEN cents END)
        |    // (MAX(n) - 2 * (MAX(n) // 10)) AS BIGINT)
        |    AS trimmed_mean_cents,
        |  CAST(SUM(cents) // MAX(n) AS BIGINT) AS raw_mean_cents
        |FROM rk GROUP BY g""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val v = Tables(spark, dir).customer
        .select($"c_nationkey".cast(LongType).as("g"),
          $"c_custkey".cast(LongType).as("id"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val wG = Window.partitionBy($"g")
      val rk = v
        .withColumn("ra", row_number().over(
          wG.orderBy($"cents", $"id")))
        .withColumn("rd", row_number().over(
          wG.orderBy($"cents".desc, $"id".desc)))
        .withColumn("n", count(lit(1)).over(wG))
      rk.groupBy($"g".as("nationkey"))
        .agg(max($"n").cast(LongType).as("n"),
          expr("CAST(MAX(n) DIV 10 AS BIGINT)").as("trimmed_each"),
          expr("CAST(SUM(CASE WHEN ra > n DIV 10 AND rd > n DIV 10 " +
            "THEN cents END) DIV (MAX(n) - 2 * (MAX(n) DIV 10)) " +
            "AS BIGINT)").as("trimmed_mean_cents"),
          expr("CAST(SUM(cents) DIV MAX(n) AS BIGINT)")
            .as("raw_mean_cents"))
    }
  )
}
