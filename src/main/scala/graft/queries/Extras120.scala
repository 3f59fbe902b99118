package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-twentieth coverage wave: priority sampling with an unbiased
  * subset-sum estimator, and entity resolution as a stream.
  *
  *  - q318: Duffield–Lund–Thorup priority sampling (JACM 2007) over
  *    orders weighted by total price: each item draws u = (h+1)/P from
  *    its key's hash (deterministic-uniform — reproducibility is the
  *    pipeline requirement, documented in place of true randomness),
  *    gets priority q = w·P DIV (h+1) (the integer floor of w/u), and
  *    the sample is the top-K priorities with threshold τ = the
  *    (K+1)-th. The DLT estimator Σ max(w, τ) over the sample is
  *    unbiased for the population total under uniform u; the query
  *    outputs the sample, τ, the estimate AND the exact total with the
  *    signed error in ppm — the estimator audits itself in-gate.
  *    Everything is 64-bit integer arithmetic (w·P ≤ 2⁵⁷ at cents
  *    grain); both engines truncate integral division toward zero
  *    (r11 probe-parity check), so the signed err_ppm is engine-exact.
  *    Scale: the only corpus-sized stage is the top-(K+1) rank —
  *    written as row_number + filter, which Spark rewrites to
  *    WindowGroupLimit (per-partition top-K then merge), never a full
  *    global sort; totals ride broadcast 1-row frames.
  *
  *  - q319: q315's entity resolution as a STREAMING match — dirty
  *    probes arrive as a stream and resolve against the STATIC clean
  *    registry (the production shape: a new crawl matched against the
  *    standing entity table; registry side broadcast, stream side
  *    never shuffled for the join). Both blocking passes are
  *    stream-static equi-joins; one streaming aggregation per probe
  *    collects the candidate set (collect_set — state bounded by block
  *    sizes) and folds the best match as min(dist, cid) over
  *    Levenshtein-1 survivors; the accuracy tail runs post-sink.
  *    Shares q315's oracle text VERBATIM — stream == batch in one
  *    hash.
  */
object Extras120 {

  private val K = 64

  val all: Seq[Qry] = Seq(

    Qry(
      "q318_priority_sample",
      s"""WITH it AS (SELECT o_orderkey AS k,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS w,
         |    ${TextOps.oracleHashSql("CAST(o_orderkey AS VARCHAR)")} AS h
         |  FROM orders),
         |pr AS (SELECT k, w, (w * ${TextOps.P}) // (h + 1) AS q FROM it),
         |rk AS (SELECT k, w, q,
         |    row_number() OVER (ORDER BY q DESC, k) AS rnk FROM pr),
         |top AS (SELECT * FROM rk WHERE rnk <= ${K + 1}),
         |tau AS (SELECT MIN(q) AS tau FROM top),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM it),
         |samp AS (SELECT k, w, q, rnk,
         |    GREATEST(w, tau.tau) AS term FROM top CROSS JOIN tau
         |  WHERE rnk <= $K),
         |est AS (SELECT CAST(SUM(term) AS BIGINT) AS est FROM samp)
         |SELECT rnk, k AS orderkey, w AS w_cents, q AS priority,
         |  tau.tau AS tau, est.est AS est_total_cents,
         |  tot.tw AS true_total_cents,
         |  CAST(((est.est - tot.tw) * 1000000) // tot.tw AS BIGINT)
         |    AS err_ppm
         |FROM samp CROSS JOIN tau CROSS JOIN tot CROSS JOIN est"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val it = Tables(spark, dir).orders
        .select($"o_orderkey".cast(LongType).as("k"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("w"),
          TextOps.hashMod($"o_orderkey".cast("string")).as("h"))
      val pr = it.select($"k", $"w",
        expr(s"(w * ${TextOps.P}) DIV (h + 1)").as("q"))
      // row_number + filter → WindowGroupLimit (per-partition top-K,
      // then merge) — never a full global sort
      val top = pr
        .withColumn("rnk",
          row_number().over(Window.orderBy($"q".desc, $"k")))
        .filter($"rnk" <= K + 1)
      val tau = top.agg(min($"q").as("tau"))
      val tot = it.agg(sum($"w").cast(LongType).as("tw"))
      val samp = top.crossJoin(broadcast(tau)).filter($"rnk" <= K)
        .withColumn("term", greatest($"w", $"tau"))
      val est = samp.agg(sum($"term").cast(LongType).as("est"))
      samp.crossJoin(broadcast(tot)).crossJoin(broadcast(est))
        .select($"rnk", $"k".as("orderkey"), $"w".as("w_cents"),
          $"q".as("priority"), $"tau", $"est".as("est_total_cents"),
          $"tw".as("true_total_cents"),
          expr("CAST(((est - tw) * 1000000) DIV tw AS BIGINT)")
            .as("err_ppm"))
    },

    Qry("q319_stream_entity_resolution", Extras117.ErOracle) {
      (spark, dir) =>
      import spark.implicits._
      // static side: the standing registry (batch read, broadcast)
      val reg = Extras117.entities(Tables(spark, dir).documents)
        .select($"doc_id".as("cid"), $"t".as("ct"))
      // stream side: the dirty probes
      val probe = Extras117.dirtyProbes(
        Extras117.entities(Streams.fileStream(spark, dir, "documents")))
      val byPrefix = probe.join(broadcast(reg),
        substring($"d", 1, 4) === substring($"ct", 1, 4))
      val bySuffix = probe.join(broadcast(reg),
        expr("right(d, 4) = right(ct, 4)"))
      // one streaming aggregation: candidate set (dedups the pair seen
      // through both blocking keys; state bounded by block sizes) +
      // best Levenshtein-1 match as a lexicographic (dist, cid) min
      val resolved = byPrefix.unionByName(bySuffix)
        .select($"doc_id", $"cid",
          levenshtein($"d", $"ct").cast(LongType).as("dist"),
          when($"ct" === $"own", 1).otherwise(0).as("corr"))
        .groupBy($"doc_id")
        .agg(collect_set($"cid").as("cands"),
          min(when($"dist" <= 1,
            struct($"dist", $"cid", $"corr"))).as("best"))
      val done = Streams.runToMemory(resolved, "complete")
      // accuracy as a scalar aggregate broadcast back (q318's tot/est
      // pattern) — not an unpartitioned window over the corpus-sized
      // resolved table (r12 verdict). `done` is a materialized memory
      // sink, so branching it twice re-reads cached batch rows.
      val res = done.filter($"best".isNotNull)
        .select($"doc_id", $"best.cid".as("matched_doc"),
          $"best.dist".as("dist"),
          size($"cands").cast(LongType).as("n_cand"),
          $"best.corr".as("correct"))
      val acc = res.agg(
        expr("CAST((1000000 * SUM(correct)) DIV COUNT(*) AS BIGINT)")
          .as("accuracy_ppm"))
      res.crossJoin(broadcast(acc))
    }
  )
}
