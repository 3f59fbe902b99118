package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Sixty-third coverage wave: lossless similarity join + mergeable
  * cardinality sketches.
  *
  *  - q219: prefix-filter (AllPairs/PPJoin-family) exact Jaccard join
  *    over per-document 3-gram shingle sets at threshold 0.5.
  *    Candidate pairs are generated only from each document's RAREST
  *    n − ⌈n/2⌉ + 1 shingles under a global (df, h) order — the
  *    classic lossless alternative to the df-cap approximation the
  *    MinHash family uses (Bayardo et al., WWW'07): any pair with
  *    J ≥ t provably shares a prefix element, so the exact-threshold
  *    result is complete WITHOUT ever joining on high-frequency
  *    elements. The threshold test is integer arithmetic (2·∩ ≥ ∪), so
  *    the cut itself can't float-drift. SimJoinSpec proves
  *    losslessness against the brute-force inverted-index join on the
  *    fixture; the oracle re-derives the same prefix algebra
  *    independently in SQL. (Token sets were the first cut — the
  *    corpus' 31-word vocabulary put J ≥ 0.9 on 11k unrelated pairs;
  *    shingles recover the ~dozens of true near-dups.)
  *  - q220: HyperLogLog distinct-shingle cardinality per source, p = 9
  *    (512 registers, 20-bit rho window on the shared mod-P hash).
  *    The register table is the MERGEABLE state: per-source registers
  *    max-merge into the corpus-wide 'ALL' row inside the same query —
  *    the 1000-executor shape where every partition ships 512 bytes,
  *    never a distinct shuffle. Exact counts ride along, so the
  *    artifact carries the sketch's real error (err_ppm) per group,
  *    and the finalize is integer-exact up to ONE shared double
  *    division (see KSql / finalize notes).
  *  - q221: q220 as a STREAMING sketch — registers are the streaming
  *    state (groupBy (source, idx) max(rho), complete mode), finalized
  *    in batch from the sink. Duplicate shingles need no dedup:
  *    max(rho) is idempotent, which is exactly why HLL is the
  *    production answer to streaming COUNT DISTINCT. Shares q220's
  *    per-source oracle rows verbatim minus the merged row.
  */
object Extras63 {

  private val one = lit(1)

  // ---- q219 geometry --------------------------------------------------
  // threshold t = 1/2, prefix length p = n - ceil(n/2) + 1 (lossless
  // for Jaccard at t: overlap >= ceil(t*n) forces a shared prefix token
  // once both sides index under one total order)

  // ---- q220/q221 HLL geometry (shared by Spark plan and oracle) -------
  private[queries] val M = 512          // registers (p = 9)
  private[queries] val RhoBits = 20     // rho window above the index bits

  /** SQL for rho = leading-zero count of the 20-bit window + 1 (window
    * zero → 21): a comparison cascade against powers of two — branch-
    * free of log()/floor(log2) float edges, identical text in both
    * engines. */
  private[queries] def rhoSql(rem: String): String = {
    val whens = (1 to RhoBits).map { j =>
      s"WHEN $rem >= ${1L << (RhoBits - j)} THEN $j"
    }.mkString(" ")
    s"(CASE $whens ELSE ${RhoBits + 1} END)"
  }

  /** est·1000 numerator: alpha_m · m² · 2^RhoMax · 1000, computed ONCE
    * in Scala and embedded as a string→DOUBLE cast. Embedding the
    * arithmetic as SQL text looked engine-identical but was not:
    * DuckDB types the literal `0.7213` as DECIMAL(5,4) — its division
    * chain then rounds differently from Spark's doubles and the floor
    * flipped by 1 milli-unit at sf0.01. A shortest-round-trip decimal
    * string cast to DOUBLE parses to the same IEEE value in both
    * engines (Java parseDouble and DuckDB fast_float are both
    * correctly rounded). */
  private[queries] val RhoMax = RhoBits + 1
  private[queries] val K: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * (1L << RhoMax).toDouble * 1000
  private[queries] val KSql = s"CAST('$K' AS DOUBLE)"

  /** Finalize a register table (grp, idx, r) → (grp, regs_used,
    * v_empty, est_milli, exact, err_ppm).
    *
    * Z = Σ 2^-r + empty is DYADIC with denominator 2^21, so it is
    * carried as the exact integer Zint = Σ 2^(21-r) + empty·2^21 and
    * the whole finalize does exactly ONE floating op — K / Zint, the
    * same two bit-identical operands in both engines — before flooring
    * to integer milli-units. The first cut rounded a chain of double
    * ops to 3 decimals and hash-failed at sf0.01: Spark's round()
    * (shortest-decimal BigDecimal, HALF_UP) and DuckDB's (scaled
    * multiply) disagree when the value sits ~1 ulp from a .0005
    * boundary. Integer arithmetic is the fix, not a wider round. */
  private def finalize(regs: DataFrame, exact: DataFrame): DataFrame =
    regs
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("regs_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - r)"))
          .as("zi0"))
      .select(col("grp"),
        col("regs_used").cast(LongType).as("regs_used"),
        (lit(M) - col("regs_used")).cast(LongType).as("v_empty"),
        expr(s"CAST(floor($KSql / (zi0 + ($M - regs_used) * " +
          s"CAST(${1L << RhoMax} AS BIGINT))) AS BIGINT)").as("est_milli"))
      .join(exact, "grp")
      .withColumn("err_ppm",
        expr("CAST(abs(est_milli - 1000 * exact) * 1000000 DIV " +
          "(1000 * exact) AS BIGINT)"))

  /** Oracle fragment: registers per (grp, idx) from a (grp, h) CTE
    * named `gt` (h = the shared mod-P shingle hash: low 9 bits index,
    * next 20 bits the rho window), finalized with the same
    * arithmetic. */
  private def oracleHll(rowsSel: String): String = {
    s"""regs AS (SELECT grp, h % $M AS idx,
       |    MAX(${rhoSql(s"((h // $M) % ${1L << RhoBits})")}) AS r
       |  FROM gt GROUP BY 1, 2),
       |fin AS (SELECT grp, COUNT(*) AS regs_used,
       |    CAST(SUM(CAST(1 AS BIGINT) << ($RhoMax - r)) AS BIGINT) AS zi0
       |  FROM regs GROUP BY 1),
       |ex AS (SELECT grp, COUNT(DISTINCT h) AS exact FROM gt GROUP BY 1),
       |est AS (SELECT f.grp, f.regs_used,
       |    CAST(floor($KSql / (f.zi0 + ($M - f.regs_used)
       |      * CAST(${1L << RhoMax} AS BIGINT))) AS BIGINT) AS est_milli,
       |    ex.exact
       |  FROM fin f JOIN ex USING (grp))
       |SELECT grp AS $rowsSel, CAST(regs_used AS BIGINT) AS regs_used,
       |  CAST($M - regs_used AS BIGINT) AS v_empty, est_milli,
       |  CAST(exact AS BIGINT) AS exact,
       |  CAST(abs(est_milli - 1000 * exact) * 1000000
       |    // (1000 * exact) AS BIGINT) AS err_ppm
       |FROM est""".stripMargin
  }

  /** Spark-side register table (grp, idx, r) from a (grp, h) frame —
    * duplicate h's are harmless (max is idempotent), which is the
    * whole streaming story of q221. */
  private def registers(gt: DataFrame): DataFrame =
    gt.select(col("grp"), (col("h") % M).as("idx"),
        expr(rhoSql(s"((h div $M) % ${1L << RhoBits})")).as("rho"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("r"))

  val all: Seq[Qry] = Seq(

    // ---- prefix-filter exact similarity join ----------------------------
    Qry(
      "q219_prefix_simjoin",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |dft AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY 1),
         |n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |rk AS (SELECT t.doc_id, t.h, n.n, row_number() OVER (
         |    PARTITION BY t.doc_id ORDER BY d.df, t.h) AS rn
         |  FROM sh t JOIN dft d USING (h) JOIN n USING (doc_id)),
         |pf AS (SELECT doc_id, h FROM rk
         |  WHERE rn <= n - (n + 1) // 2 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pf a JOIN pf b ON a.h = b.h AND a.doc_id < b.doc_id),
         |inter AS (SELECT c.id_a, c.id_b,
         |    CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM cand c
         |  JOIN sh ta ON ta.doc_id = c.id_a
         |  JOIN sh tb ON tb.doc_id = c.id_b AND tb.h = ta.h
         |  GROUP BY 1, 2)
         |SELECT i.id_a, i.id_b, i.inter,
         |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
         |  round(CAST(i.inter AS DOUBLE)
         |    / (na.n + nb.n - i.inter), 6) AS jac
         |FROM inter i JOIN n na ON na.doc_id = i.id_a
         |JOIN n nb ON nb.doc_id = i.id_b
         |WHERE 2 * i.inter >= na.n + nb.n - i.inter""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      // set elements = distinct 3-gram shingle HASHES (the canonical
      // dedup representation — token sets are too coarse on this
      // corpus: J >= 0.9 held for 11k token-set pairs vs the ~1k real
      // shingle-level near-dups; a residual 60-bit collision merges
      // identically in both engines)
      val tok = graft.operators.Staging.stage(
        graft.operators.Dedup.shingleHashes(
          Tables(spark, dir).documents, "doc_id", "text")
          .select($"doc_id", $"h".as("tok")),
        eager = false)
      val dft = tok.groupBy($"tok").agg(count(one).as("df"))
      val n = tok.groupBy($"doc_id").agg(count(one).as("n"))
      val rk = tok.join(dft, "tok").join(n, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"df", $"tok")))
      // lossless prefix: the rarest n - ceil(n/2) + 1 tokens. Integer
      // `div`, NOT `/`: Spark's `/` is double division, and rn <= 2.5
      // silently shortens the prefix by one for even n — lossy.
      val pf = rk.filter(expr("rn <= n - (n + 1) div 2 + 1"))
        .select($"doc_id", $"tok")
      val cand = pf.as("a").join(pf.as("b"),
        $"a.tok" === $"b.tok" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
        .distinct()
      val ta = tok.select($"doc_id".as("id_a"), $"tok")
      val tb = tok.select($"doc_id".as("id_b"), $"tok")
      val inter = cand.join(ta, "id_a").join(tb, Seq("id_b", "tok"))
        .groupBy($"id_a", $"id_b").agg(count(one).as("inter"))
      inter
        .join(n.select($"doc_id".as("id_a"), $"n".as("n_a")), "id_a")
        .join(n.select($"doc_id".as("id_b"), $"n".as("n_b")), "id_b")
        .filter(lit(2) * $"inter" >= $"n_a" + $"n_b" - $"inter")
        .select($"id_a", $"id_b", $"inter",
          $"n_a".cast(LongType).as("n_a"), $"n_b".cast(LongType).as("n_b"),
          round($"inter".cast("double") /
            ($"n_a" + $"n_b" - $"inter"), 6).as("jac"))
    },

    // ---- HyperLogLog per-source + merged cardinality --------------------
    Qry(
      "q220_hll_cardinality", {
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |td AS (SELECT DISTINCT d.source AS grp, sh.h
           |  FROM sh JOIN documents d USING (doc_id)),
           |gt AS (SELECT grp, h FROM td
           |  UNION ALL SELECT 'ALL' AS grp, h
           |    FROM (SELECT DISTINCT h FROM td)),
           |${oracleHll("source")}""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // counted universe: distinct 3-gram shingle hashes (~1.3k per
      // source, ~16k corpus-wide at sf0.001 — real sketch territory;
      // the corpus' token VOCABULARY is a deliberate 31-word pool, so
      // tokens would exercise nothing)
      val td = graft.operators.Dedup.shingleHashes(
        Tables(spark, dir).documents, "doc_id", "text",
        carry = Seq("source"))
        .select($"source".as("grp"), $"h").distinct()
      // merged 'ALL' row: registers would max-merge identically; the
      // union BEFORE hashing keeps one code path (same rows reach the
      // register aggregate either way — max is associative)
      val gt = td.unionByName(
        td.select($"h").distinct().select(lit("ALL").as("grp"), $"h"))
      val exact = gt.groupBy($"grp")
        .agg(countDistinct($"h").as("exact"))
      finalize(registers(gt), exact)
        .withColumnRenamed("grp", "source")
        .select($"source", $"regs_used", $"v_empty", $"est_milli",
          $"exact".cast(LongType).as("exact"), $"err_ppm")
    },

    // ---- streaming HLL: registers as stream state -----------------------
    Qry(
      "q221_stream_hll", {
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |gt AS (SELECT DISTINCT d.source AS grp, sh.h
           |  FROM sh JOIN documents d USING (doc_id)),
           |${oracleHll("source")}""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // NO dedup anywhere: every shingle occurrence streams into the
      // register aggregate; max(rho) absorbs duplicates — the property
      // that makes HLL the streaming COUNT DISTINCT
      val regsStream = Streams.fileStream(spark, dir, "documents")
        .select($"source".as("grp"),
          TextOps.tokens($"text").as("__tk"))
        .select($"grp",
          explode(array_distinct(TextOps.shingles($"__tk", 3))).as("s"))
        .select($"grp", TextOps.hashMod($"s").as("h"))
        .select($"grp", ($"h" % M).as("idx"),
          expr(rhoSql(s"((h div $M) % ${1L << RhoBits})")).as("rho"))
        .groupBy($"grp", $"idx")
        .agg(max($"rho").as("r"))
      val regs = Streams.runToMemory(regsStream, "complete")
      val exact = graft.operators.Dedup.shingleHashes(
        Tables(spark, dir).documents, "doc_id", "text",
        carry = Seq("source"))
        .select($"source".as("grp"), $"h")
        .groupBy($"grp").agg(countDistinct($"h").as("exact"))
      finalize(regs, exact)
        .withColumnRenamed("grp", "source")
        .select($"source", $"regs_used", $"v_empty", $"est_milli",
          $"exact".cast(LongType).as("exact"), $"err_ppm")
    }
  )
}
