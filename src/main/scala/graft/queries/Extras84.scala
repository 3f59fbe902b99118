package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps, Vectors}
import graft.sources.Tables

/** Eighty-fourth coverage wave: product quantization and exact
  * duplicated-substring removal.
  *
  *  - q260: PQ/ADC similarity scan — the compression rung below q165's
  *    int8 scalar quantization: split Dim=64 into M=4 subspaces,
  *    codebook each subspace (first-K-subvectors seeds, the
  *    q240/q246 convention), encode every vector as M one-byte codes
  *    (64x smaller than float32), then answer top-k by ASYMMETRIC
  *    distance: the query precomputes one M x K lookup table of exact
  *    subspace distances and every stored vector's distance is M table
  *    lookups summed — no float vector is ever touched at scan time.
  *    Output is q240's audit row (recall@k vs the exact brute-force
  *    truth, per query) so the (recall, bytes) trade-off is measured,
  *    not assumed. Scale shape: codes are ONE corpus-sized
  *    encode pass against a 16-row broadcast codebook; the scan is a
  *    map-side fold over a 10-row broadcast LUT table; truth (the
  *    audit's cost, as in q240) is the only full-vector pass.
  *  - q261: exact duplicated-substring removal (the
  *    deduplicate-training-data shape: any W-token run appearing more
  *    than once corpus-wide is removed wherever it repeats, keeping the
  *    first occurrence). Every W=8-token window hashes once; window
  *    occurrences rank corpus-wide per hash by (doc_id, position) —
  *    rank 1 is the kept copy, every later rank is a duplicated span
  *    [p, p+W); per-doc overlapping-or-adjacent spans merge into
  *    maximal islands via the running-max window trick. Because a
  *    duplicated region of length L >= W duplicates ALL its W-windows,
  *    the merged islands are EXACTLY the maximal >=W-token duplicated
  *    regions — shingles give the suffix-array answer at threshold W.
  *    Scale shape: one tokenize pass (staged — feeds sizes AND
  *    shingles), one shuffle on the window hash for the rank, one
  *    shuffle on doc_id for the island merge; everything is linear in
  *    corpus positions, no pair join anywhere.
  */
object Extras84 {

  private val one = lit(1)

  // ---- q260 geometry -----------------------------------------------------
  private val Dim = 64
  /** Subspaces (codes per vector; 1 byte each at K <= 256). */
  private val M = 4
  private val SubDim = Dim / M
  /** Codebook entries per subspace. */
  private val K = 4
  /** Query vectors (vec_id < Q, the q240 convention). */
  private val Q = 10
  private val TopK = 3

  // ---- q261 geometry -----------------------------------------------------
  /** Duplicated-run threshold in tokens (shared with the q290 delta
    * twin — one constant, the two grains cannot drift). */
  private[queries] val W = 8

  // ---- q261/q290 shared island machinery ----------------------------------
  // Package-private so the batch query and its delta twin share ONE
  // implementation (the q227/q234 pattern): duplicated W-token spans
  // (doc_id, s, e) merge into maximal islands via the running-max
  // window trick, then aggregate to per-doc totals.

  private[queries] def islandAgg(dup: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dup.sparkSession
    import spark.implicits._
    val wD = Window.partitionBy($"doc_id").orderBy($"s")
    dup
      .withColumn("pm", max($"e").over(
        wD.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when($"s" > coalesce($"pm", lit(-1L)), 1L).otherwise(0L))
      .withColumn("isl", sum($"ni").over(
        wD.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"isl")
      .agg((max($"e") - min($"s")).as("len"))
      .groupBy($"doc_id")
      .agg(sum($"len").as("dup_tokens"), count(one).as("n_spans"))
      .withColumnRenamed("doc_id", "ddoc")
  }

  /** Per-doc keep report: sizes LEFT JOIN island totals. */
  private[queries] def keepReport(sz: org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = sz.sparkSession
    import spark.implicits._
    sz.join(d, $"doc_id" === $"ddoc", "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        when($"n_tokens" === 0, lit(1000000L))
          .otherwise(expr(
            "1000000 * (n_tokens - COALESCE(dup_tokens, 0))" +
              " DIV n_tokens")).as("keep_ppm"))
  }

  /** Oracle twin of [[islandAgg]]: CTEs from `dupCte` (doc_id, s, e)
    * to the per-doc `d` table. */
  private[queries] def oracleIslandCtes(dupCte: String): String =
    s"""isl AS (SELECT doc_id, s, e,
       |    SUM(CASE WHEN s > COALESCE(pm, -1) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s
       |            ROWS UNBOUNDED PRECEDING) AS isl
       |  FROM (SELECT doc_id, s, e, MAX(e) OVER (PARTITION BY doc_id
       |          ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
       |          AND 1 PRECEDING) AS pm FROM $dupCte)),
       |spans AS (SELECT doc_id, isl, MAX(e) - MIN(s) AS len
       |          FROM isl GROUP BY 1, 2),
       |d AS (SELECT doc_id, CAST(SUM(len) AS BIGINT) AS dup_tokens,
       |      CAST(COUNT(*) AS BIGINT) AS n_spans FROM spans GROUP BY 1)"""
      .stripMargin

  /** Oracle twin of [[keepReport]] (final select over `sz`/`d`). */
  private[queries] val oracleKeepSelect: String =
    s"""SELECT sz.doc_id, n_tokens,
       |  COALESCE(dup_tokens, 0) AS dup_tokens,
       |  COALESCE(n_spans, 0) AS n_spans,
       |  CASE WHEN n_tokens = 0 THEN 1000000
       |    ELSE 1000000 * (n_tokens - COALESCE(dup_tokens, 0))
       |      // n_tokens END AS keep_ppm
       |FROM sz LEFT JOIN d USING (doc_id)""".stripMargin

  /** Oracle fragment: W-token window occurrences (doc_id, p, h) over
    * `toks` — shared by q261 and the q290 delta twin. */
  private[queries] val oracleOccCtes: String =
    s"""occ0 AS (SELECT doc_id,
       |    unnest(list_transform(range(len(tk) - ${W - 1}), i ->
       |      {'p': i, 'g': array_to_string(tk[i + 1 : i + $W], ' ')}))
       |      AS u
       |  FROM toks WHERE len(tk) >= $W),
       |occ AS (SELECT doc_id, CAST(u.p AS BIGINT) AS p,
       |    ${TextOps.oracleHashSql("u.g")} AS h
       |  FROM occ0)""".stripMargin

  /** DF twin of [[oracleOccCtes]]: window occurrences from staged toks. */
  private[queries] def occFrame(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.filter(size($"tk") >= W)
      .select($"doc_id",
        posexplode(TextOps.shingles($"tk", W)).as(Seq("p", "g")))
      .select($"doc_id", $"p".cast(LongType).as("p"),
        TextOps.hashMod($"g").as("h"))
  }

  val all: Seq[Qry] = Seq(

    // ---- product quantization + asymmetric-distance scan ----------------
    Qry(
      "q260_pq_adc",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |cb AS (SELECT m, vec_id AS cid,
         |    v[m * $SubDim + 1 : m * $SubDim + $SubDim] AS csub
         |  FROM e, range($M) t(m) WHERE vec_id < $K),
         |enc AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT e.vec_id, cb.m, cb.cid, row_number() OVER (
         |        PARTITION BY e.vec_id, cb.m ORDER BY
         |          list_reduce(list_prepend(0.0e0,
         |            list_transform(range($SubDim), i ->
         |              (v[m * $SubDim + i + 1] - csub[i + 1])
         |                * (v[m * $SubDim + i + 1] - csub[i + 1]))),
         |            (acc, x) -> acc + x), cb.cid) AS rn
         |    FROM e, cb) WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS codes
         |          FROM enc GROUP BY 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $Q),
         |lutr AS (SELECT qid, m, cid,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(range($SubDim), i ->
         |        (qv[m * $SubDim + i + 1] - csub[i + 1])
         |          * (qv[m * $SubDim + i + 1] - csub[i + 1]))),
         |      (acc, x) -> acc + x) AS qd2
         |  FROM q, cb),
         |lut AS (SELECT qid, list(qd2 ORDER BY m, cid) AS lut
         |        FROM lutr GROUP BY 1),
         |pq AS (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($M), m ->
         |            lut[m * $K + codes[m + 1] + 1])),
         |          (acc, x) -> acc + x), vec_id) AS rn
         |    FROM codes, lut WHERE vec_id <> qid) WHERE rn <= $TopK),
         |truth AS (SELECT qid, vec_id FROM (
         |    SELECT qid, e.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($Dim), i ->
         |            (v[i + 1] - qv[i + 1]) * (v[i + 1] - qv[i + 1]))),
         |          (acc, x) -> acc + x), e.vec_id) AS rn
         |    FROM e, q WHERE e.vec_id <> qid) WHERE rn <= $TopK)
         |SELECT q.qid, CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
         |  1000000 * COUNT(i.vec_id) // $TopK AS recall_ppm
         |FROM q LEFT JOIN (
         |    SELECT t.qid, t.vec_id FROM truth t
         |    JOIN pq p ON t.qid = p.qid AND t.vec_id = p.vec_id) i
         |  ON q.qid = i.qid
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // one staged leaf feeds the encode pass, the query set, and the
      // exact-truth side (the q240 discipline)
      val e = Staging.stage(Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v")),
        eager = false)
      // 16-row codebook: subspace m of seed vector cid
      val cb = e.filter($"vec_id" < K)
        .select($"vec_id".as("cid"),
          explode(sequence(lit(0), lit(M - 1))).as("m"), $"v")
        .select($"m", $"cid",
          slice($"v", $"m" * SubDim + 1, lit(SubDim)).as("csub"))
      // encode: nearest codebook entry per (vector, subspace) — the
      // corpus-sized pass; broadcast codebook, no shuffle until the rank
      val wEnc = Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")
      val codes = e.crossJoin(broadcast(cb))
        .select($"vec_id", $"m", $"cid",
          Vectors.distSq(slice($"v", $"m" * SubDim + 1, lit(SubDim)),
            $"csub").as("d2"))
        .withColumn("rn", row_number().over(wEnc))
        .filter($"rn" === 1)
        .groupBy($"vec_id")
        .agg(expr("transform(array_sort(collect_list(struct(m, cid)))," +
          " p -> p.cid)").as("codes"))
      val q = e.filter($"vec_id" < Q).select($"vec_id".as("qid"),
        $"v".as("qv"))
      // per-query LUT: exact subspace distance to every codebook entry,
      // flattened in (m, cid) order so lut[m*K + code] is the lookup
      val lut = q.crossJoin(broadcast(cb))
        .select($"qid", $"m", $"cid",
          Vectors.distSq(slice($"qv", $"m" * SubDim + 1, lit(SubDim)),
            $"csub").as("qd2"))
        .groupBy($"qid")
        .agg(expr("transform(array_sort(collect_list(struct(m, cid, qd2)))," +
          " p -> p.qd2)").as("lut"))
      // ADC scan: M lookups per stored vector, sequential fold over m —
      // deterministic, and the only per-vector state is the M-byte code
      val wScan = Window.partitionBy($"qid").orderBy($"adc", $"vec_id")
      val pq = codes.crossJoin(broadcast(lut))
        .filter($"vec_id" =!= $"qid")
        .withColumn("adc", expr(
          s"""aggregate(sequence(0, ${M - 1}), cast(0.0 as double),
             |  (acc, m) -> acc + lut[m * $K + codes[m]])""".stripMargin))
        .withColumn("rn", row_number().over(wScan))
        .filter($"rn" <= TopK).select($"qid".as("pqid"),
          $"vec_id".as("pvid"))
      val wTruth = Window.partitionBy($"qid").orderBy($"d2", $"vec_id")
      val truth = e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", Vectors.distSq($"v", $"qv").as("d2"))
        .withColumn("rn", row_number().over(wTruth))
        .filter($"rn" <= TopK)
      val hits = truth.join(pq,
        $"qid" === $"pqid" && $"vec_id" === $"pvid")
        .select($"qid".as("hqid"), $"vec_id".as("hvid"))
      q.join(hits, $"qid" === $"hqid", "left")
        .groupBy($"qid")
        .agg(count($"hvid").as("n_hit"),
          (lit(1000000L) * count($"hvid") / TopK).cast(LongType)
            .as("recall_ppm"))
    },

    // ---- exact duplicated-substring removal ------------------------------
    Qry(
      "q261_substring_dedup",
      s"""WITH ${TextOps.oracleToksCte},
         |sz AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens
         |       FROM toks),
         |$oracleOccCtes,
         |dup AS (SELECT doc_id, p AS s, p + $W AS e FROM (
         |    SELECT doc_id, p, row_number() OVER (PARTITION BY h
         |        ORDER BY doc_id, p) AS rn FROM occ)
         |  WHERE rn > 1),
         |${oracleIslandCtes("dup")}
         |$oracleKeepSelect""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      // staged: the tokenize pass feeds sizes AND shingle positions
      // (the q242 lesson — unstaged, the corpus tokenizes twice)
      val toks = Staging.stage(Tables(spark, dir).documents
        .select($"doc_id", TextOps.tokens($"text").as("tk")),
        eager = false)
      val sz = toks.select($"doc_id",
        size($"tk").cast(LongType).as("n_tokens"))
      // rank 1 per hash = the kept first occurrence; later ranks are
      // duplicated spans — one shuffle on h, linear in positions
      val wH = Window.partitionBy($"h").orderBy($"doc_id", $"p")
      val dup = occFrame(toks).withColumn("rn", row_number().over(wH))
        .filter($"rn" > 1)
        .select($"doc_id", $"p".as("s"), ($"p" + W).as("e"))
      keepReport(sz, islandAgg(dup))
    }
  )
}
