package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact.{davg, davgSql, dsum, dsumSql}
import graft.operators.{Staging, Vectors}
import graft.sources.Tables

/** Hundred-first coverage wave: IVF-PQ with RESIDUAL encoding — the
  * FAISS-default IVFADC layout, measured against q270's no-residual
  * composition at the SAME byte budget.
  *
  *  - q292: q270 encodes the raw vector x with PQ inside each coarse
  *    cell; production IVFADC encodes the RESIDUAL r = x − c(cell)
  *    instead, because residuals concentrate near the cell center so a
  *    K-entry sub-codebook spends its resolution on a smaller ball.
  *    Two upgrades over q270's geometry make the comparison the
  *    production shape rather than a strawman:
  *      1. the coarse quantizer is TRAINED — one exact Lloyd round
  *         (q246's decimal-mean proof shape: per-component davg, one
  *         deterministic double division) moves the 8 seed centroids to
  *         their cell means before anything is encoded. Residuals
  *         w.r.t. arbitrary SAMPLE vectors are differences of random
  *         unit vectors (E‖x−s‖² = 2 > 1 = E‖x‖² on this corpus) and
  *         measurably LOSE to raw encoding; residuals w.r.t. MEANS are
  *         the layout FAISS actually ships.
  *      2. the PQ codebooks seed from vectors 8..11 — outside the
  *         centroid set, because a centroid's own residual is ~zero
  *         and an all-zero codebook collapses every code.
  *    Both pipelines then share the identical trained assignment,
  *    probe set (nprobe=2 of 8 cells) and code budget (M=4 codes from
  *    Kc=4-entry codebooks); the residual LUT is per (query, probed
  *    cell) — IVFADC's one extra cost (nprobe× more LUT rows, still
  *    query-bounded). Output per query: candidates scanned, recall@3
  *    of each layout vs brute-force truth, the signed delta, and the
  *    corpus-wide residual/raw energy ratio in ppm — the mechanism
  *    (E‖r‖² < E‖x‖²) measured in-engine, not assumed from the paper.
  *    On this isotropic unit-norm synthetic corpus the energy ratio is
  *    ~0.94 (real clustered embeddings sit far lower), so the recall
  *    delta is modest but positive — and the gate pins it exactly.
  *
  *    Scale shape (q270's, plus one trained round): corpus-sized
  *    stages are the two assignment passes, the map-side residual
  *    subtraction, and the PQ encode — all against broadcast
  *    centroid/codebook tables; the Lloyd round is one partial-
  *    aggregated (cell, dim) mean; the scan reads M-byte codes for
  *    ~nprobe/NCells of the corpus; floats are touched only by the
  *    audit's exact-truth side. Distances fold in the same ascending
  *    order in both engines (Vectors.distSq / VecDot kernels), means
  *    are decimal-exact, so the whole comparison hash-gates with no
  *    tolerance.
  */
object Extras101 {

  // q270's byte budget, unchanged — the comparison is only meaningful
  // at the same code size
  private val Dim = 64
  private val M = 4
  private val SubDim = Dim / M
  private val Kc = 4
  private val NCells = 8
  private val NProbe = 2
  private val Q = 10
  private val TopK = 3

  val all: Seq[Qry] = Seq(

    Qry(
      "q292_ivfpq_residual",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
         |       WHERE vec_id < $NCells),
         |d0 AS (SELECT vec_id, cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c0),
         |a0 AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d0) WHERE rn = 1),
         |mu AS (SELECT a0.cid, i, ${davgSql("v[i + 1]")} AS c
         |  FROM e JOIN a0 ON e.vec_id = a0.vec_id, range($Dim) t(i)
         |  GROUP BY 1, 2),
         |c AS (SELECT cid AS ccid, list(c ORDER BY i) AS cv
         |      FROM mu GROUP BY 1),
         |d AS (SELECT vec_id, ccid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, ccid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, ccid) AS rn FROM d) WHERE rn = 1),
         |res AS (SELECT e.vec_id, a.ccid,
         |    list_transform(range($Dim), i -> v[i+1] - cv[i+1]) AS rv
         |  FROM e JOIN assign a ON a.vec_id = e.vec_id
         |    JOIN c ON c.ccid = a.ccid),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $Q),
         |qr AS (SELECT qid, ccid FROM (
         |    SELECT qid, ccid, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($Dim), i ->
         |            (qv[i+1] - cv[i+1]) * (qv[i+1] - cv[i+1]))),
         |          (acc, x) -> acc + x), ccid) AS crank
         |    FROM q, c) WHERE crank <= $NProbe),
         |truth AS (SELECT qid, vec_id FROM (
         |    SELECT qid, e.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($Dim), i ->
         |            (v[i + 1] - qv[i + 1]) * (v[i + 1] - qv[i + 1]))),
         |          (acc, x) -> acc + x), e.vec_id) AS rn
         |    FROM e, q WHERE e.vec_id <> qid) WHERE rn <= $TopK),
         |cb AS (SELECT m, vec_id - $NCells AS cid,
         |    v[m * $SubDim + 1 : m * $SubDim + $SubDim] AS csub
         |  FROM e, range($M) t(m)
         |  WHERE vec_id >= $NCells AND vec_id < $NCells + $Kc),
         |enc AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT e.vec_id, cb.m, cb.cid, row_number() OVER (
         |        PARTITION BY e.vec_id, cb.m ORDER BY
         |          list_reduce(list_prepend(0.0e0,
         |            list_transform(range($SubDim), i ->
         |              (v[m * $SubDim + i + 1] - csub[i + 1])
         |                * (v[m * $SubDim + i + 1] - csub[i + 1]))),
         |            (acc, x) -> acc + x), cb.cid) AS rn
         |    FROM e, cb) WHERE rn = 1),
         |codes AS (SELECT n.vec_id, n.ccid, list(code ORDER BY m) AS codes
         |  FROM enc JOIN assign n ON enc.vec_id = n.vec_id
         |  GROUP BY 1, 2),
         |lutr AS (SELECT qid, m, cid,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(range($SubDim), i ->
         |        (qv[m * $SubDim + i + 1] - csub[i + 1])
         |          * (qv[m * $SubDim + i + 1] - csub[i + 1]))),
         |      (acc, x) -> acc + x) AS qd2
         |  FROM q, cb),
         |lut AS (SELECT qid, list(qd2 ORDER BY m, cid) AS lut
         |        FROM lutr GROUP BY 1),
         |cand AS (SELECT qr.qid, codes.vec_id,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(range($M), m ->
         |        lut[m * $Kc + codes[m + 1] + 1])),
         |      (acc, x) -> acc + x) AS adc
         |  FROM codes JOIN qr ON codes.ccid = qr.ccid
         |    JOIN lut ON lut.qid = qr.qid
         |  WHERE codes.vec_id <> qr.qid),
         |pq AS (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY adc, vec_id) AS rn FROM cand)
         |  WHERE rn <= $TopK),
         |sz AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
         |       FROM cand GROUP BY 1),
         |cbr AS (SELECT m, vec_id - $NCells AS cid,
         |    rv[m * $SubDim + 1 : m * $SubDim + $SubDim] AS csub
         |  FROM res, range($M) t(m)
         |  WHERE vec_id >= $NCells AND vec_id < $NCells + $Kc),
         |encr AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT res.vec_id, cbr.m, cbr.cid, row_number() OVER (
         |        PARTITION BY res.vec_id, cbr.m ORDER BY
         |          list_reduce(list_prepend(0.0e0,
         |            list_transform(range($SubDim), i ->
         |              (rv[m * $SubDim + i + 1] - csub[i + 1])
         |                * (rv[m * $SubDim + i + 1] - csub[i + 1]))),
         |            (acc, x) -> acc + x), cbr.cid) AS rn
         |    FROM res, cbr) WHERE rn = 1),
         |codesr AS (SELECT n.vec_id, n.ccid, list(code ORDER BY m) AS codes
         |  FROM encr JOIN assign n ON encr.vec_id = n.vec_id
         |  GROUP BY 1, 2),
         |lutr2 AS (SELECT qr.qid, qr.ccid, cbr.m, cbr.cid,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(range($SubDim), i ->
         |        ((qv[m * $SubDim + i + 1] - cv[m * $SubDim + i + 1])
         |            - csub[i + 1])
         |          * ((qv[m * $SubDim + i + 1] - cv[m * $SubDim + i + 1])
         |            - csub[i + 1]))),
         |      (acc, x) -> acc + x) AS qd2
         |  FROM qr JOIN q ON q.qid = qr.qid
         |    JOIN c ON c.ccid = qr.ccid, cbr),
         |lut2 AS (SELECT qid, ccid, list(qd2 ORDER BY m, cid) AS lut
         |         FROM lutr2 GROUP BY 1, 2),
         |cand2 AS (SELECT qr.qid, codesr.vec_id,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(range($M), m ->
         |        lut[m * $Kc + codes[m + 1] + 1])),
         |      (acc, x) -> acc + x) AS adc
         |  FROM codesr JOIN qr ON codesr.ccid = qr.ccid
         |    JOIN lut2 ON lut2.qid = qr.qid AND lut2.ccid = codesr.ccid
         |  WHERE codesr.vec_id <> qr.qid),
         |pq2 AS (SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY adc, vec_id) AS rn FROM cand2)
         |  WHERE rn <= $TopK),
         |enr AS (SELECT res.vec_id,
         |    list_reduce(list_prepend(0.0e0, list_transform(range($Dim),
         |      i -> rv[i+1] * rv[i+1])), (acc, x) -> acc + x) AS d2r,
         |    list_reduce(list_prepend(0.0e0, list_transform(range($Dim),
         |      i -> v[i+1] * v[i+1])), (acc, x) -> acc + x) AS d2x
         |  FROM res JOIN e ON e.vec_id = res.vec_id),
         |en AS (SELECT CAST(floor(1000000 * ${dsumSql("d2r")}
         |    / ${dsumSql("d2x")}) AS BIGINT) AS resid_energy_ppm
         |  FROM enr),
         |hp AS (SELECT t.qid, t.vec_id FROM truth t
         |       JOIN pq p ON t.qid = p.qid AND t.vec_id = p.vec_id),
         |hr AS (SELECT t.qid, t.vec_id FROM truth t
         |       JOIN pq2 p ON t.qid = p.qid AND t.vec_id = p.vec_id)
         |SELECT q.qid, sz.n_cand,
         |  CAST(COUNT(DISTINCT hp.vec_id) AS BIGINT) AS n_hit_plain,
         |  CAST(COUNT(DISTINCT hr.vec_id) AS BIGINT) AS n_hit_resid,
         |  1000000 * COUNT(DISTINCT hp.vec_id) // $TopK
         |    AS recall_plain_ppm,
         |  1000000 * COUNT(DISTINCT hr.vec_id) // $TopK
         |    AS recall_resid_ppm,
         |  1000000 * COUNT(DISTINCT hr.vec_id) // $TopK
         |    - 1000000 * COUNT(DISTINCT hp.vec_id) // $TopK
         |    AS delta_ppm,
         |  en.resid_energy_ppm
         |FROM q JOIN sz ON q.qid = sz.qid
         |  CROSS JOIN en
         |  LEFT JOIN hp ON q.qid = hp.qid
         |  LEFT JOIN hr ON q.qid = hr.qid
         |GROUP BY 1, 2, 8""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Staging.stage(Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v")),
        eager = false)
      val c0 = e.filter($"vec_id" < NCells)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val wA0 = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      val a0 = e.crossJoin(broadcast(c0))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wA0))
        .filter($"rn" === 1).select($"vec_id".as("a0id"), $"cid")
      // one exact Lloyd round: per-(cell, dim) decimal mean — the
      // q246 proof shape, one partial-aggregated shuffle
      val c = a0.join(e, $"a0id" === $"vec_id")
        .select($"cid", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"cid", $"i")
        .agg(davg($"x").as("m"))
        .groupBy($"cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, m)))," +
          " p -> p.m)").as("cv"))
        .select($"cid".as("ccid"), $"cv")
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"ccid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"ccid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"ccid")
      // residuals: map-side subtraction against the broadcast trained
      // centroid of the ASSIGNED cell — the corpus never shuffles here
      val res = Staging.stage(
        e.join(assign, $"vec_id" === $"aid")
          .join(broadcast(c), "ccid")
          .select($"vec_id", $"ccid",
            zip_with($"v", $"cv", (x, y) => x - y).as("rv")),
        eager = false)
      val q = e.filter($"vec_id" < Q)
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val wCrank = Window.partitionBy($"qid").orderBy($"d2", $"qc")
      val qr = q.crossJoin(broadcast(c))
        .select($"qid", $"ccid".as("qc"),
          Vectors.distSq($"qv", $"cv").as("d2"))
        .withColumn("crank", row_number().over(wCrank))
        .filter($"crank" <= NProbe).select($"qid".as("rqid"), $"qc")
      val wTruth = Window.partitionBy($"qid").orderBy($"d2", $"vec_id")
      val truth = e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", Vectors.distSq($"v", $"qv").as("d2"))
        .withColumn("rn", row_number().over(wTruth))
        .filter($"rn" <= TopK)
        .select($"qid".as("tqid"), $"vec_id".as("tvid"))

      // one pipeline body, two vector spaces: raw (q270's layout) and
      // residual (IVFADC); lutPerCell is the one structural delta —
      // the residual LUT is keyed per (query, probed cell)
      def encodeScan(vecs: org.apache.spark.sql.DataFrame,
          vCol: String, lutPerCell: Boolean) = {
        val cb = vecs.filter($"vec_id" >= NCells && $"vec_id" < NCells + Kc)
          .select(($"vec_id" - NCells).as("cid"),
            explode(sequence(lit(0), lit(M - 1))).as("m"), col(vCol))
          .select($"m", $"cid",
            slice(col(vCol), $"m" * SubDim + 1, lit(SubDim)).as("csub"))
        val wEnc = Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")
        val codes = vecs.crossJoin(broadcast(cb))
          .select($"vec_id", $"m", $"cid",
            Vectors.distSq(slice(col(vCol), $"m" * SubDim + 1, lit(SubDim)),
              $"csub").as("d2"))
          .withColumn("rn", row_number().over(wEnc))
          .filter($"rn" === 1)
          .groupBy($"vec_id")
          .agg(expr("transform(array_sort(collect_list(struct(m, cid)))," +
            " p -> p.cid)").as("codes"))
          .join(assign, $"vec_id" === $"aid")
          .select($"vec_id", $"ccid", $"codes")
        val lut =
          if (!lutPerCell)
            q.crossJoin(broadcast(cb))
              .select($"qid", $"m", $"cid",
                Vectors.distSq(slice($"qv", $"m" * SubDim + 1, lit(SubDim)),
                  $"csub").as("qd2"))
              .groupBy($"qid")
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(m, cid, qd2))), p -> p.qd2)").as("lut"))
              .select($"qid".as("lqid"), lit(-1L).as("lccid"), $"lut")
          else
            // residual LUT: the query's residual w.r.t. EACH probed
            // cell's trained centroid — (Q x NProbe x M x Kc) rows
            qr.join(q, $"rqid" === $"qid")
              .join(broadcast(c), $"qc" === $"ccid")
              .crossJoin(broadcast(cb))
              .select($"qid", $"ccid", $"m", $"cid",
                Vectors.distSq(
                  slice(zip_with($"qv", $"cv", (x, y) => x - y),
                    $"m" * SubDim + 1, lit(SubDim)),
                  $"csub").as("qd2"))
              .groupBy($"qid", $"ccid")
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(m, cid, qd2))), p -> p.qd2)").as("lut"))
              .select($"qid".as("lqid"), $"ccid".as("lccid"), $"lut")
        val base = codes.join(broadcast(qr), $"ccid" === $"qc")
          .filter($"vec_id" =!= $"rqid")
        val joined =
          if (!lutPerCell) base.join(broadcast(lut), $"rqid" === $"lqid")
          else base.join(broadcast(lut),
            $"rqid" === $"lqid" && $"ccid" === $"lccid")
        val cand = joined.withColumn("adc", expr(
            s"""aggregate(sequence(0, ${M - 1}), cast(0.0 as double),
               |  (acc, m) -> acc + lut[m * $Kc + codes[m]])""".stripMargin))
          .select($"rqid".as("qid"), $"vec_id", $"adc")
        val wScan = Window.partitionBy($"qid").orderBy($"adc", $"vec_id")
        val top = cand.withColumn("rn", row_number().over(wScan))
          .filter($"rn" <= TopK)
          .select($"qid".as("pqid"), $"vec_id".as("pvid"))
        (cand, top)
      }

      val (candPlain, pqPlain) = encodeScan(e, "v", lutPerCell = false)
      val (_, pqResid) = encodeScan(
        res.select($"vec_id", $"ccid".as("rcell"), $"rv"), "rv",
        lutPerCell = true)
      val sz = candPlain.groupBy($"qid").agg(count(lit(1)).as("n_cand"))
        .withColumnRenamed("qid", "sqid")
      // the mechanism, measured: corpus residual energy vs raw energy
      val en = res.join(e.select($"vec_id".as("evid"), $"v"),
          $"vec_id" === $"evid")
        .select(Vectors.dot($"rv", $"rv").as("d2r"),
          Vectors.dot($"v", $"v").as("d2x"))
        .agg(floor(lit(1000000) * dsum($"d2r") / dsum($"d2x"))
          .cast(LongType).as("resid_energy_ppm"))
      val hp = truth.join(pqPlain,
          $"tqid" === $"pqid" && $"tvid" === $"pvid")
        .select($"tqid".as("hpq"), $"tvid".as("hpv"))
      val hr = truth.join(pqResid,
          $"tqid" === $"pqid" && $"tvid" === $"pvid")
        .select($"tqid".as("hrq"), $"tvid".as("hrv"))
      q.join(sz, $"qid" === $"sqid")
        .crossJoin(broadcast(en))
        .join(hp, $"qid" === $"hpq", "left")
        .join(hr, $"qid" === $"hrq", "left")
        .groupBy($"qid", $"n_cand", $"resid_energy_ppm")
        .agg(countDistinct($"hpv").as("n_hit_plain"),
          countDistinct($"hrv").as("n_hit_resid"),
          (lit(1000000L) * countDistinct($"hpv") / TopK).cast(LongType)
            .as("recall_plain_ppm"),
          (lit(1000000L) * countDistinct($"hrv") / TopK).cast(LongType)
            .as("recall_resid_ppm"),
          ((lit(1000000L) * countDistinct($"hrv") / TopK).cast(LongType) -
            (lit(1000000L) * countDistinct($"hpv") / TopK).cast(LongType))
            .as("delta_ppm"))
    }
  )
}
