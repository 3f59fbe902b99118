package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, Vectors}
import graft.sources.Tables

/** Eighty-ninth coverage wave: the composed IVF-PQ index and the
  * cross-correlation lag finder.
  *
  *  - q270: IVF-PQ — the production ANN layout (coarse quantizer
  *    restricts the scan to nprobe=2 cells, product-quantized codes
  *    answer distances inside them): q257's multi-probe cell
  *    restriction composed with q260's asymmetric-distance scan, so
  *    scan cost is (cell fraction) x (M lookups per candidate) and the
  *    float vectors are touched only by the audit's exact-truth side.
  *    Output is the operating point per query (candidates scanned,
  *    recall@3 vs brute-force L2 truth). Scale shape: the encode pass
  *    and the cell assignment are the two corpus-sized stages (both
  *    against broadcast tables, partial-aggregated); the scan reads
  *    M-byte codes for ~2/8 of the corpus; LUTs, centroid rankings and
  *    the query set all ride as broadcasts.
  *  - q271: cross-correlation lag finder over the hourly event-value
  *    series — for every event-type pair and lag in [-6, +6] hours,
  *    the scale-free covariance score n·Σxy − Σx·Σy on the aligned
  *    overlap (exact integer cents; no mean, no variance, no float),
  *    rank 1 per pair = the lag that maximizes co-movement — the
  *    "does errors follow clicks by N hours?" primitive. BIGINT
  *    headroom: |score| <= 2·n·(Σ|x| per hour)² — at 1e6 cents/hour
  *    and 1e4 hours that is ~1e19 < 2^63; the hourly pre-aggregation
  *    is what keeps the bound series-sized, not corpus-sized. Scale
  *    shape: one corpus-sized hourly aggregate; the lag join and the
  *    rank run over the bounded (pairs x lags x hours) series.
  */
object Extras89 {

  private val one = lit(1)

  // ---- q270 geometry (q260's PQ + q257's IVF conventions) ---------------
  private val Dim = 64
  private val M = 4
  private val SubDim = Dim / M
  private val Kc = 4
  private val NCells = 8
  private val NProbe = 2
  private val Q = 10
  private val TopK = 3

  // ---- q271 geometry ------------------------------------------------------
  private val MaxLag = 6

  val all: Seq[Qry] = Seq(

    // ---- IVF-PQ: coarse cells + PQ codes -----------------------------------
    Qry(
      "q270_ivfpq",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c AS (SELECT vec_id AS ccid, v AS cv FROM e
         |      WHERE vec_id < $NCells),
         |d AS (SELECT vec_id, ccid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, ccid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, ccid) AS rn FROM d) WHERE rn = 1),
         |cb AS (SELECT m, vec_id AS cid,
         |    v[m * $SubDim + 1 : m * $SubDim + $SubDim] AS csub
         |  FROM e, range($M) t(m) WHERE vec_id < $Kc),
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
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $Q),
         |qr AS (SELECT qid, ccid FROM (
         |    SELECT qid, ccid, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($Dim), i ->
         |            (qv[i+1] - cv[i+1]) * (qv[i+1] - cv[i+1]))),
         |          (acc, x) -> acc + x), ccid) AS crank
         |    FROM q, c) WHERE crank <= $NProbe),
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
         |truth AS (SELECT qid, vec_id FROM (
         |    SELECT qid, e.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_reduce(list_prepend(0.0e0,
         |          list_transform(range($Dim), i ->
         |            (v[i + 1] - qv[i + 1]) * (v[i + 1] - qv[i + 1]))),
         |          (acc, x) -> acc + x), e.vec_id) AS rn
         |    FROM e, q WHERE e.vec_id <> qid) WHERE rn <= $TopK)
         |SELECT q.qid, sz.n_cand,
         |  CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
         |  1000000 * COUNT(i.vec_id) // $TopK AS recall_ppm
         |FROM q JOIN sz ON q.qid = sz.qid
         |  LEFT JOIN (SELECT t.qid, t.vec_id FROM truth t
         |    JOIN pq p ON t.qid = p.qid AND t.vec_id = p.vec_id) i
         |  ON q.qid = i.qid
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Staging.stage(Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v")),
        eager = false)
      val c = e.filter($"vec_id" < NCells)
        .select($"vec_id".as("ccid"), $"v".as("cv"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"ccid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"ccid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"ccid")
      val cb = e.filter($"vec_id" < Kc)
        .select($"vec_id".as("cid"),
          explode(sequence(lit(0), lit(M - 1))).as("m"), $"v")
        .select($"m", $"cid",
          slice($"v", $"m" * SubDim + 1, lit(SubDim)).as("csub"))
      val wEnc = Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")
      // codes carry their cell: the inverted-list layout (ccid, codes)
      // is all the scan ever reads
      val codes = e.crossJoin(broadcast(cb))
        .select($"vec_id", $"m", $"cid",
          Vectors.distSq(slice($"v", $"m" * SubDim + 1, lit(SubDim)),
            $"csub").as("d2"))
        .withColumn("rn", row_number().over(wEnc))
        .filter($"rn" === 1)
        .groupBy($"vec_id")
        .agg(expr("transform(array_sort(collect_list(struct(m, cid)))," +
          " p -> p.cid)").as("codes"))
        .join(assign, $"vec_id" === $"aid")
        .select($"vec_id", $"ccid", $"codes")
      val q = e.filter($"vec_id" < Q)
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val wCrank = Window.partitionBy($"qid").orderBy($"d2", $"qc")
      val qr = q.crossJoin(broadcast(c))
        .select($"qid", $"ccid".as("qc"),
          Vectors.distSq($"qv", $"cv").as("d2"))
        .withColumn("crank", row_number().over(wCrank))
        .filter($"crank" <= NProbe).select($"qid".as("rqid"), $"qc")
      val lut = q.crossJoin(broadcast(cb))
        .select($"qid", $"m", $"cid",
          Vectors.distSq(slice($"qv", $"m" * SubDim + 1, lit(SubDim)),
            $"csub").as("qd2"))
        .groupBy($"qid")
        .agg(expr("transform(array_sort(collect_list(struct(m, cid, qd2)))," +
          " p -> p.qd2)").as("lut"))
        .withColumnRenamed("qid", "lqid")
      val cand = codes.join(broadcast(qr), $"ccid" === $"qc")
        .filter($"vec_id" =!= $"rqid")
        .join(broadcast(lut), $"rqid" === $"lqid")
        .withColumn("adc", expr(
          s"""aggregate(sequence(0, ${M - 1}), cast(0.0 as double),
             |  (acc, m) -> acc + lut[m * $Kc + codes[m]])""".stripMargin))
        .select($"rqid".as("qid"), $"vec_id", $"adc")
      val wScan = Window.partitionBy($"qid").orderBy($"adc", $"vec_id")
      val pq = cand.withColumn("rn", row_number().over(wScan))
        .filter($"rn" <= TopK)
        .select($"qid".as("pqid"), $"vec_id".as("pvid"))
      val sz = cand.groupBy($"qid").agg(count(one).as("n_cand"))
        .withColumnRenamed("qid", "sqid")
      val wTruth = Window.partitionBy($"qid").orderBy($"d2", $"vec_id")
      val truth = e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id", Vectors.distSq($"v", $"qv").as("d2"))
        .withColumn("rn", row_number().over(wTruth))
        .filter($"rn" <= TopK)
      val hits = truth.join(pq,
        $"qid" === $"pqid" && $"vec_id" === $"pvid")
        .select($"qid".as("hqid"), $"vec_id".as("hvid"))
      q.join(sz, $"qid" === $"sqid")
        .join(hits, $"qid" === $"hqid", "left")
        .groupBy($"qid", $"n_cand")
        .agg(count($"hvid").as("n_hit"),
          (lit(1000000L) * count($"hvid") / TopK).cast(LongType)
            .as("recall_ppm"))
    },

    // ---- cross-correlation lag finder --------------------------------------
    Qry(
      "q271_xcorr_lag",
      s"""WITH h AS (SELECT event_type,
         |    epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600
         |      AS hi,
         |    CAST(SUM(CAST(value AS DECIMAL(28,6)) * 100) AS BIGINT)
         |      AS vc
         |  FROM events GROUP BY 1, 2),
         |lags AS (SELECT unnest(range(-$MaxLag, ${MaxLag + 1})) AS lag),
         |xc AS (SELECT a.event_type AS t1, b.event_type AS t2, l.lag,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(*) * SUM(a.vc * b.vc)
         |      - SUM(a.vc) * SUM(b.vc) AS BIGINT) AS score
         |  FROM h a JOIN lags l ON true
         |    JOIN h b ON b.event_type > a.event_type
         |      AND b.hi = a.hi + l.lag
         |  GROUP BY 1, 2, 3)
         |SELECT t1, t2, CAST(lag AS BIGINT) AS lag, n, score,
         |  CAST(row_number() OVER (PARTITION BY t1, t2
         |    ORDER BY score DESC, abs(lag), lag) AS BIGINT) AS rn
         |FROM xc""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // staged: the hourly series feeds both sides of the lag join
      val h = Staging.stage(Tables(spark, dir).events
        .groupBy($"event_type",
          (unix_timestamp(date_trunc("hour", $"ts")) / 3600)
            .cast(LongType).as("hi"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vc")),
        eager = false)
      val lags = (-MaxLag to MaxLag).toDF("lag")
      val xc = h.select($"event_type".as("t1"), $"hi", $"vc")
        .crossJoin(broadcast(lags))
        .join(h.select($"event_type".as("t2"), $"hi".as("hi2"),
          $"vc".as("vc2")),
          $"t2" > $"t1" && $"hi2" === $"hi" + $"lag")
        .groupBy($"t1", $"t2", $"lag")
        .agg(count(one).as("n"),
          (count(one) * sum($"vc" * $"vc2") -
            sum($"vc") * sum($"vc2")).as("score"))
      xc.select($"t1", $"t2", $"lag".cast(LongType).as("lag"), $"n",
          $"score".cast(LongType).as("score"),
          row_number().over(Window.partitionBy($"t1", $"t2")
            .orderBy($"score".desc, abs($"lag"), $"lag"))
            .cast(LongType).as("rn"))
    }
  )
}
