package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Vectors
import graft.sources.Tables

/** Hundred-thirty-first coverage wave: the IVF nprobe knob measured,
  * and int8 embedding quantization audited — the two serving-side
  * decisions every vector deployment makes.
  *
  *  - q340: multi-probe IVF — q322 measured 1-probe MRR; q340
  *    measures the RECALL-VS-COST CURVE'S second point: per query,
  *    the true nearest neighbor's rank inside the candidate set when
  *    probing the nearest centroid cell vs the nearest TWO. Output is
  *    per-query ranks and reciprocal ranks for both settings plus
  *    corpus MRR and recall@10 for each — the "is the second probe
  *    worth 2× the scan" decision read directly from the gate. Exact
  *    integer metrics (10⁶ DIV rank), cosine ties broken by vec_id.
  *
  *  - q341: scalar int8 quantization audit — per-dimension affine
  *    quantization (the FAISS SQ8 / serving-cache standard): codes =
  *    round(255·(x−min)/(max−min)) per dimension, reconstruction
  *    error Σ(x−dequant)² per vector accumulated as ROUNDED
  *    NANO-UNIT INTEGERS (each element's squared error is rounded to
  *    1e-9 grain BEFORE summing, so the sum is order-independent and
  *    engine-exact — the float-sum trap that dsum solves for money,
  *    solved the same way for error mass). Per-vector error plus the
  *    corpus total; constant dimensions dequantize to their minimum
  *    (guarded division). Scale: the per-dim min/max table is
  *    64 rows broadcast; one corpus-sized element explode each way.
  */
object Extras131 {

  private val eCte =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  private val nCte =
    "n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nr FROM e)"

  val all: Seq[Qry] = Seq(

    Qry(
      "q340_ivf_multiprobe",
      s"""WITH $eCte, $nCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (SELECT e.vec_id, c.cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |ar AS (SELECT vec_id, cid, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
         |assign AS (SELECT vec_id, cid FROM ar WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv, nr AS qnr FROM n
         |      WHERE vec_id < 10),
         |ex AS (SELECT qid, vec_id AS nn FROM (
         |    SELECT q.qid, n.vec_id, row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_dot_product(q.qv, n.v) / (q.qnr * n.nr) DESC,
         |               n.vec_id) AS rn
         |    FROM n, q WHERE n.vec_id <> q.qid) WHERE rn = 1),
         |qa AS (SELECT q.qid, ar.cid, ar.rn AS probe, q.qv, q.qnr
         |  FROM q JOIN ar ON ar.vec_id = q.qid AND ar.rn <= 2),
         |cand AS (SELECT qa.qid, qa.probe, n.vec_id,
         |    list_dot_product(qa.qv, n.v) / (qa.qnr * n.nr) AS cos
         |  FROM qa JOIN assign a2 ON a2.cid = qa.cid
         |  JOIN n ON n.vec_id = a2.vec_id WHERE n.vec_id <> qa.qid),
         |r1 AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos DESC, vec_id) AS rnk
         |  FROM cand WHERE probe = 1),
         |r2 AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos DESC, vec_id) AS rnk FROM cand),
         |hit AS (SELECT ex.qid, ex.nn, a.rnk AS rank_p1, b.rnk AS rank_p2
         |  FROM ex
         |  LEFT JOIN r1 a ON a.qid = ex.qid AND a.vec_id = ex.nn
         |    AND a.rnk <= 10
         |  LEFT JOIN r2 b ON b.qid = ex.qid AND b.vec_id = ex.nn
         |    AND b.rnk <= 10)
         |SELECT qid, nn AS true_nn,
         |  CAST(rank_p1 AS BIGINT) AS rank_p1,
         |  CAST(rank_p2 AS BIGINT) AS rank_p2,
         |  CAST(COALESCE(1000000 // rank_p1, 0) AS BIGINT) AS rr1_ppm,
         |  CAST(COALESCE(1000000 // rank_p2, 0) AS BIGINT) AS rr2_ppm,
         |  CAST(SUM(COALESCE(1000000 // rank_p1, 0)) OVER ()
         |    // COUNT(*) OVER () AS BIGINT) AS mrr1_ppm,
         |  CAST(SUM(COALESCE(1000000 // rank_p2, 0)) OVER ()
         |    // COUNT(*) OVER () AS BIGINT) AS mrr2_ppm,
         |  CAST(SUM(CASE WHEN rank_p1 IS NOT NULL THEN 1 ELSE 0 END)
         |    OVER () * 1000000 // COUNT(*) OVER () AS BIGINT)
         |    AS recall1_ppm,
         |  CAST(SUM(CASE WHEN rank_p2 IS NOT NULL THEN 1 ELSE 0 END)
         |    OVER () * 1000000 // COUNT(*) OVER () AS BIGINT)
         |    AS recall2_ppm
         |FROM hit""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val n = e.withColumn("nr", sqrt(Vectors.dot($"v", $"v")))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val ar = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"d2", $"cid")))
      val assign = ar.filter($"rn" === 1).select($"vec_id", $"cid")
      val q = n.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nr".as("qnr"))
      val ex = n.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (Vectors.dot($"qv", $"v") / ($"qnr" * $"nr")).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
        .filter($"rn" === 1).select($"qid", $"vec_id".as("nn"))
      val qa = q.join(ar.select($"vec_id".as("av"), $"cid",
          $"rn".as("probe")),
          $"qid" === $"av" && $"probe" <= 2)
        .select($"qid", $"cid", $"probe", $"qv", $"qnr")
      val cand = broadcast(qa).join(assign.as("a2"), "cid")
        .join(n.select($"vec_id".as("nid"), $"v", $"nr"),
          $"a2.vec_id" === $"nid")
        .filter($"nid" =!= $"qid")
        .select($"qid", $"probe", $"nid",
          (Vectors.dot($"qv", $"v") / ($"qnr" * $"nr")).as("cos"))
      val r1 = cand.filter($"probe" === 1)
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")))
      val r2 = cand
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")))
      val hit = ex
        .join(r1.select($"qid".as("q1"), $"nid".as("v1"),
            $"rnk".as("rank_p1")),
          $"qid" === $"q1" && $"nn" === $"v1" && $"rank_p1" <= 10,
          "left_outer")
        .join(r2.select($"qid".as("q2"), $"nid".as("v2"),
            $"rnk".as("rank_p2")),
          $"qid" === $"q2" && $"nn" === $"v2" && $"rank_p2" <= 10,
          "left_outer")
        .select($"qid", $"nn", $"rank_p1", $"rank_p2")
      hit
        .withColumn("rr1_ppm",
          coalesce(expr("1000000 DIV rank_p1"), lit(0L)))
        .withColumn("rr2_ppm",
          coalesce(expr("1000000 DIV rank_p2"), lit(0L)))
        .withColumn("mrr1_ppm", expr("CAST(SUM(rr1_ppm) OVER () " +
          "DIV COUNT(*) OVER () AS BIGINT)"))
        .withColumn("mrr2_ppm", expr("CAST(SUM(rr2_ppm) OVER () " +
          "DIV COUNT(*) OVER () AS BIGINT)"))
        .withColumn("recall1_ppm",
          expr("CAST(SUM(CASE WHEN rank_p1 IS NOT NULL THEN 1 ELSE 0 " +
            "END) OVER () * 1000000 DIV COUNT(*) OVER () AS BIGINT)"))
        .withColumn("recall2_ppm",
          expr("CAST(SUM(CASE WHEN rank_p2 IS NOT NULL THEN 1 ELSE 0 " +
            "END) OVER () * 1000000 DIV COUNT(*) OVER () AS BIGINT)"))
        .select($"qid", $"nn".as("true_nn"),
          $"rank_p1".cast(LongType).as("rank_p1"),
          $"rank_p2".cast(LongType).as("rank_p2"),
          $"rr1_ppm", $"rr2_ppm", $"mrr1_ppm", $"mrr2_ppm",
          $"recall1_ppm", $"recall2_ppm")
    },

    Qry(
      "q341_int8_quantization",
      s"""WITH $eCte,
         |el AS (SELECT vec_id, unnest(range(len(v))) AS dim, v
         |  FROM e),
         |x AS (SELECT vec_id, dim, v[dim + 1] AS x FROM el),
         |mm AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM x
         |       GROUP BY 1),
         |qd AS (SELECT x.vec_id, x.dim, x.x, mm.mn, mm.mx,
         |    CASE WHEN mm.mx > mm.mn
         |      THEN round((x.x - mm.mn) * 255 / (mm.mx - mm.mn))
         |      ELSE 0 END AS code
         |  FROM x JOIN mm ON mm.dim = x.dim),
         |err AS (SELECT vec_id,
         |    CAST(SUM(CAST(round(1000000000 * (x - (CASE WHEN mx > mn
         |      THEN mn + code * (mx - mn) / 255 ELSE mn END))
         |      * (x - (CASE WHEN mx > mn
         |      THEN mn + code * (mx - mn) / 255 ELSE mn END)))
         |      AS BIGINT)) AS BIGINT) AS err_e9
         |  FROM qd GROUP BY 1)
         |SELECT vec_id, err_e9,
         |  CAST(SUM(err_e9) OVER () AS BIGINT) AS total_err_e9
         |FROM err""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val x = Tables(spark, dir).embeddings
        .select($"vec_id", posexplode(Vectors.toDouble($"embedding")))
        .select($"vec_id", $"pos".as("dim"), $"col".as("x"))
      val mm = x.groupBy($"dim").agg(min($"x").as("mn"),
        max($"x").as("mx"))
      val qd = x.join(broadcast(mm), "dim")
        .withColumn("code",
          expr("CASE WHEN mx > mn " +
            "THEN round((x - mn) * 255 / (mx - mn)) ELSE 0 END"))
      val err = qd.groupBy($"vec_id")
        .agg(sum(expr("CAST(round(1000000000 * (x - (CASE WHEN mx > mn " +
          "THEN mn + code * (mx - mn) / 255 ELSE mn END)) " +
          "* (x - (CASE WHEN mx > mn " +
          "THEN mn + code * (mx - mn) / 255 ELSE mn END))) AS BIGINT)"))
          .cast(LongType).as("err_e9"))
      err.withColumn("total_err_e9",
          sum($"err_e9").over(Window.partitionBy()).cast(LongType))
        .select($"vec_id", $"err_e9", $"total_err_e9")
    }
  )
}
