package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Staging, Vectors}
import graft.sources.Tables

/** Seventy-fourth coverage wave: ANN index-quality auditing.
  *
  *  - q240: IVF blocking-quality audit — q179's precision/recall
  *    discipline applied to the vector path. For each query vector,
  *    the IVF-restricted top-k (q63's geometry: nearest-centroid
  *    cluster as the only probed cell) is compared against the exact
  *    brute-force top-k (q41), yielding recall@k plus the candidate
  *    count the probe actually scanned — the (recall, scanned)
  *    operating point a 100 TB ANN deployment measures on a sample
  *    before committing nlist/nprobe. One STAGED assigned-vector leaf
  *    feeds both rankings (the exact-truth side is the cost and is the
  *    point of the audit); the query set broadcasts to both.
  */
object Extras74 {

  private val K = 3

  val all: Seq[Qry] = Seq(

    Qry(
      "q240_ivf_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
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
         |truth AS (SELECT qid, vec_id FROM (
         |    SELECT qid, n.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_dot_product(qv, v) / (qnr * nr) DESC,
         |          n.vec_id) AS rn
         |    FROM n, q WHERE n.vec_id <> qid) WHERE rn <= $K),
         |ivf AS (SELECT qid, vec_id FROM (
         |    SELECT qid, n.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_dot_product(qv, v) / (qnr * nr) DESC,
         |          n.vec_id) AS rn
         |    FROM n JOIN q ON n.cid = q.qcid AND n.vec_id <> q.qid)
         |  WHERE rn <= $K),
         |sz AS (SELECT cid, COUNT(*) AS cn FROM n GROUP BY 1)
         |SELECT q.qid, CAST(sz.cn - 1 AS BIGINT) AS n_cand,
         |  CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
         |  1000000 * COUNT(i.vec_id) // $K AS recall_ppm
         |FROM q JOIN sz ON q.qcid = sz.cid
         |  JOIN truth t ON t.qid = q.qid
         |  LEFT JOIN ivf i ON i.qid = t.qid AND i.vec_id = t.vec_id
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"cid")
      // ONE staged leaf: vectors + norms + IVF assignment; the truth
      // and IVF rankings both read it (without staging, the static
      // plan re-runs the assignment cross-join per side)
      val n = Staging.stage(e.join(assign, $"vec_id" === $"aid")
        .select($"vec_id", $"cid", $"v", Vectors.norm($"v").as("nr")),
        eager = false)
      val q = n.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"cid".as("qcid"),
          $"v".as("qv"), $"nr".as("qnr"))
      val wRank = Window.partitionBy($"qid")
        .orderBy($"cosine".desc, $"vec_id")
      def topK(cand: org.apache.spark.sql.DataFrame) = cand
        .select($"qid",
          Vectors.cosine(Vectors.dot($"qv", $"v"), $"qnr", $"nr")
            .as("cosine"),
          $"vec_id")
        .withColumn("rn", row_number().over(wRank))
        .filter($"rn" <= K)
        .select($"qid", $"vec_id")
      val truth = topK(n.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"qid"))
      val ivf = topK(n.join(broadcast(q),
          $"cid" === $"qcid" && $"vec_id" =!= $"qid"))
        .select($"qid".as("iqid"), $"vec_id".as("ivid"))
      val sz = n.groupBy($"cid").agg(count(lit(1)).as("cn"))
      truth
        .join(ivf, $"qid" === $"iqid" && $"vec_id" === $"ivid",
          "left_outer")
        .groupBy($"qid")
        .agg(count($"ivid").as("n_hit"))
        .join(broadcast(q.select($"qid".as("q2"), $"qcid")),
          $"qid" === $"q2")
        .join(broadcast(sz), $"qcid" === $"cid")
        .select($"qid", ($"cn" - 1).cast("long").as("n_cand"),
          $"n_hit".cast("long").as("n_hit"),
          expr(s"1000000 * n_hit DIV $K").as("recall_ppm"))
    }
  )
}
