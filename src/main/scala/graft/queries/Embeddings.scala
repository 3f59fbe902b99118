package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.Vectors
import graft.sources.Tables

/** Similarity-search surface over the `embeddings` fixture (`vec_id`,
  * `embedding array<float>` 64-dim unit vectors, `label`):
  * brute-force cosine top-k as the exactness baseline, plus the two
  * scale paths — IVF (centroid partitioning) and sign-random-projection
  * LSH (hash bucketing) — that bound candidate sets when the corpus no
  * longer fits a cross join.
  *
  * Scale notes (100 TB): the query side of top-k is broadcast (small by
  * construction); the corpus side streams through one pass with a
  * per-query-key top-k window — never a corpus×corpus product. IVF
  * assignment is one broadcast-join pass; LSH bucketing is per-row
  * column arithmetic followed by an equi-join on the bucket id.
  */
object Embeddings {

  private def emb(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir).embeddings
  private val one = lit(1)

  // Shared DuckDB CTEs: double-widened vectors + norms.
  private val eCte =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  private val nCte =
    "n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nr FROM e)"

  /** DuckDB twin of `Vectors.dot(v, Vectors.hyperplane(j))` — generated
    * from the same Weyl constants so the two sides cannot drift. */
  private def planeSqlFor(j: Int): String =
    s"""list_reduce(list_prepend(0.0e0, list_transform(range(64),
       |      i -> v[i+1] * ((($j*64 + i) * 2654435761 % 1000003)
       |        / 1000003.0e0 - 0.5e0))),
       |      (acc, x) -> acc + x)""".stripMargin

  // q77 near-dup banding parameters (shared Spark/oracle)
  private val NdBands = 4
  private val NdPlanesPerBand = 8
  private val NdThreshold = 0.42

  val all: Seq[Qry] = Seq(

    // ---- norm statistics per label -------------------------------------
    Qry(
      "q40_norm_stats",
      s"""WITH $eCte, $nCte
         |SELECT label, COUNT(*) AS n,
         |  ${dsumSql("nr")} AS norm_sum,
         |  ${davgSql("nr")} AS norm_avg,
         |  MIN(nr) AS norm_min, MAX(nr) AS norm_max
         |FROM n GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      emb(spark, dir)
        .select($"label", Vectors.norm(Vectors.toDouble($"embedding")).as("nr"))
        .groupBy($"label")
        .agg(count(one).as("n"), dsum($"nr").as("norm_sum"),
          davg($"nr").as("norm_avg"),
          min($"nr").as("norm_min"), max($"nr").as("norm_max"))
    },

    // ---- brute-force cosine top-k (exact ANN baseline) -----------------
    Qry(
      "q41_cosine_topk",
      s"""WITH $eCte, $nCte,
         |q AS (SELECT vec_id AS qid, v AS qv, nr AS qnr FROM n
         |      WHERE vec_id < 10),
         |pairs AS (SELECT qid, vec_id,
         |    list_dot_product(qv, v) / (qnr * nr) AS cosine
         |  FROM n, q WHERE vec_id <> qid)
         |SELECT qid, vec_id AS neighbor_id, rn AS rank, cosine
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY cosine DESC, vec_id) AS rn FROM pairs)
         |WHERE rn <= 5""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.Graft._
      val e = emb(spark, dir)
      e.cosineTopK(e.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
        .select($"query_id".as("qid"), $"neighbor_id", $"rank", $"cosine")
    },

    // ---- IVF: nearest-centroid assignment ------------------------------
    Qry(
      "q42_ivf_assign",
      s"""WITH $eCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (SELECT vec_id, cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, cid, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1)
         |SELECT cid, COUNT(*) AS n_members,
         |  ${dsumSql("d2")} AS d2_sum, ${davgSql("d2")} AS d2_avg
         |FROM assign GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = emb(spark, dir)
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val w = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"cid")
        .agg(count(one).as("n_members"), dsum($"d2").as("d2_sum"),
          davg($"d2").as("d2_avg"))
    },

    // ---- sign-random-projection LSH bucketing --------------------------
    Qry(
      "q43_srp_lsh", {
        def planeSql(j: Int) =
          s"""list_reduce(list_prepend(0.0e0, list_transform(range(64),
             |      i -> v[i+1] * ((($j*64 + i) * 2654435761 % 1000003)
             |        / 1000003.0e0 - 0.5e0))),
             |      (acc, x) -> acc + x)""".stripMargin
        val bucketSql = (0 until 8).map(j =>
          s"CASE WHEN ${planeSql(j)} > 0 THEN ${1L << j} ELSE 0 END")
          .mkString("\n    + ")
        s"""WITH $eCte,
           |b AS (SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket FROM e)
           |SELECT bucket, COUNT(*) AS n_vectors,
           |  COUNT(*) * (COUNT(*) - 1) / 2 AS n_candidate_pairs
           |FROM b GROUP BY 1""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      emb(spark, dir)
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
        .select($"vec_id", Vectors.srpBucket($"v", nPlanes = 8).as("bucket"))
        .groupBy($"bucket")
        .agg(count(one).as("n_vectors"),
          (count(one) * (count(one) - 1) / 2).as("n_candidate_pairs"))
    },

    // ---- embedding-cosine near-duplicate removal -----------------------
    // The vector-space member of the dedup family (exact q32, Jaccard
    // q36, MinHash q37, SimHash q38): candidates from banded SRP-LSH
    // (any-band collision), exact cosine only within candidates, greedy
    // keep-lowest-id removal. At 100 TB the banded equi-join bounds the
    // pair stage exactly like q37's MinHash bands — no corpus×corpus
    // product anywhere; vectors are re-joined by id for scoring rather
    // than carried through the band explode. The fixture has no planted
    // duplicates (max pairwise cosine ≈ 0.5), so the threshold sits where
    // the fixture has signal; it is a parameter, not a semantic.
    Qry(
      "q77_embed_neardup", {
        val bandSelects = (0 until NdBands).map { b =>
          val bits = (0 until NdPlanesPerBand).map { p =>
            s"CASE WHEN ${planeSqlFor(b * NdPlanesPerBand + p)} > 0 " +
              s"THEN ${1L << p} ELSE 0 END"
          }.mkString("\n      + ")
          s"SELECT vec_id, $b AS b, CAST($bits AS BIGINT) AS bk FROM e"
        }.mkString("\nUNION ALL\n")
        s"""WITH $eCte, $nCte,
           |bands AS ($bandSelects),
           |cand AS (SELECT DISTINCT a.vec_id AS ia, c.vec_id AS ib
           |  FROM bands a JOIN bands c
           |    ON a.b = c.b AND a.bk = c.bk AND a.vec_id < c.vec_id),
           |pairs AS (SELECT ia, ib,
           |    list_dot_product(na.v, nb.v) / (na.nr * nb.nr) AS cos
           |  FROM cand JOIN n na ON ia = na.vec_id
           |    JOIN n nb ON ib = nb.vec_id),
           |victims AS (SELECT DISTINCT ib FROM pairs WHERE cos > $NdThreshold)
           |SELECT label, COUNT(*) AS n_vecs,
           |  CAST(SUM(CASE WHEN v.ib IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dropped,
           |  CAST(COUNT(*) - SUM(CASE WHEN v.ib IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) AS n_kept
           |FROM e LEFT JOIN victims v ON e.vec_id = v.ib
           |GROUP BY 1""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val e = emb(spark, dir)
        .select($"vec_id", $"label", Vectors.toDouble($"embedding").as("v"))
      val victims = graft.operators.Dedup
        .cosineNearDupPairs(e, idCol = "vec_id", vecCol = "v",
          bands = NdBands, planesPerBand = NdPlanesPerBand,
          threshold = NdThreshold)
        .select($"id_b".as("victim")).distinct()
      e.join(broadcast(victims.withColumn("__hit", one)),
          e("vec_id") === victims("victim"), "left")
        .groupBy($"label")
        .agg(count(one).as("n_vecs"),
          sum(when($"__hit".isNotNull, 1L).otherwise(0L)).as("n_dropped"),
          sum(when($"__hit".isNull, 1L).otherwise(0L)).as("n_kept"))
    }
  )
}
