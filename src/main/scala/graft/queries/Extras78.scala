package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.operators.{Dedup, Staging, TextOps, Vectors}
import graft.sources.Tables
import graft.streaming.Streams

/** Seventy-eighth coverage wave: centroid training, data-driven LSH
  * tuning, and the drift stream twin.
  *
  *  - q246: k-means Lloyd step — the centroid TRAINING pass the IVF
  *    family (q42/q63/q240) consumes fixed centroids from: assign every
  *    vector to its nearest current centroid (q42's shape), then
  *    recompute each centroid dimension as the decimal-exact member
  *    mean. One broadcast of the 8-centroid table, one corpus-sized
  *    posexplode + partial aggregate; output is the new centroid matrix
  *    as (cid, dim, n, c) rows — 8 x 64, never an array column.
  *  - q247: LSH banding advisor over the corpus's REAL pair
  *    distribution — not the textbook S-curve over hypothetical J
  *    values: every df-capped shared-shingle pair's EXACT Jaccard (in
  *    integer ppm, from the same shared/n_a/n_b integers the dedup
  *    family computes) is pushed through the collision probability
  *    1-(1-j^r)^b for each (bands, rows) split of K=16, with the powers
  *    computed as integer-ppm folds (floor at each multiply — exact on
  *    both engines, where pow's libm is not). The output is the table a
  *    deployment reads to pick banding: expected catch rate per config
  *    over the pairs that actually exist.
  *  - q248: q245's token-drift as a STREAMING aggregation — documents
  *    arrive as a file stream, the (snapshot, token) count table is a
  *    complete-mode streaming groupBy, and the drift tail (lag + top-5
  *    risers) runs post-sink over the vocabulary-bounded counts.
  *    Shares q245's oracle text VERBATIM (the q192/q193 pattern).
  */
object Extras78 {

  private val one = lit(1)
  private val Dim = 64
  private val NCentroids = 8
  /** (bands, rows) splits of K = 16 MinHash functions. */
  private val Grid = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
  /** Advisor scope: pairs at or above this Jaccard (x10). */
  private val MinJx10 = 1

  val all: Seq[Qry] = Seq(

    // ---- k-means Lloyd step ----------------------------------------------
    Qry(
      "q246_kmeans_step",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e
         |      WHERE vec_id < $NCentroids),
         |d AS (SELECT vec_id, cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
         |m AS (SELECT a.cid, e.v FROM e
         |      JOIN assign a ON e.vec_id = a.vec_id)
         |SELECT cid, i, CAST(COUNT(*) AS BIGINT) AS n,
         |  ${davgSql("v[i + 1]")} AS c
         |FROM m, range($Dim) t(i) GROUP BY 1, 2""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < NCentroids)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"d2", $"cid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"cid")
      e.join(assign, $"vec_id" === $"aid")
        .select($"cid", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"cid", $"i")
        .agg(count(one).as("n"), davg($"x").as("c"))
        .select($"cid", $"i".cast(LongType).as("i"), $"n", $"c")
    },

    // ---- LSH banding advisor over the real pair distribution -------------
    Qry(
      "q247_lsh_advisor", {
        val grid = Grid.map { case (b, r) => s"($b, $r)" }.mkString(", ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
           |pairs AS (
           |  SELECT 1000000 * COUNT(*)
           |      // (sa.n + sb.n - COUNT(*)) AS j_ppm
           |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
           |    JOIN sizes sa ON a.doc_id = sa.doc_id
           |    JOIN sizes sb ON b.doc_id = sb.doc_id
           |  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
           |  HAVING 10 * COUNT(*) >= $MinJx10
           |    * (sa.n + sb.n - COUNT(*))),
           |grid(b, r) AS (VALUES $grid),
           |coll AS (SELECT b, r, j_ppm,
           |    1000000 - list_reduce(
           |      list_prepend(CAST(1000000 AS BIGINT),
           |        list_transform(range(b), x -> CAST(0 AS BIGINT))),
           |      (acc, x) -> acc * (1000000 - list_reduce(
           |        list_prepend(CAST(1000000 AS BIGINT),
           |          list_transform(range(r), y -> CAST(0 AS BIGINT))),
           |        (a2, y) -> a2 * j_ppm // 1000000)) // 1000000)
           |      AS collide_ppm
           |  FROM pairs, grid)
           |SELECT b AS bands, r AS rows_per_band,
           |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(collide_ppm) // COUNT(*) AS BIGINT)
           |    AS exp_catch_ppm
           |FROM coll GROUP BY 1, 2""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // exact integer Jaccard in ppm, straight from the dedup family's
      // shared/n_a/n_b integers (the double jaccard is never used)
      val pairs = Dedup.jaccardPairs(
        Dedup.shingleHashes(Tables(spark, dir).documents,
          "doc_id", "text"), "doc_id")
        .filter(lit(10) * $"shared" >= lit(MinJx10) *
          ($"n_a" + $"n_b" - $"shared"))
        .select(expr("1000000 * shared DIV (n_a + n_b - shared)")
          .as("j_ppm"))
      val grid = Grid.toDF("b", "r")
      // collision probability 1-(1-j^r)^b as nested integer-ppm folds:
      // floor after every multiply — identical on both engines, where
      // pow()'s libm rounding is not (the q232 lesson)
      val collide = expr(
        """1000000 - aggregate(sequence(1, b), CAST(1000000 AS BIGINT),
          |  (acc, x) -> acc * (1000000 - aggregate(
          |    sequence(1, r), CAST(1000000 AS BIGINT),
          |    (a2, y) -> a2 * j_ppm DIV 1000000)) DIV 1000000)"""
          .stripMargin)
      pairs.crossJoin(broadcast(grid))
        .select($"b", $"r", collide.as("collide_ppm"))
        .groupBy($"b", $"r")
        .agg(count(one).as("n_pairs"),
          expr("SUM(collide_ppm) DIV COUNT(*)").as("exp_catch_ppm"))
        .select($"b".as("bands"), $"r".as("rows_per_band"),
          $"n_pairs", $"exp_catch_ppm")
    },

    // ---- token drift under Structured Streaming ---------------------------
    Qry("q248_stream_drift", Extras77.DriftOracle) { (spark, dir) =>
      import spark.implicits._
      val cnt = Streams.fileStream(spark, dir, "documents")
        .select((TextOps.md5Long($"text") % Extras77.Snaps).as("snap"),
          explode(TextOps.tokens($"text")).as("tok"))
        .groupBy($"snap", $"tok").agg(count(one).cast(LongType).as("c"))
      // count table = streaming aggregation; the drift tail runs
      // post-sink over the vocabulary-bounded counts (one stateful
      // operator per streaming query)
      Extras77.driftTail(Streams.runToMemory(cnt, "complete"))
    }
  )
}
