package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.Vectors
import graft.sources.Tables

/** Fortieth coverage wave: numeric data-quality auditing + embedding
  * compression QA.
  *
  *  - Benford first-digit audit (q164): the classic synthetic-data /
  *    fraud screen — compare the first-significant-digit distribution
  *    of a money column against Benford's law. All arithmetic is BIGINT
  *    ppm (the Benford expectations are precomputed Scala literals
  *    embedded in BOTH engines' queries — in-engine log10 would differ
  *    in the last ulp across libm implementations).
  *  - int8 quantization QA (q165): scalar symmetric per-dimension
  *    quantization of the embedding corpus with exact reconstruction-
  *    error reporting — the check a pipeline runs before shipping a
  *    compressed ANN index. floor(x + 0.5) stands in for round():
  *    floor is bit-identical in both engines while double round() is
  *    not guaranteed to be.
  *  - Per-label centroid similarity (q166): label×label cosine matrix
  *    of class centroids — the clustering-sanity audit (which classes
  *    are semantically adjacent). Centroids are exact: per-dimension
  *    decimal-accumulated means, then row-local double cosine.
  */
object Extras40 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  private val Dim = 64
  private val TopK = 20

  /** floor(1e6·log10(1+1/d)) for d=1..9, computed once in Scala and
    * embedded as literals on both sides. */
  private val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  // DuckDB CTE over embeddings (q40's shape)
  private val eCte =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  val all: Seq[Qry] = Seq(

    // ---- Benford first-digit distribution audit -----------------------
    // First digit via BIGINT string head (floor→BIGINT→VARCHAR is
    // bit-identical in both engines; double log10/pow tricks are not:
    // log10(1000) can land at 2.999… and floor to the wrong decade).
    // Scale shape: one scan → 9-row partial+final aggregate; the total
    // arrives by an unpartitioned window over those 9 rows (NOT a second
    // aggregate of the scan). Everything after the scan is BIGINT ppm
    // arithmetic.
    Qry(
      "q164_benford_digits", {
        val benCase = BenfordPpm.map { case (d, p) =>
          s"WHEN digit = $d THEN CAST($p AS BIGINT)" }.mkString(" ")
        s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice)
           |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |  FROM lineitem WHERE floor(l_extendedprice) >= 1),
           |c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
           |w AS (SELECT digit, n_obs,
           |      CAST(SUM(n_obs) OVER () AS BIGINT) AS n FROM c)
           |SELECT digit, n_obs,
           |  (1000000 * n_obs) // n AS obs_ppm,
           |  CASE $benCase END AS benford_ppm,
           |  (1000000 * n_obs) // n - CASE $benCase END AS excess_ppm
           |FROM w""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val benCol = BenfordPpm.tail.foldLeft(
        when($"digit" === BenfordPpm.head._1, BenfordPpm.head._2)) {
        case (acc, (d, p)) => acc.when($"digit" === d, p)
      }
      // total via an unpartitioned window over the 9-row digit table —
      // NOT a second aggregate of the scan: the first formulation's
      // cross join planned lineitem twice (one full extra scan at scale)
      val c = t(spark, dir).lineitem
        .filter(floor($"l_extendedprice") >= 1)
        .select(substring(floor($"l_extendedprice").cast("bigint")
          .cast("string"), 1, 1).cast("bigint").as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      c.withColumn("n", sum($"n_obs").over(Window.partitionBy()))
        .select($"digit", $"n_obs",
          expr("(1000000 * n_obs) DIV n").as("obs_ppm"),
          benCol.as("benford_ppm"),
          (expr("(1000000 * n_obs) DIV n") - benCol).as("excess_ppm"))
    },

    // ---- int8 scalar-quantization reconstruction error ----------------
    // Per-dimension scale = max|x| over the corpus (max is order-
    // independent — no decimal detour needed), broadcast back as one
    // 64-element array; quantize q = floor(x·127/s + 0.5), report the
    // top-20 vectors by reconstruction MSE. The error folds are
    // row-local sequential aggregates in array order — deterministic in
    // both engines (q42's distance-fold precedent). Scale shape: one
    // corpus pass for the 64-row max aggregate, one map-side pass for
    // the per-vector errors, top-k via rank-limit pushdown. The 1e-12
    // floor guards an all-zero dimension (division by zero → NaN).
    Qry(
      "q165_embed_quantize",
      s"""WITH $eCte,
         |s AS (SELECT i, GREATEST(MAX(abs(v[i + 1])), 1e-12) AS s
         |      FROM e, range($Dim) t(i) GROUP BY 1),
         |sv AS (SELECT list(s ORDER BY i) AS sv FROM s),
         |err AS (SELECT vec_id, label,
         |    list_transform(range($Dim), i ->
         |      v[i + 1] - floor(v[i + 1] * 127 / sv[i + 1] + 0.5e0)
         |        * sv[i + 1] / 127) AS errs
         |  FROM e CROSS JOIN sv),
         |m AS (SELECT vec_id, label,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(errs, x -> x * x)),
         |      (acc, x) -> acc + x) / $Dim AS mse,
         |    list_reduce(list_prepend(0.0e0,
         |      list_transform(errs, x -> abs(x))),
         |      (acc, x) -> GREATEST(acc, x)) AS max_err
         |  FROM err)
         |SELECT rn, vec_id, label, mse, max_err
         |FROM (SELECT *, row_number() OVER (ORDER BY mse DESC, vec_id)
         |        AS rn FROM m)
         |WHERE rn <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).embeddings
        .select($"vec_id", $"label", Vectors.toDouble($"embedding").as("v"))
      val sv = e.select(posexplode($"v").as(Seq("i", "x")))
        .groupBy($"i").agg(greatest(max(abs($"x")), lit(1e-12)).as("s"))
        .agg(expr("transform(array_sort(collect_list(struct(i, s)))," +
          " p -> p.s)").as("sv"))
      e.crossJoin(broadcast(sv))
        .withColumn("errs", expr(
          s"""transform(sequence(0, ${Dim - 1}), i ->
             |  v[i] - floor(v[i] * 127D / sv[i] + 0.5D)
             |    * sv[i] / 127D)""".stripMargin))
        .select($"vec_id", $"label",
          (expr("aggregate(transform(errs, x -> x * x)," +
            " cast(0.0 as double), (acc, x) -> acc + x)") / Dim).as("mse"),
          expr("aggregate(transform(errs, x -> abs(x))," +
            " cast(0.0 as double), (acc, x) -> greatest(acc, x))")
            .as("max_err"))
        .withColumn("rn", row_number().over(
          Window.orderBy($"mse".desc, $"vec_id")))
        .filter($"rn" <= TopK)
        .select($"rn", $"vec_id", $"label", $"mse", $"max_err")
    },

    // ---- label-centroid cosine matrix ---------------------------------
    // Per-label centroids via per-dimension decimal-accumulated means
    // (posexplode → (label, dim) davg — order-independent, partial-
    // aggregable); the |labels|×Dim result re-assembles into arrays and
    // the pairwise cosine over label_a < label_b is row-local double
    // folds on a |labels|²-row frame. Scale shape: the only corpus-sized
    // stage is the explode + partial aggregate (shuffles |labels|·Dim·
    // partitions rows, not the corpus); everything after is
    // centroid-table-sized. At 100 TB this is the per-class semantic
    // audit a labeling pipeline ships with every release.
    Qry(
      "q166_centroid_sim",
      s"""WITH $eCte,
         |ce AS (SELECT label, i, ${davgSql("v[i + 1]")} AS c
         |       FROM e, range($Dim) t(i) GROUP BY 1, 2),
         |cv AS (SELECT label, list(c ORDER BY i) AS cv
         |       FROM ce GROUP BY 1),
         |p AS (SELECT a.label AS label_a, b.label AS label_b,
         |    list_dot_product(a.cv, b.cv)
         |      / (sqrt(list_dot_product(a.cv, a.cv))
         |        * sqrt(list_dot_product(b.cv, b.cv))) AS cosine
         |  FROM cv a JOIN cv b ON a.label < b.label)
         |SELECT label_a, label_b, cosine FROM p""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      // staged: both sides of the pair self-join read ONE materialized
      // |labels|-row centroid table — without it the static plan runs
      // the corpus explode+aggregate twice (one full extra pass at scale)
      val cv = graft.operators.Staging.stage(
        t(spark, dir).embeddings
          .select($"label", posexplode(Vectors.toDouble($"embedding"))
            .as(Seq("i", "x")))
          .groupBy($"label", $"i").agg(davg($"x").as("c"))
          .groupBy($"label")
          .agg(expr("transform(array_sort(collect_list(struct(i, c)))," +
            " p -> p.c)").as("cv")),
        eager = false)
      val a = cv.select($"label".as("label_a"), $"cv".as("va"))
      val b = cv.select($"label".as("label_b"), $"cv".as("vb"))
      a.join(b, $"label_a" < $"label_b")
        .select($"label_a", $"label_b",
          (Vectors.dot($"va", $"vb")
            / (Vectors.norm($"va") * Vectors.norm($"vb"))).as("cosine"))
    }
  )
}
