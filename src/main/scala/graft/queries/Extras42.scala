package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Staging, Vectors}
import graft.sources.Tables

/** Forty-second coverage wave: warehouse maintenance + label QA +
  * lakehouse schema evolution.
  *
  *  - Incremental materialized-view merge (q171): maintain an aggregate
  *    MV from partial states (count / decimal sum / min / max are all
  *    mergeable) — the base partition's partials and the delta batch's
  *    partials re-aggregate to EXACTLY the full recompute, which is
  *    what the oracle asserts (it computes the direct aggregate; the
  *    hash match IS the incremental-equals-full proof). The batch
  *    analog of the `MaterializedViewSpec` streaming upsert.
  *  - Per-label embedding outliers (q172): vectors least similar to
  *    their OWN label centroid — the mislabeled-example / outlier
  *    screen every labeled-dataset release runs; composes q166's
  *    centroid machinery back onto the corpus.
  *  - Schema-evolution read (q173): two parquet generations (v2 adds a
  *    column), one mergeSchema read, aggregates over the union with
  *    nulls where v1 rows lack the new column — the lakehouse
  *    append-only schema-evolution contract, oracle-checked by
  *    re-deriving both generations from the fixture.
  */
object Extras42 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)


  private val OutK = 5

  val all: Seq[Qry] = Seq(

    // ---- incremental materialized-view merge --------------------------
    // MV state per event_type: (n, decimal val_sum, val_min, val_max) —
    // every component merges associatively. The query maintains the MV
    // incrementally (base partials ∪ delta partials → re-aggregate);
    // the oracle computes the full aggregate directly, so the hash
    // match proves incremental == full. The decimal sum stays DECIMAL
    // through the merge (doubles would re-introduce order dependence at
    // exactly the step the MV exists to make exact). Scale shape: the
    // base partials are |types| rows read from the stored MV at
    // production (here: derived); only the delta is scanned per
    // refresh; the merge aggregate is |types|-row.
    Qry(
      "q171_incremental_mv",
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${dsumSql("value")} AS val_sum,
         |  MIN(value) AS val_min, MAX(value) AS val_max
         |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .select($"event_type", $"event_id", $"value")
      // partial-state schema: n BIGINT, s DECIMAL(28,6), mn/mx DOUBLE
      def partials(part: org.apache.spark.sql.DataFrame) =
        part.groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast(graft.Exact.Money)).as("s"),
            min($"value").as("mn"), max($"value").as("mx"))
      val base = partials(e.filter($"event_id" % 2 === 0))
      val delta = partials(e.filter($"event_id" % 2 === 1))
      base.unionByName(delta)
        .groupBy($"event_type")
        .agg(sum($"n").as("n"), sum($"s").as("s"),
          min($"mn").as("val_min"), max($"mx").as("val_max"))
        .select($"event_type", $"n", $"s".cast("double").as("val_sum"),
          $"val_min", $"val_max")
    },

    // ---- per-label embedding outliers ---------------------------------
    // Each vector's cosine to its OWN label centroid; bottom-k per
    // label = mislabel/outlier candidates. The staged centroid table
    // (q166's machinery) broadcasts back onto the corpus; cosine is
    // row-local double folds; bottom-k rides the rank-limit pushdown.
    // Scale shape: one corpus pass for centroids (partial-aggregated
    // posexplode), one map-side scoring pass, k rows per label out.
    Qry(
      "q172_label_outliers",
      s"""WITH e AS (SELECT vec_id, label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ce AS (SELECT label, i, ${davgSql("v[i + 1]")} AS c
         |       FROM e, range(64) t(i) GROUP BY 1, 2),
         |cv AS (SELECT label, list(c ORDER BY i) AS cv
         |       FROM ce GROUP BY 1),
         |sc AS (SELECT vec_id, e.label,
         |    list_dot_product(v, cv)
         |      / (sqrt(list_dot_product(v, v))
         |        * sqrt(list_dot_product(cv, cv))) AS cos_own
         |  FROM e JOIN cv ON e.label = cv.label)
         |SELECT label, rn, vec_id, cos_own
         |FROM (SELECT *, row_number() OVER (PARTITION BY label
         |        ORDER BY cos_own, vec_id) AS rn FROM sc)
         |WHERE rn <= $OutK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).embeddings
        .select($"vec_id", $"label", Vectors.toDouble($"embedding").as("v"))
      val cv = Staging.stage(
        e.select($"label", posexplode($"v").as(Seq("i", "x")))
          .groupBy($"label", $"i").agg(davg($"x").as("c"))
          .groupBy($"label")
          .agg(expr("transform(array_sort(collect_list(struct(i, c)))," +
            " p -> p.c)").as("cv")),
        eager = false)
      e.join(broadcast(cv), "label")
        .select($"label", $"vec_id",
          (Vectors.dot($"v", $"cv")
            / (Vectors.norm($"v") * Vectors.norm($"cv"))).as("cos_own"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"label").orderBy($"cos_own", $"vec_id")))
        .filter($"rn" <= OutK)
        .select($"label", $"rn", $"vec_id", $"cos_own")
    },

    // ---- schema-evolution (mergeSchema) read --------------------------
    // Generation v1 (even orderkeys) lacks l_extendedprice; v2 (odd)
    // carries it. One mergeSchema read unions the generations with
    // nulls for v1's missing column — the lakehouse append-only
    // evolution contract. The aggregate proves NULL semantics: n counts
    // all rows, n_priced/price_sum only v2's. Oracle re-derives both
    // generations from the fixture (price masked NULL on even keys).
    // Scale shape: schema merge is a footer-only planning step; the
    // scan stays columnar and the aggregate partial+final.
    Qry(
      "q173_schema_evolution",
      s"""WITH u AS (SELECT l_returnflag, l_quantity,
         |    CASE WHEN l_orderkey % 2 = 1 THEN l_extendedprice END
         |      AS l_extendedprice
         |  FROM lineitem)
         |SELECT l_returnflag, COUNT(*) AS n,
         |  ${dsumSql("l_quantity")} AS qty_sum,
         |  COUNT(l_extendedprice) AS n_priced,
         |  ${dsumSql("l_extendedprice")} AS price_sum
         |FROM u GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = RoundTrip.dir(s"$dir#evol")
      val li = t(spark, dir).lineitem
      li.filter($"l_orderkey" % 2 === 0)
        .select($"l_returnflag", $"l_quantity")
        .write.mode("overwrite").parquet(s"$out/g=1")
      li.filter($"l_orderkey" % 2 === 1)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
        .write.mode("overwrite").parquet(s"$out/g=2")
      spark.read.option("mergeSchema", "true").parquet(out)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty_sum"),
          count($"l_extendedprice").as("n_priced"),
          dsum($"l_extendedprice").as("price_sum"))
    }
  )
}
