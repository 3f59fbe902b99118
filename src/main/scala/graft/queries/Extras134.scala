package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables

/** Hundred-thirty-fourth coverage wave: per-source numeric drift
  * attribution — q320's "which source drives it" question asked of a
  * CONTINUOUS column.
  *
  *  - q346: for every source, the exact two-sample KS statistic
  *    between that source's document-length distribution and the REST
  *    of the corpus: D_s = max over the length domain of
  *    |F_s(v) − F_rest(v)|, cross-multiplied to stay integral
  *    (q333's device) with the rest-side counts derived by margin
  *    algebra (global cumulative − source cumulative — no per-source
  *    corpus rescan, q320's discipline). Output one row per source:
  *    sample size, the argmax length and D in ppm — a ranked "which
  *    provenance looks least like the corpus" table. Windows run per
  *    (source × distinct length) — domain-bounded, never corpus rows
  *    after the one count groupBy.
  */
object Extras134 {

  /** Oracle shared VERBATIM with the streaming twin q347. */
  private[queries] val PerSourceKsOracle =
      """WITH v AS (SELECT source, n_chars AS val,
        |    CAST(COUNT(*) AS HUGEINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |dom AS (SELECT DISTINCT val FROM v),
        |src AS (SELECT DISTINCT source FROM v),
        |grid AS (SELECT s.source, d.val, COALESCE(v.c, 0) AS c
        |  FROM src s CROSS JOIN dom d
        |  LEFT JOIN v ON v.source = s.source AND v.val = d.val),
        |cum AS (SELECT source, val,
        |    SUM(c) OVER (PARTITION BY source ORDER BY val
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |    SUM(c) OVER (ORDER BY val, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
        |  FROM grid),
        |-- global cumulative per val: max over the val's rows of the
        |-- running (val, source) sum = the total through this val
        |gc AS (SELECT val, MAX(x) AS cg FROM cum GROUP BY 1),
        |n AS (SELECT source, SUM(c) AS ns FROM grid GROUP BY 1),
        |tot AS (SELECT SUM(c) AS nt FROM grid),
        |gap AS (SELECT cum.source, cum.val,
        |    (1000000 * abs(cum.cs * (tot.nt - n.ns)
        |      - (gc.cg - cum.cs) * n.ns))
        |      // (n.ns * (tot.nt - n.ns)) AS d_ppm
        |  FROM cum JOIN gc ON gc.val = cum.val
        |  JOIN n ON n.source = cum.source CROSS JOIN tot)
        |SELECT source, CAST(ns AS BIGINT) AS n_docs,
        |  CAST(val AS BIGINT) AS argmax_len,
        |  CAST(d_ppm AS BIGINT) AS d_ppm
        |FROM (SELECT g.*, n.ns, row_number() OVER
        |    (PARTITION BY g.source ORDER BY g.d_ppm DESC, g.val) AS rn
        |  FROM gap g JOIN n ON n.source = g.source)
        |WHERE rn = 1""".stripMargin

  /** KS-attribution tail over a (source, val, c) count table — shared
    * verbatim by q346 and the streaming twin q347. */
  private[queries] def ksTail(v0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import v0.sparkSession.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val v = v0.select($"source", $"val", dec($"c").as("c"))
    val dom = v.select($"val").distinct()
      val src = v.select($"source").distinct()
      val grid = src.crossJoin(broadcast(dom))
        .join(v.withColumnRenamed("c", "vc"), Seq("source", "val"),
          "left_outer")
        .select($"source", $"val",
          coalesce($"vc", lit(0).cast(DecimalType(38, 0))).as("c"))
      val wSrc = Window.partitionBy($"source").orderBy($"val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy($"val", $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid
        .withColumn("cs", sum($"c").over(wSrc))
        .withColumn("x", sum($"c").over(wAll))
      val gc = cum.groupBy($"val".as("gval")).agg(max($"x").as("cg"))
      val n = grid.groupBy($"source".as("ns_src"))
        .agg(sum($"c").as("ns"))
      val tot = grid.agg(sum($"c").as("nt"))
      val gap = cum.join(broadcast(gc), $"val" === $"gval")
        .join(broadcast(n), $"source" === $"ns_src")
        .crossJoin(broadcast(tot))
        .select($"source", $"val", $"ns",
          expr("(1000000 * abs(cs * (nt - ns) - (cg - cs) * ns)) " +
            "DIV (ns * (nt - ns))").as("d_ppm"))
      gap.withColumn("rn", row_number().over(
          Window.partitionBy($"source").orderBy($"d_ppm".desc, $"val")))
        .filter($"rn" === 1)
        .select($"source", $"ns".cast(LongType).as("n_docs"),
          $"val".cast(LongType).as("argmax_len"),
          $"d_ppm".cast(LongType).as("d_ppm"))
  }

  val all: Seq[Qry] = Seq(

    Qry("q346_per_source_ks", PerSourceKsOracle) { (spark, dir) =>
      import spark.implicits._
      ksTail(Tables(spark, dir).documents
        .groupBy($"source", $"n_chars".as("val"))
        .agg(count(lit(1)).as("c")))
    }
  )
}
