package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Sixty-fifth coverage wave: the storage engine advising itself.
  *
  *  - q224: columnar ENCODING advisor. For each candidate lineitem
  *    column, per-chunk (4096-key ranges of l_orderkey — the row-group
  *    grain real writers encode at) run/sortedness/cardinality stats
  *    from ONE window pass shared by every column (one sort, five lag
  *    projections), then the rule a writer applies: long runs → RLE,
  *    narrow dictionaries → DICT, near-sorted → DELTA, else PLAIN.
  *    This is q204's compaction planner aimed one level lower — the
  *    page encoding — and the same design discipline: the PLAN is
  *    integer stats + CASE rules, nothing re-encoded. Chunk-local
  *    windows keep the stats embarrassingly partitionable (a global
  *    window would serialize the table through one sort at 100 TB —
  *    and would also be the WRONG statistic, since encodings reset per
  *    row group anyway).
  */
object Extras65 {

  private val Chunk = 4096L  // l_orderkey range per stats chunk

  /** Columns under advisement: (name, duckdb/spark-identical compare
    * semantics are native per type — no string canonicalization). */
  private val Cols = Seq(
    "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate",
    "l_orderkey")

  /** ceil(log2(nd)) for dictionary index width, as a CASE cascade on
    * integer thresholds (identical text both engines). */
  private def bitsSql(nd: String): String = {
    val whens = (0 to 24).map(b => s"WHEN $nd <= ${1L << b} THEN $b")
      .mkString(" ")
    s"(CASE $whens ELSE 25 END)"
  }

  /** The writer's rule, over the derived integer stats. */
  private def ruleSql(avgRun: String, bits: String, sorted: String): String =
    s"""(CASE WHEN $avgRun >= 4000 THEN 'rle'
       |  WHEN $bits <= 12 THEN 'dict'
       |  WHEN $sorted >= 990000 THEN 'delta'
       |  ELSE 'plain' END)""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q224_encoding_advisor", {
        val lags = Cols.zipWithIndex.map { case (c, i) =>
          s"lag($c) OVER w AS p$i" }.mkString(",\n    ")
        val branches = Cols.zipWithIndex.map { case (c, i) =>
          s"""SELECT '$c' AS column_name, COUNT(*) AS n,
             |  COUNT(DISTINCT $c) AS nd,
             |  SUM(CASE WHEN p$i IS NULL OR $c <> p$i
             |    THEN 1 ELSE 0 END) AS runs,
             |  SUM(CASE WHEN p$i IS NOT NULL THEN 1 ELSE 0 END) AS pairs,
             |  SUM(CASE WHEN p$i IS NOT NULL AND $c >= p$i
             |    THEN 1 ELSE 0 END) AS nondesc
             |FROM o""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH o AS (SELECT ${Cols.mkString(", ")},
           |    $lags
           |  FROM lineitem
           |  WINDOW w AS (PARTITION BY l_orderkey // $Chunk
           |    ORDER BY l_orderkey, l_linenumber, l_returnflag,
           |      l_linestatus, l_quantity, l_shipdate)),
           |s AS ($branches)
           |SELECT column_name, CAST(n AS BIGINT) AS n,
           |  CAST(nd AS BIGINT) AS n_distinct,
           |  CAST(runs AS BIGINT) AS runs,
           |  CAST(n * 1000 // runs AS BIGINT) AS avg_run_x1000,
           |  CAST(nondesc * 1000000 // pairs AS BIGINT) AS sorted_ppm,
           |  CAST(${bitsSql("nd")} AS BIGINT) AS dict_bits,
           |  ${ruleSql(s"n * 1000 // runs", bitsSql("nd"),
               s"nondesc * 1000000 // pairs")} AS encoding
           |FROM s""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // (l_orderkey, l_linenumber) is NOT unique in the fixture —
      // every advised column joins the sort key so remaining ties are
      // value-identical and the lag stats are order-invariant
      val w = Window.partitionBy(expr(s"l_orderkey div $Chunk"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag",
          $"l_linestatus", $"l_quantity", $"l_shipdate")
      // ONE window pass computes every column's lag (one sort, shared);
      // the per-column aggregate branches read the same projection
      val o = graft.operators.Staging.stage(
        Tables(spark, dir).lineitem
          .select(Cols.map(col) :+ $"l_linenumber": _*)
          .select((Cols.map(col) :+ $"l_linenumber") ++
            Cols.zipWithIndex.map { case (c, i) =>
              lag(col(c), 1).over(w).as(s"p$i") }: _*),
        eager = false)
      val branches = Cols.zipWithIndex.map { case (c, i) =>
        o.agg(
          count(lit(1)).as("n"),
          countDistinct(col(c)).as("nd"),
          sum(when(col(s"p$i").isNull || col(c) =!= col(s"p$i"), 1)
            .otherwise(0)).as("runs"),
          sum(when(col(s"p$i").isNotNull, 1).otherwise(0)).as("pairs"),
          sum(when(col(s"p$i").isNotNull && col(c) >= col(s"p$i"), 1)
            .otherwise(0)).as("nondesc"))
          .select(lit(c).as("column_name"), $"n", $"nd", $"runs",
            $"pairs", $"nondesc")
      }
      branches.reduce(_ unionByName _)
        .select($"column_name",
          $"n".cast(LongType).as("n"),
          $"nd".cast(LongType).as("n_distinct"),
          $"runs".cast(LongType).as("runs"),
          expr("n * 1000 div runs").cast(LongType).as("avg_run_x1000"),
          expr("nondesc * 1000000 div pairs").cast(LongType)
            .as("sorted_ppm"),
          expr(bitsSql("nd")).cast(LongType).as("dict_bits"),
          expr(ruleSql("n * 1000 div runs", bitsSql("nd"),
            "nondesc * 1000000 div pairs")).as("encoding"))
    }
  )
}
