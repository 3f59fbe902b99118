package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.sources.Tables

/** Thirty-fourth coverage wave: data-layout management — Z-order
  * clustering (`operators/ZOrder`), the write-time step that makes
  * multi-column scan pruning possible at 100 TB. The query materializes
  * the layout DIAGNOSTIC an engine would run after an OPTIMIZE: bucket
  * the table by contiguous z-range (the would-be file boundaries) and
  * report each bucket's bounding rectangle in both source dimensions.
  * Tight rectangles on BOTH columns are the property that lets per-file
  * min/max statistics prune on either predicate; `ZOrderSpec` turns the
  * same property into a measured file-skipping comparison against a
  * single-column layout.
  */
object Extras34 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  val all: Seq[Qry] = Seq(

    // ---- z-order layout diagnostic ------------------------------------
    // Dims: o_custkey and order date (days since 1992-01-01), each
    // min/max-normalized to 16 bits from one single-row aggregate
    // (broadcast back — never a shuffle), Morton-interleaved by the
    // unrolled expression tree, bucketed by the top 6 z-bits (64
    // would-be files). Per bucket: row count + both per-dim ranges.
    // The z arithmetic is bit-identical in DuckDB, so the oracle pins
    // every bucket boundary and every rectangle bound exactly.
    Qry(
      "q152_zorder_layout",
      s"""WITH d AS (SELECT o_custkey AS ck,
         |    datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS dd
         |  FROM orders),
         |s AS (SELECT min(ck) AS ck_mn, max(ck) AS ck_mx,
         |    min(dd) AS dd_mn, max(dd) AS dd_mx FROM d),
         |z AS (SELECT ck, dd,
         |    ${ZOrder.interleaveSql(
                  ZOrder.scaleSql("ck", "ck_mn", "ck_mx"),
                  ZOrder.scaleSql("dd", "dd_mn", "dd_mx"))} AS zv
         |  FROM d CROSS JOIN s)
         |SELECT zv >> 26 AS bucket, COUNT(*) AS n_rows,
         |  min(ck) AS ck_lo, max(ck) AS ck_hi,
         |  min(dd) AS dd_lo, max(dd) AS dd_hi
         |FROM z GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir).orders.select($"o_custkey".as("ck"),
        datediff($"o_orderdate", lit("1992-01-01")).cast("long").as("dd"))
      val s = d.agg(min($"ck").as("ck_mn"), max($"ck").as("ck_mx"),
        min($"dd").as("dd_mn"), max($"dd").as("dd_mx"))
      d.crossJoin(broadcast(s))
        .withColumn("zv", ZOrder.interleave16(
          ZOrder.scale16($"ck", $"ck_mn", $"ck_mx"),
          ZOrder.scale16($"dd", $"dd_mn", $"dd_mx")))
        .groupBy(shiftright($"zv", 26).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min($"ck").as("ck_lo"), max($"ck").as("ck_hi"),
          min($"dd").as("dd_lo"), max($"dd").as("dd_hi"))
    }
  )
}
