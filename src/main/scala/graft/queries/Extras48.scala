package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Forty-eighth coverage wave: CSV and JSON-lines round-trips, upgrading
  * the last two spec-only source formats (SURVEY §2.4 scans row) to
  * oracle-checked catalog entries. Each query writes a typed projection
  * out in the interchange format, reads it back with the WRITER'S
  * schema (explicit — inference is nondeterministic surface, not
  * production practice), and aggregates; the DuckDB oracle computes the
  * same aggregate from the original parquet, so the hash match proves
  * the round-trip preserved every value bit-for-bit (doubles survive
  * via shortest-roundtrip rendering on write + exact parse on read;
  * timestamps are cast to DATE first — sub-second serialization is the
  * classic interchange-format trap, and date-granularity columns are
  * what actually ships in CSV extracts). Scale shape: format round-trip
  * cost is the write+scan itself; both sides stay columnar-parallel and
  * the aggregate is the same partial-agg shape as q1.
  */
object Extras48 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- CSV round-trip -------------------------------------------------
    Qry(
      "q183_csv_roundtrip",
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${dsumSql("l_quantity")} AS qty_sum,
         |  ${dsumSql("l_extendedprice")} AS price_sum,
         |  MIN(CAST(l_shipdate AS DATE)) AS first_ship,
         |  MAX(CAST(l_shipdate AS DATE)) AS last_ship
         |FROM lineitem WHERE l_suppkey % 7 = 0
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = RoundTrip.dir(s"$dir#csv")
      val src = t(spark, dir).lineitem
        .filter($"l_suppkey" % 7 === 0)
        .select($"l_orderkey", $"l_returnflag", $"l_quantity",
          $"l_extendedprice", to_date($"l_shipdate").as("ship_date"))
      src.write.mode("overwrite").option("header", "true").csv(out)
      spark.read.schema(src.schema).option("header", "true").csv(out)
        .groupBy($"l_returnflag")
        .agg(count(one).as("n"), dsum($"l_quantity").as("qty_sum"),
          dsum($"l_extendedprice").as("price_sum"),
          min($"ship_date").as("first_ship"),
          max($"ship_date").as("last_ship"))
    },

    // ---- JSON-lines round-trip ------------------------------------------
    Qry(
      "q184_json_roundtrip",
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS price_sum,
         |  MIN(CAST(o_orderdate AS DATE)) AS first_order,
         |  MAX(CAST(o_orderdate AS DATE)) AS last_order
         |FROM orders WHERE o_custkey % 5 = 0
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = RoundTrip.dir(s"$dir#json")
      val src = t(spark, dir).orders
        .filter($"o_custkey" % 5 === 0)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          to_date($"o_orderdate").as("order_date"))
      src.write.mode("overwrite").json(out)
      spark.read.schema(src.schema).json(out)
        .groupBy($"o_orderstatus")
        .agg(count(one).as("n"), dsum($"o_totalprice").as("price_sum"),
          min($"order_date").as("first_order"),
          max($"order_date").as("last_order"))
    }
  )
}
