package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Fifth coverage wave: map-typed columns (JSON → MapType) and the math
  * function family (transcendentals rounded to fixed precision — libm
  * implementations agree well inside 6 dp, verified by the oracle). */
object Extras5 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- map functions over JSON-decoded props -------------------------
    // Path extraction (get_json_object / json_object_keys), NOT
    // from_json into MapType: materializing a full map per row to read
    // one key and a key count is the per-row-parser anti-pattern — at
    // 100 TB the map never needs to exist. Parity with the DuckDB oracle
    // probed on events.props (clean single-key JSON objects, no nulls).
    Qry(
      "q67_map_funcs",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(len(json_keys(props))) AS BIGINT) AS total_keys,
        |  CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .select($"event_type",
          size(expr("json_object_keys(props)")).cast(LongType).as("nk"),
          get_json_object($"props", "$.k").as("kv"))
        .groupBy($"event_type")
        .agg(count(one).as("n"),
          sum($"nk").as("total_keys"),
          sum(when($"kv".isNotNull, 1).otherwise(0))
            .cast(LongType).as("with_k"),
          max($"kv".cast(LongType)).as("max_k"))
    },

    // ---- math function family ------------------------------------------
    Qry(
      "q68_math_funcs",
      """SELECT event_id,
        |  abs(value - 50e0) AS dist50,
        |  round(power(value, 2), 6) AS sq,
        |  round(sqrt(abs(value)), 6) AS root,
        |  round(exp(value / 100e0), 6) AS expv,
        |  round(log10(value + 1e0), 6) AS lg,
        |  CAST(sign(value - 50e0) AS DOUBLE) AS sgn,
        |  CAST(ceil(value) AS BIGINT) AS cl,
        |  CAST(floor(value) AS BIGINT) AS fl,
        |  CAST(trunc(value) AS INTEGER) % 7 AS md
        |FROM events WHERE event_id % 11 = 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .filter($"event_id" % 11 === 0)
        .select($"event_id",
          abs($"value" - 50.0).as("dist50"),
          round(pow($"value", 2), 6).as("sq"),
          round(sqrt(abs($"value")), 6).as("root"),
          round(exp($"value" / 100.0), 6).as("expv"),
          round(log10($"value" + 1.0), 6).as("lg"),
          signum($"value" - 50.0).as("sgn"),
          ceil($"value").cast(LongType).as("cl"),
          floor($"value").cast(LongType).as("fl"),
          ($"value".cast(IntegerType) % 7).as("md"))
    }
  )
}
