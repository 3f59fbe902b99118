package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Wire-format fidelity: the reference's records are per-field
  * little-endian byte blobs packed by producers and decoded by consumers
  * (`/root/reference/src/main.rs:46-62`, `:86`). This query emulates that
  * full path — pack each lineitem row into the reference's record layout
  * with codegen'd `le_encode_*` expressions, decode it back with
  * `le_*` at field offsets, and aggregate the DECODED values. The DuckDB
  * oracle aggregates the ORIGINAL columns: the hash match proves
  * decode ∘ encode = identity through real Tungsten binary rows.
  */
object Wire {

  val all: Seq[Qry] = Seq(
    Qry(
      "q47_wire_roundtrip",
      s"""SELECT l_returnflag,
         |  COUNT(*) AS n,
         |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
         |  CAST(SUM(l_linenumber) AS BIGINT) AS line_sum,
         |  ${dsumSql("l_extendedprice")} AS price_sum
         |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      // record layout: [orderkey u64 @0][extendedprice f64 @8][linenumber u32 @16]
      Tables(spark, dir).lineitem
        .select($"l_returnflag",
          concat(
            expr("le_encode_u64(l_orderkey)"),
            expr("le_encode_f64(l_extendedprice)"),
            expr("le_encode_u32(l_linenumber)")).as("rec"))
        .select($"l_returnflag",
          expr("le_u64(rec, 0)").as("l_orderkey"),
          expr("le_f64(rec, 8)").as("l_extendedprice"),
          expr("le_u32(rec, 16)").as("l_linenumber"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_orderkey").as("key_sum"),
          sum($"l_linenumber").as("line_sum"),
          dsum($"l_extendedprice").as("price_sum"))
    }
  )
}
