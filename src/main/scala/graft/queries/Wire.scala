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
         |  CAST(SUM(l_suppkey) AS BIGINT) AS sym_sum,
         |  ${dsumSql("l_extendedprice")} AS price_sum,
         |  CAST(SUM(l_linenumber) AS BIGINT) AS qty_sum,
         |  CAST(MAX(epoch_ms(l_shipdate) * 1000000) AS BIGINT) AS ts_max,
         |  MAX(ascii(l_returnflag)) AS ex_max
         |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      // The reference's full 5-field record (/root/reference/src/main.rs:46-62):
      // [symbol_id u32 @0][price f64 @4][quantity u32 @12]
      // [timestamp u64 ns @16][exchange_id u8 @24] — 25 bytes packed.
      // symbol←suppkey, price←extendedprice, quantity←linenumber,
      // timestamp←shipdate epoch-ns, exchange←ascii(returnflag).
      Tables(spark, dir).lineitem
        .select($"l_returnflag",
          concat(
            expr("le_encode_u32(CAST(l_suppkey AS INT))"),
            expr("le_encode_f64(l_extendedprice)"),
            expr("le_encode_u32(l_linenumber)"),
            // l_shipdate is TIMESTAMP_NTZ; session tz is UTC, so the
            // cast is the identity instant mapping
            expr("le_encode_u64(unix_millis(CAST(l_shipdate AS TIMESTAMP)) * 1000000)"),
            expr("le_encode_u8(ascii(l_returnflag))")).as("rec"))
        .select($"l_returnflag",
          expr("le_u32(rec, 0)").as("symbol_id"),
          expr("le_f64(rec, 4)").as("price"),
          expr("le_u32(rec, 12)").as("quantity"),
          expr("le_u64(rec, 16)").as("ts_ns"),
          expr("le_u8(rec, 24)").as("exchange_id"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"symbol_id").as("sym_sum"),
          dsum($"price").as("price_sum"),
          sum($"quantity").as("qty_sum"),
          max($"ts_ns").as("ts_max"),
          max($"exchange_id").as("ex_max"))
    }
  )
}
