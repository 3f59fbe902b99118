package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Thirtieth coverage wave: the unbounded-non-file-source gap. Every
  * other streaming entry in the catalog reads a bounded file stream; the
  * reference's ingest side is an unbounded in-process queue
  * (`/root/reference/src/memory/low_latency_mpmc_ring.rs:62-135`), and
  * the closest oracle-checkable Spark analog is the rate source — a true
  * unbounded source with a deterministic payload (`value` = row index),
  * bounded HERE by result-count polling rather than source exhaustion
  * (see [[graft.streaming.Streams.boundedRate]]). The DuckDB oracle
  * regenerates the same index space with `range()` — no parquet table
  * involved, which is the point: the data never existed as files. */
object Extras30 {

  val all: Seq[Qry] = Seq(

    // ---- unbounded source, bounded consumption --------------------------
    // First 10k records of the rate stream, keyed-aggregated batch-side
    // after the bounded read (dedup/agg over an unbounded source with a
    // deterministic prefix). The catalog's other streaming queries prove
    // watermarks/state; this one proves the catalog can consume a source
    // that NEVER ends — the reference's actual operating mode.
    Qry(
      "q147_rate_source",
      """SELECT range % 7 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(range) AS BIGINT) AS sv
        |FROM range(0, 10000) GROUP BY 1""".stripMargin) { (spark, _) =>
      Streams.boundedRate(spark, 10000L)
        .groupBy((col("value") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    })
}
