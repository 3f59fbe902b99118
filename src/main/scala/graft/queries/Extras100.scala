package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{ArrowIpc, Tables}

/** Hundredth coverage wave: Arrow IPC interchange round-trip.
  *
  *  - q291: a typed lineitem projection (BIGINT, INT, STRING, DOUBLE)
  *    writes as Arrow stream-format files — one file per partition,
  *    written task-side ([[graft.sources.ArrowIpc]]) — and reads back
  *    through the `graft-arrow` DataSource V2 batch source (one read
  *    task per file). The aggregate runs on the READ-BACK frame and
  *    hash-matches an oracle computed from the original parquet, so
  *    any bit lost in either direction (including double payloads —
  *    sum_cents derives from the round-tripped doubles) fails the
  *    gate. This is the interchange format the ML stacks downstream of
  *    a training-data pipeline actually consume (pandas/polars/Ray
  *    read Arrow streams zero-copy); with CSV q183, JSON-lines q184,
  *    Avro q188, the interchange family now covers it. Scale shape:
  *    write = one pass, task-local, bounded by the 4096-row record
  *    batch; read fans one task per file.
  */
object Extras100 {

  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    Qry(
      "q291_arrow_roundtrip",
      """SELECT l_returnflag AS flag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_lineno,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // write once per session per fixture dir (bench warm/timed runs
      // reuse it — the Streams.partedDir discipline), read back via
      // the DSv2 source, aggregate the ROUND-TRIPPED values
      val out = ArrowIpc.writeCached(s"$dir#q291",
        Tables(spark, dir).lineitem.select(
          $"l_orderkey", $"l_linenumber", $"l_returnflag",
          $"l_extendedprice"))
      spark.read.format("graft-arrow").load(out)
        .groupBy($"l_returnflag".as("flag"))
        .agg(count(one).as("n"),
          sum($"l_orderkey").as("sum_key"),
          sum($"l_linenumber").as("sum_lineno"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .as("sum_cents"))
    }
  )
}
