package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Seventy-seventh coverage wave: temporal corpus drift.
  *
  *  - q245: token-trend detection across crawl snapshots — the drift
  *    monitor a recurring-crawl pipeline runs before mixing a new
  *    snapshot into training data (a token whose frequency jumps
  *    snapshot-over-snapshot flags template spam, event-driven topic
  *    shift, or a scraper regression). Documents are assigned one of
  *    four snapshots by content hash; per-(snapshot, token) counts
  *    collapse map-side (the only corpus-sized stage), the
  *    snapshot-over-snapshot ratio is an integer-ppm lag over the
  *    vocabulary-bounded count table, and the top-5 risers per
  *    snapshot ride the rank-limit pushdown. Smoothing (+1 in the
  *    denominator) keeps new tokens finite and the arithmetic exact.
  */
object Extras77 {

  private[queries] val Snaps = 4
  private val TopK = 5
  private val MinCount = 20L

  /** Oracle text shared VERBATIM with the streaming twin q248
    * (Extras78) — stream/batch equivalence inside the gate hash. */
  private[queries] val DriftOracle: String =
    s"""WITH ${TextOps.oracleToksCte},
         |snapped AS (SELECT
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |      % $Snaps AS snap,
         |    unnest(tk) AS tok
         |  FROM toks),
         |cnt AS (SELECT snap, tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM snapped GROUP BY 1, 2),
         |lagged AS (SELECT snap, tok, c,
         |    lag(c) OVER (PARTITION BY tok ORDER BY snap) AS prev
         |  FROM cnt),
         |rises AS (SELECT snap, tok, c, COALESCE(prev, 0) AS prev,
         |    CAST(1000000 * (c - COALESCE(prev, 0))
         |      // (COALESCE(prev, 0) + 1) AS BIGINT) AS rise_ppm
         |  FROM lagged
         |  WHERE snap > 0 AND c >= $MinCount)
         |SELECT snap, CAST(rn AS INT) AS rank, tok, c, prev, rise_ppm
         |FROM (SELECT *, row_number() OVER (PARTITION BY snap
         |        ORDER BY rise_ppm DESC, tok) AS rn FROM rises)
         |WHERE rn <= $TopK""".stripMargin

  /** The drift tail (lag + rank over the snapshot x vocabulary count
    * table) shared by q245 and its streaming twin q248 — the per-
    * (snapshot, token) count table is the only part that differs
    * (batch scan vs streaming aggregation). */
  private[queries] def driftTail(cnt: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wLag = Window.partitionBy(col("tok")).orderBy(col("snap"))
    val wTop = Window.partitionBy(col("snap"))
      .orderBy(col("rise_ppm").desc, col("tok"))
    cnt
      .withColumn("prev", coalesce(lag(col("c"), 1).over(wLag), lit(0L)))
      .filter(col("snap") > 0 && col("c") >= MinCount)
      .withColumn("rise_ppm",
        expr("1000000 * (c - prev) DIV (prev + 1)"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= TopK)
      .select(col("snap"), col("rank"), col("tok"), col("c"),
        col("prev"), col("rise_ppm"))
  }

  val all: Seq[Qry] = Seq(

    Qry("q245_token_drift", DriftOracle) { (spark, dir) =>
      import spark.implicits._
      driftTail(Tables(spark, dir).documents
        .select((TextOps.md5Long($"text") % Snaps).as("snap"),
          explode(TextOps.tokens($"text")).as("tok"))
        .groupBy($"snap", $"tok").agg(count(lit(1)).cast(LongType).as("c")))
    }
  )
}
