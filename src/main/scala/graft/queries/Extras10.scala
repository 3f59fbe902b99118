package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables
import graft.streaming.Streams

/** Tenth coverage wave: keep-latest snapshot compaction, streaming
  * exactly-once dedup over an at-least-once source, and degree analytics
  * over the near-duplicate graph. */
object Extras10 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- keep-latest-per-key snapshot compaction -----------------------
    // The CDC/state-snapshot primitive: from an event log, the most
    // recent row per key. One shuffle + in-partition sort (row_number
    // top-1); ties on ms break on event_id so the survivor is unique.
    Qry(
      "q93_latest_snapshot",
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
        |r AS (SELECT user_id, event_id, ms, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ms DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, event_id AS last_event_id, ms AS last_ms,
        |  value AS last_value
        |FROM r WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ms".desc, $"event_id".desc)
      t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"value")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"ms".as("last_ms"), $"value".as("last_value"))
    },

    // ---- streaming exactly-once dedup ----------------------------------
    // The source delivers every event TWICE (two directory entries for
    // the same file — the at-least-once shape of a replayed upstream);
    // streaming dropDuplicates on the event key collapses it back to the
    // batch truth, which is exactly what the oracle states. Aggregation
    // of the deduped append stream happens batch-side on the sink (one
    // stateful operator per streaming query). At production scale the
    // dedup state would be bounded with dropDuplicatesWithinWatermark.
    Qry(
      "q94_stream_dedup",
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS val_sum
         |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val src = Streams.fileStreamDup(spark, dir, "events", copies = 2)
        .select($"event_id", $"event_type", $"value")
        .dropDuplicates("event_id")
      Streams.runToMemory(src, "append")
        .groupBy($"event_type")
        .agg(count(one).as("n_events"), dsum($"value").as("val_sum"))
    },

    // ---- near-duplicate graph degree histogram -------------------------
    // How entangled is the duplicate graph? Degree distribution over the
    // thresholded Jaccard pair set — the curation signal that separates
    // "pairwise dupes" from "boilerplate hubs". Every stage is a bounded
    // equi-join or hash agg (pairs come df-capped from jaccardPairs).
    Qry(
      "q95_dup_degree_hist",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
         |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |edges0 AS (SELECT da, db FROM pairs
         |  JOIN sizes sa ON da = sa.doc_id
         |  JOIN sizes sb ON db = sb.doc_id
         |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5e0),
         |edges AS (SELECT da AS id FROM edges0
         |          UNION ALL SELECT db FROM edges0),
         |deg AS (SELECT id, COUNT(*) AS degree FROM edges GROUP BY 1)
         |SELECT degree, COUNT(*) AS n_nodes
         |FROM deg GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val pairs = Dedup.jaccardPairs(
          Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
          "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b")
      pairs.select($"id_a".as("id"))
        .unionAll(pairs.select($"id_b".as("id")))
        .groupBy($"id").agg(count(one).as("degree"))
        .groupBy($"degree").agg(count(one).as("n_nodes"))
    }
  )
}
