package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal.{extractFeatures, MediaRecord}
import graft.operators.TextOps.P
import graft.sources.Tables

/** Multimodal pipeline queries: documents' UTF-8 payloads stand in for
  * media blobs (the fixtures carry no real media); the decode is a
  * deterministic stub (operators.Multimodal), the plumbing is real.
  * Oracle-checkable because the stub's features are pure functions of
  * the payload md5 + length, both computable in SQL.
  */
object MultimodalQ {

  val all: Seq[Qry] = Seq(

    // ---- binary payload + typed metadata + mapPartitions features ------
    Qry(
      "q48_media_features",
      s"""SELECT doc_id AS media_id, 'text/plain' AS mime,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS checksum,
         |  CAST(64 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    % 193 AS INTEGER) AS width,
         |  CAST(64 + (CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    // 193) % 193 AS INTEGER) AS height,
         |  CAST(1 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    % 7 AS INTEGER) AS n_frames
         |FROM documents""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .select($"doc_id".as("media_id"), lit("text/plain").as("mime"),
          encode($"text", "UTF-8").as("bytes"))
        .as[MediaRecord]
      extractFeatures(media).toDF()
    },

    // ---- frame sampling: bounded per-media explode ---------------------
    Qry(
      "q49_frame_sample",
      s"""WITH f AS (
         |  SELECT doc_id AS media_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60,
         |    CAST(1 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |      % 7 AS INTEGER) AS n_frames
         |  FROM documents)
         |SELECT media_id, CAST(unnest(range(n_frames)) AS INTEGER)
         |    AS frame_idx,
         |  ((h60 % $P) * 31 + unnest(range(n_frames))) % $P AS frame_hash
         |FROM f""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val media = Tables(spark, dir).documents
        .select($"doc_id".as("media_id"), lit("text/plain").as("mime"),
          encode($"text", "UTF-8").as("bytes"))
        .as[MediaRecord]
      extractFeatures(media).toDF()
        .select($"media_id", $"checksum",
          explode(sequence(lit(0), $"n_frames" - 1)).as("frame_idx"))
        .select($"media_id", $"frame_idx",
          ((($"checksum" % P) * 31 + $"frame_idx") % P).as("frame_hash"))
    }
  )
}
