package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps.P
import graft.sources.Tables

/** Multimodal pipeline queries: each document's UTF-8 payload becomes a
  * REAL BMP object (hash-derived dimensions written into a spec-correct
  * header, text bytes as the pixel payload), and the feature pass
  * decodes the header back with the codegen'd Catalyst expressions
  * (functions/MediaHeader.scala) — the same first-class path as
  * q177–q206. Round 9 retired the original `mapPartitions` decode stub
  * (operators.Multimodal): every scalar decode in the catalog is now a
  * Catalyst expression, with zero MapPartitions nodes in any batch plan
  * (pinned by CatalogInvariantSpec). Oracle-checkable because the
  * header fields are pure functions of the payload md5, re-derived by
  * SQL from the synthesis parameters (the q192 pattern).
  */
object MultimodalQ {

  val all: Seq[Qry] = Seq(

    // ---- binary payload + typed metadata + codegen'd feature decode ----
    // n_frames is typed METADATA riding beside the blob (a still image
    // decodes one frame; the sampler parameter arrives from ingestion),
    // exactly how a real multimodal table carries per-object hints the
    // payload itself cannot cheaply answer.
    Qry(
      "q48_media_features",
      s"""SELECT doc_id AS media_id, 'image/bmp' AS mime,
         |  CAST(30 + strlen(text) AS BIGINT) AS n_bytes,
         |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS checksum,
         |  CAST(64 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    % 193 AS INTEGER) AS width,
         |  CAST(64 + (CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    // 193) % 193 AS INTEGER) AS height,
         |  CAST(1 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
         |    % 7 AS INTEGER) AS n_frames
         |FROM documents""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      def le32(x: String) = expr(s"le_encode_u32(CAST(($x) AS INT))")
      // spec-correct 30-byte BMP prefix (magic, declared sizes, DIB
      // width/height/planes+bpp) + the document bytes as pixel payload
      val blob = concat(lit("BM".getBytes("US-ASCII")),
        le32("54"), le32("0"), le32("54"), le32("40"),
        le32("w"), le32("hgt"), le32((1 + 24 * 65536).toString),
        expr("CAST(text AS BINARY)"))
      Tables(spark, dir).documents
        .select($"doc_id", $"text",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("w", expr("CAST(64 + h60 % 193 AS INT)"))
        .withColumn("hgt", expr("CAST(64 + (h60 DIV 193) % 193 AS INT)"))
        .withColumn("blob", blob)
        .select($"doc_id".as("media_id"), lit("image/bmp").as("mime"),
          octet_length($"blob").cast("long").as("n_bytes"),
          $"h60".as("checksum"),
          expr("bmp_width(blob)").as("width"),
          expr("bmp_height(blob)").as("height"),
          expr("CAST(1 + h60 % 7 AS INT)").as("n_frames"))
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
      Tables(spark, dir).documents
        .select($"doc_id".as("media_id"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("checksum"))
        .select($"media_id", $"checksum",
          explode(sequence(lit(0),
            expr("CAST(checksum % 7 AS INT)"))).as("frame_idx"))
        .select($"media_id", $"frame_idx",
          ((($"checksum" % P) * 31 + $"frame_idx") % P).as("frame_hash"))
    }
  )
}
