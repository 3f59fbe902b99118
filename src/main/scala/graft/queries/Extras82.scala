package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Eighty-second coverage wave: the transport family moves PAYLOAD
  * bytes, not just headers.
  *
  *  - q256: bounded gzip payload inflation round-trip. q202 parses gzip
  *    member headers; here the member body actually decompresses:
  *    every document's text is gzip-compressed IN-ENGINE
  *    (functions.GzipCompress) and inflated back through the bounded
  *    `gzip_inflate(blob, max_bytes)` expression, with three
  *    hash-chosen damage classes exercising the NULL contract — a
  *    truncated member (trailer cut), an inflate bound below the
  *    payload size (the zip-bomb guard firing), and a corrupted magic.
  *    The oracle predicts the INFLATED side purely from the synthesis
  *    parameters (the q192 pattern): intact rows must round-trip to
  *    exactly the original text's length and md5, damaged rows to NULL
  *    — the compressed bytes themselves are never asserted on, so the
  *    gate is independent of zlib version/level. Scale shape: one
  *    corpus scan, every stage a codegen'd projection, zero joins.
  */
object Extras82 {

  val all: Seq[Qry] = Seq(

    // ---- bounded gzip inflation round-trip ------------------------------
    Qry(
      "q256_gzip_roundtrip",
      """WITH d AS (SELECT doc_id, text,
        |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 7
        |      AS cls
        |  FROM documents)
        |SELECT doc_id, CAST(cls AS INT) AS cls,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE CAST(strlen(text) AS BIGINT) END AS inflated_len,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE md5(text) END AS inflated_md5
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      // damage classes 0/1/2; 3-6 intact (the majority, so the happy
      // path dominates the round-trip evidence):
      //   0: trailer cut (CRC32+ISIZE gone) -> EOF during trailer read
      //   1: inflate bound one byte below the payload -> bomb guard
      //   2: first magic byte overwritten -> not a gzip stream
      Tables(spark, dir).documents
        .select($"doc_id", $"text",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)" +
            " % 7").cast("int").as("cls"))
        .withColumn("blob", expr("gzip_compress(CAST(text AS BINARY))"))
        .withColumn("mutated",
          when($"cls" === 0, expr("substring(blob, 1, length(blob) - 8)"))
            .when($"cls" === 2, concat(lit(Array[Byte](0x58, 0x58)),
              expr("substring(blob, 3, length(blob) - 2)")))
            .otherwise($"blob"))
        // class 1's bound is len-1 (for an empty text that is -1, which
        // the expression also NULLs); intact rows get exactly len — the
        // tightest bound that must still succeed
        .withColumn("cap",
          when($"cls" === 1, expr("CAST(length(text) - 1 AS INT)"))
            .otherwise(expr("CAST(length(text) AS INT)")))
        .withColumn("inf", expr("gzip_inflate(mutated, cap)"))
        .select($"doc_id", $"cls",
          length($"inf").cast(LongType).as("inflated_len"),
          md5($"inf").as("inflated_md5"))
    }
  )
}
