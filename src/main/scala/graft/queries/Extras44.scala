package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Forty-fourth coverage wave: REAL multimodal header decode.
  *
  * q177 replaces the round-1–5 "stub decode" story for image metadata:
  * each document's payload hash parameterizes a VALID 54-byte BMP header
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, public layout) serialized with
  * the codegen'd `le_encode_*` wire expressions, and the metadata is then
  * recovered by PARSING THE BYTES with the native `bmp_width` /
  * `bmp_height` / `bmp_bpp` Catalyst expressions
  * (functions/MediaHeader.scala) — magic check + fixed-offset
  * little-endian reads inside whole-stage codegen, no UDF, no codec. The
  * DuckDB oracle builds the identical blob (printf-hex → unhex) and
  * decodes it by slicing the blob's hex serialization byte-for-byte, so
  * the hash match proves the parse reads the actual public byte layout,
  * not a formula shortcut. Scale shape: one documents scan, everything
  * row-local — the metadata-extraction pass a 100 TB media corpus runs
  * as its first curation step. Genuinely codec-requiring work (pixel
  * decode, frame extraction) would ride the same binary columns through
  * partition-batched iteration once a codec exists in the deployment;
  * header fields never need one.
  */
object Extras44 {

  val all: Seq[Qry] = Seq(

    // ---- BMP header synth + native parse ------------------------------
    Qry(
      "q177_media_header_decode", {
        // little-endian u32 as 4 hex pairs (DuckDB builds the blob from
        // hex and slices hex back out — its substring() has no BLOB
        // overload, so hex(blob) IS the slicing surface)
        def le32(x: String) =
          s"printf('%02x%02x%02x%02x', ($x)%256, (($x)//256)%256," +
            s" (($x)//65536)%256, (($x)//16777216)%256)"
        def sl(off: Int) = s"substr(hx, ${2 * off + 1}, 2)"
        def leRead(off: Int, n: Int) =
          (off + n - 1).to(off, -1).map(sl).mkString(" || ")
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    64 + h60 % 1921 AS w, 64 + (h60 // 1921) % 1081 AS h,
           |    CASE h60 % 6 WHEN 0 THEN 1 WHEN 1 THEN 4 WHEN 2 THEN 8
           |      WHEN 3 THEN 16 WHEN 4 THEN 24 ELSE 32 END AS bpp
           |  FROM d),
           |g AS (SELECT doc_id, w, h, bpp,
           |    ((bpp * w + 31) // 32) * 4 * h AS isz FROM p),
           |b AS (SELECT doc_id, unhex('424d' || ${le32("54 + isz")}
           |    || '00000000' || '36000000' || '28000000'
           |    || ${le32("w")} || ${le32("h")}
           |    || '0100' || printf('%02x', bpp) || '00' || '00000000'
           |    || ${le32("isz")} || '130b0000' || '130b0000'
           |    || '00000000' || '00000000') AS blob FROM g),
           |x AS (SELECT doc_id, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id,
           |  CAST(('0x' || ${leRead(18, 4)}) AS INTEGER) AS width,
           |  CAST(('0x' || ${leRead(22, 4)}) AS INTEGER) AS height,
           |  CAST(('0x' || ${leRead(28, 2)}) AS INTEGER) AS bpp,
           |  CAST(('0x' || ${leRead(2, 4)}) AS BIGINT) AS file_bytes
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("w", expr("CAST(64 + h60 % 1921 AS INT)"))
        .withColumn("h", expr("CAST(64 + (h60 DIV 1921) % 1081 AS INT)"))
        .withColumn("bpp", element_at(
          array(Seq(1, 4, 8, 16, 24, 32).map(lit): _*),
          ($"h60" % 6).cast("int") + 1))
        .withColumn("isz", expr("((bpp * w + 31) DIV 32) * 4 * h"))
        // 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER, every field the
        // spec's: size/offsets/planes/compression/2835 ppm resolution
        .withColumn("blob", concat(
          lit(Array[Byte](0x42.toByte, 0x4D.toByte)),
          expr("le_encode_u32(CAST(54 + isz AS INT))"),
          expr("le_encode_u32(0)"),
          expr("le_encode_u32(54)"),
          expr("le_encode_u32(40)"),
          expr("le_encode_u32(w)"),
          expr("le_encode_u32(h)"),
          expr("le_encode_u32(1 + bpp * 65536)"),
          expr("le_encode_u32(0)"),
          expr("le_encode_u32(CAST(isz AS INT))"),
          expr("le_encode_u32(2835)"),
          expr("le_encode_u32(2835)"),
          expr("le_encode_u32(0)"),
          expr("le_encode_u32(0)")))
        .select($"doc_id".as("media_id"),
          expr("bmp_width(blob)").as("width"),
          expr("bmp_height(blob)").as("height"),
          expr("bmp_bpp(blob)").as("bpp"),
          expr("le_u32(blob, 2)").as("file_bytes"))
    }
  )
}
