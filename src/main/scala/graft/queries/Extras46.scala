package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Forty-sixth coverage wave: the PNG (big-endian) half of the media
  * header decode, completing q177's BMP (little-endian) path.
  *
  * q181 synthesizes a valid 33-byte PNG prefix (8-byte signature + IHDR
  * chunk, public layout) per document from its payload hash and recovers
  * the metadata by PARSING THE BYTES with the native `png_width` /
  * `png_height` / `png_bit_depth` / `png_color_type` Catalyst
  * expressions (functions/MediaHeader.scala) — network-byte-order reads
  * inside whole-stage codegen. Two things q177 does not cover are
  * first-class here:
  *
  *  - the BIG-ENDIAN read path (PNG is network order; BMP is LE), and
  *  - the NULL-degradation contract ON THE ORACLE: ~10% of rows get a
  *    corrupted signature byte, the Spark expressions must decode them
  *    to NULL (never throw — the mixed/corrupt-corpus behavior at
  *    100 TB), and the DuckDB twin states the same magic check
  *    declaratively, so the hash match proves corrupt → NULL, not just
  *    happy-path parsing.
  *
  * The depth/color fields are drawn from spec-valid combinations
  * (colour types 0/2/4/6 with depths 8/16); the IHDR CRC is a fixed
  * dummy — the header parse deliberately reads structure, not
  * integrity (CRC validation is codec-tier work).
  */
object Extras46 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q181_png_header", {
        // big-endian u32/u8 as hex — network order means the hex string
        // IS the byte order, no per-byte reversal anywhere
        def be32(x: String) = s"printf('%08x', $x)"
        def be8(x: String) = s"printf('%02x', $x)"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    1 + h60 % 4096 AS w, 1 + (h60 // 4096) % 4096 AS ht,
           |    8 + 8 * (h60 % 2) AS depth,
           |    CASE (h60 // 2) % 4 WHEN 0 THEN 0 WHEN 1 THEN 2
           |      WHEN 2 THEN 4 ELSE 6 END AS color,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, corrupt, unhex(
           |    (CASE WHEN corrupt THEN '88' ELSE '89' END)
           |    || '504e470d0a1a0a' || '0000000d' || '49484452'
           |    || ${be32("w")} || ${be32("ht")}
           |    || ${be8("depth")} || ${be8("color")}
           |    || '000000' || 'deadbeef') AS blob FROM p),
           |x AS (SELECT doc_id, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id,
           |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
           |         AND substr(hx, 25, 8) = '49484452'
           |    THEN CAST(('0x' || substr(hx, 33, 8)) AS INTEGER)
           |    ELSE NULL END AS width,
           |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
           |         AND substr(hx, 25, 8) = '49484452'
           |    THEN CAST(('0x' || substr(hx, 41, 8)) AS INTEGER)
           |    ELSE NULL END AS height,
           |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
           |         AND substr(hx, 25, 8) = '49484452'
           |    THEN CAST(('0x' || substr(hx, 49, 2)) AS INTEGER)
           |    ELSE NULL END AS bit_depth,
           |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
           |         AND substr(hx, 25, 8) = '49484452'
           |    THEN CAST(('0x' || substr(hx, 51, 2)) AS INTEGER)
           |    ELSE NULL END AS color_type
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      // big-endian u32 as four u8 bytes (no int byteswap: the swapped
      // value of a 12-bit field would overflow a signed i32)
      def be32(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) DIV 16777216 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("w", expr("CAST(1 + h60 % 4096 AS INT)"))
        .withColumn("ht", expr("CAST(1 + (h60 DIV 4096) % 4096 AS INT)"))
        .withColumn("depth", expr("CAST(8 + 8 * (h60 % 2) AS INT)"))
        .withColumn("color", element_at(
          array(Seq(0, 2, 4, 6).map(lit): _*),
          // integer DIV, never `/`: h60 is a 60-bit value and a double
          // quotient drops low bits beyond the 53-bit mantissa
          expr("CAST((h60 DIV 2) % 4 AS INT)") + 1))
        .withColumn("blob", concat(
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 136 ELSE 137 END)"),
          lit(Array[Byte](0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)),
          lit(Array[Byte](0x00, 0x00, 0x00, 0x0D)),
          lit("IHDR".getBytes("US-ASCII")),
          be32("w"), be32("ht"),
          expr("le_encode_u8(depth)"), expr("le_encode_u8(color)"),
          lit(Array[Byte](0x00, 0x00, 0x00)),
          lit(Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte,
            0xEF.toByte))))
        .select($"doc_id".as("media_id"),
          expr("png_width(blob)").as("width"),
          expr("png_height(blob)").as("height"),
          expr("png_bit_depth(blob)").as("bit_depth"),
          expr("png_color_type(blob)").as("color_type"))
    }
  )
}
