package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Fifty-fifth coverage wave: container formats a 100-TB corpus
  * pipeline meets BEFORE the media decoders ever run —
  *
  *  - q201: TIFF, the family's endianness-SWITCHING container: the
  *    synthesized corpus mixes II/MM byte orders, SHORT/LONG value
  *    types and 0-2 padding IFD entries before the dimension tags, so
  *    the oracle hash pins the endian-aware IFD walk in all layouts.
  *  - q202: gzip member headers (RFC 1952) — MTIME/OS plus the
  *    zero-terminated FNAME behind an optional FEXTRA field: the
  *    family's first STRING-valued decode, and the metadata a
  *    WARC.gz/jsonl.gz ingest job reads before any decompression.
  *  - q203: zstd frame headers (RFC 8878) — declared content size at
  *    all four field widths (incl. the +256 bias of the 16-bit form)
  *    and the window descriptor: exactly what a pipeline uses to size
  *    decompression buffers and to split work WITHOUT decompressing.
  *
  * All synthesis is hash-driven in-engine (the q192 pattern) with
  * parameter-level oracles; every decode is a codegen'd expression
  * over one binary column — pure map stage, no UDF, no shuffle.
  */
object Extras55 {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private def h60Of(spark: SparkSession, dir: String) =
    t(spark, dir).documents.select(col("doc_id"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  // endianness-parameterized byte writers over BIGINT SQL expressions
  private def u8(x: String) =
    expr(s"le_encode_u8(CAST(($x) % 256 AS INT))")
  private def u16le(x: String) = concat(u8(x), u8(s"($x) DIV 256"))
  private def u16be(x: String) = concat(u8(s"($x) DIV 256"), u8(x))
  private def u32le(x: String) = concat(u8(x), u8(s"($x) DIV 256"),
    u8(s"($x) DIV 65536"), u8(s"($x) DIV 16777216"))
  private def u32be(x: String) = concat(u8(s"($x) DIV 16777216"),
    u8(s"($x) DIV 65536"), u8(s"($x) DIV 256"), u8(x))
  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  val all: Seq[Qry] = Seq(

    // ---- TIFF: endian-aware IFD walk ------------------------------------
    Qry(
      "q201_tiff_header",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 9 = 0) AS corrupt,
         |    ((h60 // 2) % 2 = 0) AS short_t,
         |    CASE WHEN (h60 // 2) % 2 = 0
         |      THEN 1 + (h60 // 64) % 65535
         |      ELSE 1 + (h60 // 64) % 1000000 END AS w,
         |    CASE WHEN (h60 // 2) % 2 = 0
         |      THEN 1 + (h60 // 4096) % 65535
         |      ELSE 1 + (h60 // 4096) % 1000000 END AS hh
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE w END AS width,
         |  CASE WHEN corrupt THEN NULL ELSE hh END AS height
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // one 12-byte IFD entry in either endianness; SHORT values sit
      // in the value field's FIRST two bytes (file order), LONG fills
      // all four — the exact inline rule the walk decodes
      def entry(le: Boolean, tag: Int, typ: String, v: String): Column = {
        val (w16, w32) = if (le) (u16le _, u32le _) else (u16be _, u32be _)
        concat(w16(tag.toString), w16(typ), w32("1"),
          when(expr(s"($typ) = 3"), concat(w16(v), bytesLit("0000")))
            .otherwise(w32(v)))
      }
      def blob(le: Boolean): Column = {
        val (w16, w32) = if (le) (u16le _, u32le _) else (u16be _, u32be _)
        val magic = if (le) lit("II".getBytes("US-ASCII"))
          else lit("MM".getBytes("US-ASCII"))
        val pad1 = entry(le, 254, "4", "0")
        val pad2 = entry(le, 255, "4", "0")
        concat(magic,
          w16("CASE WHEN corrupt THEN 43 ELSE 42 END"), w32("8"),
          w16("npad + 2"),
          when(col("npad") >= 1, pad1).otherwise(lit(Array.empty[Byte])),
          when(col("npad") === 2, pad2).otherwise(lit(Array.empty[Byte])),
          entry(le, 256, "typ", "w"), entry(le, 257, "typ", "hh"),
          w32("0"))
      }
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 9 = 0"))
        .withColumn("le", expr("h60 % 2 = 0"))
        .withColumn("typ", expr("CASE WHEN (h60 DIV 2) % 2 = 0 " +
          "THEN 3 ELSE 4 END"))
        .withColumn("npad", expr("CAST((h60 DIV 4) % 3 AS INT)"))
        .withColumn("w", expr("CASE WHEN typ = 3 " +
          "THEN 1 + (h60 DIV 64) % 65535 " +
          "ELSE 1 + (h60 DIV 64) % 1000000 END"))
        .withColumn("hh", expr("CASE WHEN typ = 3 " +
          "THEN 1 + (h60 DIV 4096) % 65535 " +
          "ELSE 1 + (h60 DIV 4096) % 1000000 END"))
        .withColumn("b", when(col("le"), blob(le = true))
          .otherwise(blob(le = false)))
        .select(col("doc_id"),
          expr("CAST(tiff_width(b) AS BIGINT)").as("width"),
          expr("CAST(tiff_height(b) AS BIGINT)").as("height"))
    },

    // ---- gzip member header ---------------------------------------------
    Qry(
      "q202_gzip_header",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 11 = 0) AS corrupt,
         |    (h60 % 5 = 0) AS has_extra,
         |    (h60 % 3 <> 0) AS has_name,
         |    (h60 // 2) % 4294967296 AS mt,
         |    CASE (h60 // 8) % 5 WHEN 0 THEN 0 WHEN 1 THEN 3
         |      WHEN 2 THEN 7 WHEN 3 THEN 10 ELSE 255 END AS os
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE mt END AS mtime,
         |  CASE WHEN corrupt THEN NULL ELSE os END AS os,
         |  CASE WHEN corrupt OR NOT has_name THEN NULL
         |    ELSE 'doc_' || doc_id || '.txt' END AS fname
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      val header = concat(bytesLit("1F"),
        u8("CASE WHEN corrupt THEN 140 ELSE 139 END"), bytesLit("08"),
        u8("CASE WHEN has_extra THEN 4 ELSE 0 END" +
          " + CASE WHEN has_name THEN 8 ELSE 0 END"),
        u32le("mt"), bytesLit("00"), u8("os"))
      val extra = when(col("has_extra"),
        concat(u16le("4"), bytesLit("6A6A6A6A")))
        .otherwise(lit(Array.empty[Byte]))
      val nameB = when(col("has_name"), concat(
        expr("CAST(concat('doc_', doc_id, '.txt') AS BINARY)"),
        bytesLit("00"))).otherwise(lit(Array.empty[Byte]))
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("has_extra", expr("h60 % 5 = 0"))
        .withColumn("has_name", expr("h60 % 3 <> 0"))
        .withColumn("mt", expr("(h60 DIV 2) % 4294967296"))
        .withColumn("os", element_at(
          array(Seq(0L, 3L, 7L, 10L, 255L).map(lit): _*),
          expr("CAST((h60 DIV 8) % 5 AS INT)") + 1))
        .withColumn("b", concat(header, extra, nameB))
        .select(col("doc_id"),
          expr("gzip_mtime(b)").as("mtime"),
          expr("gzip_os(b)").as("os"),
          expr("gzip_fname(b)").as("fname"))
    },

    // ---- zstd frame header ----------------------------------------------
    Qry(
      "q203_zstd_frame",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 11 = 0) AS corrupt,
         |    h60 % 4 AS fcs,
         |    ((h60 // 4) % 2 = 0) AS single,
         |    (h60 // 32) % 256 AS wd,
         |    (h60 // 64) AS raw
         |  FROM d),
         |q AS (SELECT doc_id, corrupt, fcs, single, wd,
         |    CASE fcs WHEN 0 THEN raw % 256
         |      WHEN 1 THEN raw % 65536 + 256
         |      WHEN 2 THEN raw % 4294967296
         |      ELSE raw % 4611686018427387904 END AS cs
         |  FROM p)
         |SELECT doc_id,
         |  CASE WHEN corrupt OR (fcs = 0 AND NOT single) THEN NULL
         |    ELSE cs END AS content_size,
         |  CASE WHEN corrupt OR single THEN NULL
         |    ELSE (CAST(1 AS BIGINT) << CAST(10 + wd // 8 AS INT))
         |      + ((CAST(1 AS BIGINT) << CAST(10 + wd // 8 AS INT)) // 8)
         |        * (wd % 8) END AS window_size
         |FROM q""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // dictionary-id field: flag 0..3 -> 0/1/2/4 bytes (content 'j's)
      val dict = when(col("dflag") === 0, lit(Array.empty[Byte]))
        .when(col("dflag") === 1, bytesLit("6A"))
        .when(col("dflag") === 2, bytesLit("6A6A"))
        .otherwise(bytesLit("6A6A6A6A"))
      // frame content size at its flag-determined width (the 16-bit
      // form stores value-256)
      val fcsBytes = when(expr("fcs = 0 AND single"), u8("csv"))
        .when(expr("fcs = 0"), lit(Array.empty[Byte]))
        .when(col("fcs") === 1, u16le("csv - 256"))
        .when(col("fcs") === 2, u32le("csv"))
        .otherwise(concat(u32le("csv % 4294967296"),
          u32le("csv DIV 4294967296")))
      val fhd = "fcs * 64 + CASE WHEN single THEN 32 ELSE 0 END + dflag"
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("fcs", expr("h60 % 4"))
        .withColumn("single", expr("(h60 DIV 4) % 2 = 0"))
        .withColumn("dflag", expr("CAST((h60 DIV 8) % 4 AS INT)"))
        .withColumn("wd", expr("(h60 DIV 32) % 256"))
        .withColumn("csv", expr("CASE h60 % 4 WHEN 0 THEN (h60 DIV 64) % 256 " +
          "WHEN 1 THEN (h60 DIV 64) % 65536 + 256 " +
          "WHEN 2 THEN (h60 DIV 64) % 4294967296 " +
          "ELSE (h60 DIV 64) % 4611686018427387904 END"))
        .withColumn("b", concat(
          u8("CASE WHEN corrupt THEN 41 ELSE 40 END"),
          bytesLit("B52FFD"), u8(fhd),
          when(col("single"), lit(Array.empty[Byte])).otherwise(u8("wd")),
          dict, fcsBytes))
        .select(col("doc_id"),
          expr("zstd_content_size(b)").as("content_size"),
          expr("zstd_window_size(b)").as("window_size"))
    }
  )
}
