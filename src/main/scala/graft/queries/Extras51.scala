package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Fifty-first coverage wave: the remaining mainstream media
  * containers — JPEG (the web's dominant photographic format,
  * dimensions behind a variable-length MARKER-SEGMENT walk), GIF
  * (fixed-offset logical screen descriptor) and MP4/ISO-BMFF (the
  * video modality, movie header behind a BOX walk). With q177 BMP,
  * q181 PNG, q185/q186 WAV, this closes the header-decode family over
  * every container a crawl actually serves at volume — image, audio
  * AND video.
  *
  * q189 synthesizes a JPEG header per document in one of three layouts
  * (APP0 only / APP0+COM / APP0+Exif-APP1+COM — the segment stacks real
  * encoders emit before the frame header) with a hash-chosen
  * SOF0-vs-SOF2 frame marker, and decodes precision/height/width/
  * components with the `jpeg_*` expressions
  * (functions/MediaHeader.scala `JpegSofField`, big-endian
  * length-prefixed segment walk, budget 16). Like q186 the ORACLE does
  * not walk — it reads the SOF fields at the per-layout offsets it
  * synthesized, so a mislocated walk hash-fails. Corrupt slice (~10%,
  * SOI first byte flipped) → NULL on both engines.
  *
  * q190 does the GIF logical screen descriptor over both signature
  * versions (87a/89a). Scale shape for both: pure per-row map over a
  * pruned 2-column scan — no shuffle before the result.
  */
object Extras51 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q189_jpeg_header", {
        // constant segment hex (uppercase, matching DuckDB hex())
        val app0 = "FFE000104A46494600010100000100010000" // 18 B
        val app1 = "FFE1000E457869660000AABBCCDDEEFF" // 16 B
        val com = "FFFE0009636F6D6D656E74" // 11 B
        // SOF payload byte offset per layout: 2 (SOI) + pre + 4
        val so = "2 + CASE layout WHEN 0 THEN 18 WHEN 1 THEN 29" +
          " ELSE 45 END + 4"
        val magic = "substr(hx, 1, 4) = 'FFD8'"
        def u8(o: String) =
          s"CAST(('0x' || substr(hx, 2*($o)+1, 2)) AS INTEGER)"
        def be16(o: String) =
          s"CAST(('0x' || substr(hx, 2*($o)+1, 4)) AS INTEGER)"
        def guard(v: String) = s"CASE WHEN $magic THEN $v ELSE NULL END"
        def hbe16(x: String) = s"printf('%04x', $x)"
        def h8(x: String) = s"printf('%02x', $x)"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    h60 % 3 AS layout,
           |    CASE (h60 // 3) % 2 WHEN 0 THEN 192 ELSE 194 END AS sof,
           |    8 + 4 * ((h60 // 6) % 2) AS prec,
           |    CASE (h60 // 12) % 2 WHEN 0 THEN 1 ELSE 3 END AS ncomp,
           |    1 + (h60 // 24) % 8192 AS w,
           |    1 + (h60 // 196608) % 8192 AS hgt,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, layout, unhex(
           |    (CASE WHEN corrupt THEN 'FE' ELSE 'FF' END) || 'D8'
           |    || '$app0'
           |    || (CASE WHEN layout = 2 THEN '$app1' ELSE '' END)
           |    || (CASE WHEN layout >= 1 THEN '$com' ELSE '' END)
           |    || 'FF' || ${h8("sof")} || ${hbe16("8 + 3 * ncomp")}
           |    || ${h8("prec")} || ${hbe16("hgt")} || ${hbe16("w")}
           |    || ${h8("ncomp")}
           |    || (CASE ncomp WHEN 1 THEN '011100'
           |        ELSE '011100021101031101' END)) AS blob
           |  FROM p),
           |x AS (SELECT doc_id, layout, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id, CAST(layout AS INTEGER) AS layout,
           |  ${guard(u8(so))} AS precision,
           |  ${guard(be16(s"($so) + 1"))} AS height,
           |  ${guard(be16(s"($so) + 3"))} AS width,
           |  ${guard(u8(s"($so) + 5"))} AS components
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      def bytes(hex: String) = lit(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      def be16(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("layout", expr("CAST(h60 % 3 AS INT)"))
        .withColumn("sof",
          expr("CAST(CASE (h60 DIV 3) % 2 WHEN 0 THEN 192 ELSE 194 END" +
            " AS INT)"))
        .withColumn("prec", expr("CAST(8 + 4 * ((h60 DIV 6) % 2) AS INT)"))
        .withColumn("ncomp",
          expr("CAST(CASE (h60 DIV 12) % 2 WHEN 0 THEN 1 ELSE 3 END AS INT)"))
        .withColumn("w", expr("CAST(1 + (h60 DIV 24) % 8192 AS INT)"))
        .withColumn("hgt", expr("CAST(1 + (h60 DIV 196608) % 8192 AS INT)"))
        .withColumn("blob", concat(
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 254 ELSE 255 END)"),
          expr("le_encode_u8(216)"),
          bytes("FFE000104A46494600010100000100010000"),
          when($"layout" === 2,
            bytes("FFE1000E457869660000AABBCCDDEEFF"))
            .otherwise(lit(Array.empty[Byte])),
          when($"layout" >= 1, bytes("FFFE0009636F6D6D656E74"))
            .otherwise(lit(Array.empty[Byte])),
          expr("le_encode_u8(255)"), expr("le_encode_u8(sof)"),
          be16("8 + 3 * ncomp"),
          expr("le_encode_u8(prec)"), be16("hgt"), be16("w"),
          expr("le_encode_u8(ncomp)"),
          when($"ncomp" === 1, bytes("011100"))
            .otherwise(bytes("011100021101031101"))))
        .select($"doc_id".as("media_id"), $"layout",
          expr("jpeg_precision(blob)").as("precision"),
          expr("jpeg_height(blob)").as("height"),
          expr("jpeg_width(blob)").as("width"),
          expr("jpeg_components(blob)").as("components"))
    },

    Qry(
      "q190_gif_header", {
        def le16(x: String) =
          s"printf('%02x', ($x) % 256) || printf('%02x', ($x) // 256)"
        val magic = "substr(hx, 1, 8) = '47494638'" +
          " AND substr(hx, 9, 2) IN ('37', '39')" +
          " AND substr(hx, 11, 2) = '61'"
        def u16(pos: Int) = s"CAST(('0x' || substr(hx, ${pos + 2}, 2)" +
          s" || substr(hx, $pos, 2)) AS INTEGER)"
        def guard(v: String) = s"CASE WHEN $magic THEN $v ELSE NULL END"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    CASE h60 % 2 WHEN 0 THEN '37' ELSE '39' END AS ver,
           |    1 + (h60 // 2) % 65535 AS w,
           |    1 + (h60 // 131070) % 65535 AS hgt,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, unhex(
           |    (CASE WHEN corrupt THEN '48' ELSE '47' END) || '494638'
           |    || ver || '61' || ${le16("w")} || ${le16("hgt")}
           |    || '910000') AS blob
           |  FROM p),
           |x AS (SELECT doc_id, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id,
           |  ${guard(u16(13))} AS width,
           |  ${guard(u16(17))} AS height
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      def le16(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("w", expr("CAST(1 + (h60 DIV 2) % 65535 AS INT)"))
        .withColumn("hgt", expr("CAST(1 + (h60 DIV 131070) % 65535 AS INT)"))
        .withColumn("blob", concat(
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 72 ELSE 71 END)"),
          lit("IF8".getBytes("US-ASCII")),
          expr("le_encode_u8(CASE h60 % 2 WHEN 0 THEN 55 ELSE 57 END)"),
          lit("a".getBytes("US-ASCII")),
          le16("w"), le16("hgt"),
          lit(Array[Byte](0x91.toByte, 0, 0))))
        .select($"doc_id".as("media_id"),
          expr("gif_width(blob)").as("width"),
          expr("gif_height(blob)").as("height"))
    },

    // ---- MP4 / ISO-BMFF movie header — the VIDEO modality ---------------
    // Completes the media-header family across all four modalities:
    // image (BMP/PNG/JPEG/GIF), audio (WAV), video (MP4). Three layouts
    // exercise the top-level box walk (canonical ftyp+moov /
    // ftyp+free+moov / ftyp+free+skip+moov); duration_ms is derived
    // from the DECODED fields with BIGINT arithmetic on both engines,
    // so the hash also covers the downstream unit conversion a real
    // pipeline does with these two numbers.
    Qry(
      "q191_mp4_header", {
        val ftyp = "0000001866747970" + "69736F6D" + "00000200" +
          "69736F6D69736F32"
        val free = "00000010" + "66726565" + "6A6A6A6A6A6A6A6A"
        val skip = "0000000C" + "736B6970" + "6A6A6A6A"
        val moovMvhd = "00000024" + "6D6F6F76" + "0000001C" + "6D766864" +
          "00000000" + "00000000" + "00000000"
        // mvhd box start per layout: 24 + pre + 8
        val m = "24 + CASE layout WHEN 0 THEN 0 WHEN 1 THEN 16" +
          " ELSE 28 END + 8"
        val magic = "substr(hx, 9, 8) = '66747970'"
        def be32(o: String) =
          s"CAST(('0x' || substr(hx, 2*($o)+1, 8)) AS INTEGER)"
        def guard(v: String) = s"CASE WHEN $magic THEN $v ELSE NULL END"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    h60 % 3 AS layout,
           |    CASE (h60 // 3) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
           |      WHEN 2 THEN 44100 ELSE 90000 END AS ts,
           |    1 + (h60 // 12) % 100000000 AS dur,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, layout, unhex(
           |    '00000018' || (CASE WHEN corrupt THEN '67' ELSE '66' END)
           |    || '${ftyp.drop(10)}'
           |    || (CASE WHEN layout >= 1 THEN '$free' ELSE '' END)
           |    || (CASE WHEN layout = 2 THEN '$skip' ELSE '' END)
           |    || '$moovMvhd'
           |    || printf('%08x', ts) || printf('%08x', dur)) AS blob
           |  FROM p),
           |x AS (SELECT doc_id, layout, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id, CAST(layout AS INTEGER) AS layout,
           |  ${guard(be32(s"($m) + 20"))} AS timescale,
           |  ${guard(be32(s"($m) + 24"))} AS duration,
           |  ${guard(s"CAST(${be32(s"($m) + 24")} AS BIGINT) * 1000" +
                s" // ${be32(s"($m) + 20")}")} AS duration_ms
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      def bytes(hex: String) = lit(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      def be32(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) DIV 16777216 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("layout", expr("CAST(h60 % 3 AS INT)"))
        .withColumn("ts", element_at(
          array(Seq(600, 1000, 44100, 90000).map(lit): _*),
          expr("CAST((h60 DIV 3) % 4 AS INT)") + 1))
        .withColumn("dur", expr("CAST(1 + (h60 DIV 12) % 100000000 AS INT)"))
        .withColumn("blob", concat(
          bytes("00000018"),
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 103 ELSE 102 END)"),
          lit("typisom".getBytes("US-ASCII")),
          bytes("00000200"),
          lit("isomiso2".getBytes("US-ASCII")),
          when($"layout" >= 1, bytes("00000010" + "66726565" +
            "6A6A6A6A6A6A6A6A")).otherwise(lit(Array.empty[Byte])),
          when($"layout" === 2, bytes("0000000C" + "736B6970" + "6A6A6A6A"))
            .otherwise(lit(Array.empty[Byte])),
          bytes("000000246D6F6F760000001C6D766864" +
            "000000000000000000000000"),
          be32("ts"), be32("dur")))
        .select($"doc_id".as("media_id"), $"layout",
          expr("mp4_timescale(blob)").as("timescale"),
          expr("mp4_duration(blob)").as("duration"),
          expr("CAST(mp4_duration(blob) AS BIGINT) * 1000" +
            " DIV mp4_timescale(blob)").as("duration_ms"))
    }
  )
}
