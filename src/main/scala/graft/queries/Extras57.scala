package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Fifty-seventh coverage wave: the ML-data transport layer.
  *
  *  - q207: Ogg-encapsulated Opus identification header (RFCs 3533 +
  *    7845) — the speech-dataset codec. The synthesized pages vary
  *    the SEGMENT COUNT, so the lacing-table offset arithmetic (the
  *    Ogg-specific part) is inside the oracle hash; a non-BOS page or
  *    a non-Opus first packet is NULL by contract.
  *  - q208: TFRecord framing with REAL CRC32C — the TensorFlow
  *    training-data container. The in-engine writer
  *    (`tfrecord_frame`) wraps each document's bytes; three corrupt
  *    modes (clean / length-CRC flipped / payload-CRC flipped) pin
  *    the reader's gating: a corrupt length CRC NULLs the length
  *    (never mis-slices a file), a corrupt payload CRC reads 0 from
  *    `tfrecord_payload_ok`. CRC32C is the JDK's hardware
  *    implementation; the mask constant is independently pinned
  *    against the published check vector in MediaHeaderSpec.
  *  - q209: WARC record headers — the crawl archive format. Headers
  *    are synthesized as text and parsed back with regexp_extract
  *    (no new expression needed: the format IS text); the oracle is
  *    parameter-level, so the extraction regexes are verified against
  *    ground truth rather than against themselves. A missing
  *    Content-Length (spec-legal for some record types) reads NULL.
  */
object Extras57 {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private def h60Of(spark: SparkSession, dir: String) =
    t(spark, dir).documents.select(col("doc_id"), col("text"),
      col("n_chars"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  private def u8(x: String) =
    expr(s"le_encode_u8(CAST(($x) % 256 AS INT))")
  private def u16le(x: String) = concat(u8(x), u8(s"($x) DIV 256"))

  val all: Seq[Qry] = Seq(

    // ---- Ogg/Opus identification header ---------------------------------
    Qry(
      "q207_opus_head",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 11 = 0) AS corrupt,
         |    1 + (h60 // 4) % 8 AS ch,
         |    (h60 // 32) % 65536 AS preskip,
         |    CASE (h60 // 2) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 12000
         |      WHEN 2 THEN 16000 WHEN 3 THEN 24000 ELSE 48000 END AS rate
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE ch END AS channels,
         |  CASE WHEN corrupt THEN NULL ELSE preskip END AS pre_skip,
         |  CASE WHEN corrupt THEN NULL ELSE rate END AS input_rate
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // BOS page: "OggS" v0 type=0x02, granule/serial/seq/crc, then a
      // hash-sized lacing table (first lacing = the 19-byte OpusHead;
      // extra segments describe trailing packets we never emit — the
      // parser must still find the packet past the variable table)
      val lacing = when(col("nsegs") === 1, bytesLit("13"))
        .when(col("nsegs") === 2, bytesLit("130A"))
        .otherwise(bytesLit("130A05"))
      val page = concat(
        u8("CASE WHEN corrupt THEN 80 ELSE 79 END"), // 'O' -> 'P'
        lit("ggS".getBytes("US-ASCII")), bytesLit("0002"),
        bytesLit("00" * 8), // granule
        expr("le_encode_u32(CAST(h60 % 2147483648 AS INT))"), // serial
        bytesLit("00" * 8), // sequence + crc (not validated)
        u8("nsegs"), lacing)
      val opusHead = concat(lit("OpusHead".getBytes("US-ASCII")),
        bytesLit("01"), u8("ch"), u16le("preskip"),
        expr("le_encode_u32(CAST(rate AS INT))"), bytesLit("000000"))
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("nsegs", expr("CAST(1 + (h60 DIV 7) % 3 AS INT)"))
        .withColumn("ch", expr("1 + (h60 DIV 4) % 8"))
        .withColumn("preskip", expr("(h60 DIV 32) % 65536"))
        .withColumn("rate", element_at(
          array(Seq(8000, 12000, 16000, 24000, 48000)
            .map(v => lit(v.toLong)): _*),
          expr("CAST((h60 DIV 2) % 5 AS INT)") + 1))
        .withColumn("b", concat(page, opusHead))
        .select(col("doc_id"),
          expr("opus_channels(b)").as("channels"),
          expr("opus_pre_skip(b)").as("pre_skip"),
          expr("opus_input_sample_rate(b)").as("input_rate"))
    },

    // ---- TFRecord frame roundtrip with CRC32C gating --------------------
    Qry(
      "q208_tfrecord_frame",
      s"""WITH d AS (SELECT doc_id, strlen(text) AS nbytes,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id, nbytes, h60 % 5 AS mode FROM d)
         |SELECT doc_id,
         |  CASE WHEN mode = 1 THEN NULL ELSE nbytes END AS rec_len,
         |  CASE WHEN mode = 1 THEN NULL
         |    WHEN mode = 2 THEN 0 ELSE 1 END AS payload_ok
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // mode 0/3/4 = clean; 1 = length-CRC byte flipped (frame must
      // NULL, never mis-slice); 2 = payload-CRC byte flipped (length
      // reads, payload verdict 0). Byte surgery via binary substr +
      // a XOR-flipped single byte.
      val clean = expr("tfrecord_frame(CAST(text AS BINARY))")
      val frame =
        when(col("mode") === 1, concat(
          expr("substr(fr, 1, 8)"),
          expr("le_encode_u8(CAST((conv(hex(substr(fr, 9, 1)), 16, 10)" +
            " + 1) % 256 AS INT))"),
          expr("substr(fr, 10)")))
        .when(col("mode") === 2, concat(
          expr("substr(fr, 1, octet_length(fr) - 1)"),
          expr("le_encode_u8(CAST((conv(hex(substr(fr, " +
            "octet_length(fr), 1)), 16, 10) + 1) % 256 AS INT))")))
        .otherwise(col("fr"))
      h60Of(spark, dir)
        .withColumn("mode", expr("CAST(h60 % 5 AS INT)"))
        .withColumn("fr", clean)
        .withColumn("b", frame)
        .select(col("doc_id"),
          expr("tfrecord_length(b)").as("rec_len"),
          expr("tfrecord_payload_ok(b)").as("payload_ok"))
    },

    // ---- WARC record headers --------------------------------------------
    Qry(
      "q209_warc_header",
      s"""WITH d AS (SELECT doc_id, n_chars,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents)
         |SELECT doc_id,
         |  CASE h60 % 4 WHEN 0 THEN 'response' WHEN 1 THEN 'request'
         |    WHEN 2 THEN 'metadata' ELSE 'warcinfo' END AS warc_type,
         |  'https://ex.org/' || doc_id AS target_uri,
         |  CASE WHEN h60 % 7 <> 0 THEN n_chars END AS content_length
         |FROM d""".stripMargin) { (spark, dir) =>
      val crlf = lit("\r\n")
      val wtype = expr("CASE h60 % 4 WHEN 0 THEN 'response' " +
        "WHEN 1 THEN 'request' WHEN 2 THEN 'metadata' " +
        "ELSE 'warcinfo' END")
      val raw = concat(lit("WARC/1.0"), crlf,
        lit("WARC-Type: "), wtype, crlf,
        lit("WARC-Target-URI: https://ex.org/"),
        col("doc_id").cast("string"), crlf,
        when(expr("h60 % 7 <> 0"),
          concat(lit("Content-Length: "),
            col("n_chars").cast("string"), crlf))
          .otherwise(lit("")),
        crlf)
      h60Of(spark, dir)
        .withColumn("raw", raw)
        .select(col("doc_id"),
          regexp_extract(col("raw"), "WARC-Type: ([a-z]+)", 1)
            .as("warc_type"),
          regexp_extract(col("raw"), "WARC-Target-URI: (\\S+)", 1)
            .as("target_uri"),
          nullif(regexp_extract(col("raw"), "Content-Length: ([0-9]+)", 1),
            lit("")).cast("long").as("content_length"))
    }
  )
}
