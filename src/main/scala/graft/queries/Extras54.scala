package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Fifty-fourth coverage wave: the two mainstream COMPRESSED-audio
  * containers still missing from the media family, plus the
  * intra-document repetition signals a Gopher/MassiveText-style quality
  * filter runs:
  *
  *  - q197: MP3 / MPEG-1 Layer III frame-header decode behind an
  *    optional ID3v2 tag — the tag's 28-bit SYNCSAFE size (7 bits per
  *    byte) is the format's one genuinely tricky offset computation,
  *    and the synthesized sizes straddle the 7-bit byte boundary so
  *    the oracle catches an 8-bit misread. Bitrate/sample-rate come
  *    from the public MPEG-1 index tables.
  *  - q198: FLAC STREAMINFO bit-packed decode — sample rate (20 bits),
  *    channels (3), bits-per-sample (5) and total samples (36) share
  *    one big-endian u64; the oracle re-derives all four from the
  *    synthesis parameters, so a single shifted bit fails the hash.
  *  - q200: WebP canvas decode across all three container flavors
  *    (VP8X extended, VP8L lossless with its 14-bit LSB-first
  *    bit-packing, lossy VP8 behind the keyframe start code).
  *  - q199: repetition signals per document — max single-token
  *    frequency and duplicate-3-gram fraction (ppm). Entirely
  *    ROW-LOCAL on the Spark side: the top-token count is an O(L)
  *    fold over the sorted token array (`aggregate` with a struct
  *    accumulator), never an explode+groupBy — at 100 TB this is a
  *    pure map stage with zero shuffle, while the oracle states the
  *    same numbers via the obvious unnest/GROUP BY.
  */
object Extras54 {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // shared big-endian byte writers over BIGINT-valued SQL expressions
  private def be16(x: String) = concat(
    expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
    expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
  private def be24(x: String) = concat(
    expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"),
    be16(x))
  private def be32(x: String) = concat(
    expr(s"le_encode_u8(CAST(($x) DIV 16777216 % 256 AS INT))"),
    be24(x))
  private def be64(x: String) =
    concat(be32(s"($x) DIV 4294967296"), be32(s"($x) % 4294967296"))
  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  private def h60Of(spark: SparkSession, dir: String) =
    t(spark, dir).documents.select(col("doc_id"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  val all: Seq[Qry] = Seq(

    // ---- MP3 frame header behind an ID3v2 tag ---------------------------
    Qry(
      "q197_mp3_header",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 13 = 0) AS corrupt,
         |    1 + (h60 // 4) % 14 AS bidx,
         |    (h60 // 64) % 3 AS sidx
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE
         |    CASE bidx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
         |      WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
         |      WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160
         |      WHEN 11 THEN 192 WHEN 12 THEN 224 WHEN 13 THEN 256
         |      ELSE 320 END END AS bitrate_kbps,
         |  CASE WHEN corrupt THEN NULL ELSE
         |    CASE sidx WHEN 0 THEN 44100 WHEN 1 THEN 48000
         |      ELSE 32000 END END AS sample_rate
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // ID3v2 tag on every third doc; payload sizes 100..399 straddle
      // the syncsafe 7-bit byte boundary (sizes > 127 need two bytes)
      val id3 = concat(lit("ID3".getBytes("US-ASCII")),
        bytesLit("040000"),
        expr("le_encode_u8(0)"), expr("le_encode_u8(0)"),
        expr("le_encode_u8(CAST(tagsz DIV 128 AS INT))"),
        expr("le_encode_u8(CAST(tagsz % 128 AS INT))"),
        expr("CAST(repeat('j', tagsz) AS BINARY)"))
      // frame header: FF FB|F9 (corrupt = reserved version bits),
      // byte 2 = bitrate index << 4 | sample-rate index << 2
      val frame = concat(
        expr("le_encode_u8(255)"),
        expr("le_encode_u8(CASE WHEN corrupt THEN 249 ELSE 251 END)"),
        expr("le_encode_u8(CAST(bidx * 16 + sidx * 4 AS INT))"),
        expr("le_encode_u8(0)"))
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 13 = 0"))
        .withColumn("bidx", expr("CAST(1 + (h60 DIV 4) % 14 AS INT)"))
        .withColumn("sidx", expr("CAST((h60 DIV 64) % 3 AS INT)"))
        .withColumn("tagsz", expr("100 + (h60 DIV 8) % 300"))
        .withColumn("b",
          when(expr("h60 % 3 = 0"), concat(id3, frame)).otherwise(frame))
        .select(col("doc_id"),
          expr("mp3_bitrate_kbps(b)").as("bitrate_kbps"),
          expr("mp3_sample_rate(b)").as("sample_rate"))
    },

    // ---- FLAC STREAMINFO bit-packed decode ------------------------------
    Qry(
      "q198_flac_streaminfo",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 13 = 0) AS corrupt,
         |    CASE (h60 // 2) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
         |      WHEN 2 THEN 22050 WHEN 3 THEN 44100 WHEN 4 THEN 48000
         |      ELSE 96000 END AS rate,
         |    1 + (h60 // 16) % 8 AS ch,
         |    CASE (h60 // 128) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
         |      ELSE 24 END AS bps,
         |    (h60 // 512) % 68719476736 AS tot
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE rate END AS sample_rate,
         |  CASE WHEN corrupt THEN NULL ELSE ch END AS channels,
         |  CASE WHEN corrupt THEN NULL ELSE bps END AS bps,
         |  CASE WHEN corrupt THEN NULL ELSE tot END AS total_samples,
         |  CASE WHEN corrupt THEN NULL
         |    ELSE tot * 1000 // rate END AS dur_ms
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // "fLaC" + block header (type 0 STREAMINFO, last-flag varies by
      // hash — both forms legal; corrupt = VORBIS_COMMENT type 4
      // first, which the spec forbids) + u24 length 34 + min/max
      // blocksize u16 + min/max framesize u24 + the packed u64 + the
      // 16-byte MD5 slot (zeros)
      val packed = "rate * 17592186044416 + (ch - 1) * 2199023255552" +
        " + (bps - 1) * 68719476736 + tot"
      val blob = concat(lit("fLaC".getBytes("US-ASCII")),
        expr("le_encode_u8(CASE WHEN corrupt THEN 4 " +
          "ELSE CAST((h60 DIV 4) % 2 AS INT) * 128 END)"),
        be24("34"),
        be16("4608"), be16("4608"), be24("0"), be24("0"),
        be64(packed),
        bytesLit("00" * 16))
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 13 = 0"))
        .withColumn("rate", element_at(
          array(Seq(8000, 16000, 22050, 44100, 48000, 96000)
            .map(v => lit(v.toLong)): _*),
          expr("CAST((h60 DIV 2) % 6 AS INT)") + 1))
        .withColumn("ch", expr("1 + (h60 DIV 16) % 8"))
        .withColumn("bps", element_at(
          array(Seq(8L, 16L, 24L).map(lit): _*),
          expr("CAST((h60 DIV 128) % 3 AS INT)") + 1))
        .withColumn("tot", expr("(h60 DIV 512) % 68719476736"))
        .withColumn("b", blob)
        .select(col("doc_id"),
          expr("flac_sample_rate(b)").as("sample_rate"),
          expr("flac_channels(b)").as("channels"),
          expr("flac_bits_per_sample(b)").as("bps"),
          expr("flac_total_samples(b)").as("total_samples"),
          expr("flac_total_samples(b) * 1000 " +
            "DIV nullif(flac_sample_rate(b), 0)").as("dur_ms"))
    },

    // ---- WebP canvas decode across all three container flavors ---------
    Qry(
      "q200_webp_header",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    h60 % 3 AS pick,
         |    (h60 % 9 = 0) AS corrupt,
         |    CASE WHEN h60 % 3 = 0 THEN 1 + (h60 // 16) % 16777216
         |      ELSE 1 + (h60 // 16) % 16383 END AS w,
         |    CASE WHEN h60 % 3 = 0 THEN 1 + (h60 // 1024) % 16777216
         |      ELSE 1 + (h60 // 1024) % 16383 END AS hh
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE w END AS width,
         |  CASE WHEN corrupt THEN NULL ELSE hh END AS height
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      def u24le(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"))
      def u16le(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"))
      // "WEBP" form tag, last byte flipped on the corrupt slice
      val riff = concat(lit("RIFF".getBytes("US-ASCII")),
        expr("le_encode_u32(30)"), lit("WEB".getBytes("US-ASCII")),
        expr("le_encode_u8(CASE WHEN corrupt THEN 81 ELSE 80 END)"))
      val vp8x = concat(lit("VP8X".getBytes("US-ASCII")),
        expr("le_encode_u32(10)"), bytesLit("00000000"),
        u24le("w - 1"), u24le("hh - 1"))
      // VP8L: 0x2F signature then width-1/height-1 as 14-bit fields
      // packed LSB-first — the byte straddling both fields (b2) is the
      // synthesis mirror of the decoder's bit split
      val vp8l = concat(lit("VP8L".getBytes("US-ASCII")),
        expr("le_encode_u32(5)"), bytesLit("2F"),
        expr("le_encode_u8(CAST((w - 1) % 256 AS INT))"),
        expr("le_encode_u8(CAST((w - 1) DIV 256 + ((hh - 1) % 4) * 64" +
          " AS INT))"),
        expr("le_encode_u8(CAST((hh - 1) DIV 4 % 256 AS INT))"),
        expr("le_encode_u8(CAST((hh - 1) DIV 1024 AS INT))"))
      val vp8 = concat(lit("VP8 ".getBytes("US-ASCII")),
        expr("le_encode_u32(10)"), bytesLit("000000"),
        bytesLit("9D012A"), u16le("w"), u16le("hh"))
      h60Of(spark, dir)
        .withColumn("pick", expr("CAST(h60 % 3 AS INT)"))
        .withColumn("corrupt", expr("h60 % 9 = 0"))
        .withColumn("w", expr("CASE WHEN pick = 0 " +
          "THEN 1 + (h60 DIV 16) % 16777216 " +
          "ELSE 1 + (h60 DIV 16) % 16383 END"))
        .withColumn("hh", expr("CASE WHEN pick = 0 " +
          "THEN 1 + (h60 DIV 1024) % 16777216 " +
          "ELSE 1 + (h60 DIV 1024) % 16383 END"))
        .withColumn("b", concat(riff,
          when(col("pick") === 0, vp8x)
            .when(col("pick") === 1, vp8l).otherwise(vp8)))
        .select(col("doc_id"),
          expr("CAST(webp_width(b) AS BIGINT)").as("width"),
          expr("CAST(webp_height(b) AS BIGINT)").as("height"))
    },

    // ---- per-document repetition signals (quality filtering) -----------
    Qry(
      "q199_repetition_signals",
      s"""WITH ${TextOps.oracleToksCte},
         |base AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM toks),
         |topt AS (SELECT doc_id, MAX(c) AS top_tok FROM (
         |    SELECT doc_id, COUNT(*) AS c
         |    FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
         |    GROUP BY doc_id, tok) GROUP BY doc_id),
         |sh AS (SELECT doc_id,
         |    len(g) AS n_sh, len(list_distinct(g)) AS n_d
         |  FROM (SELECT doc_id,
         |      list_transform(range(len(tk) - 2),
         |        i -> array_to_string(tk[i+1:i+3], ' ')) AS g
         |    FROM toks WHERE len(tk) >= 3))
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(t.top_tok AS BIGINT) AS top_tok,
         |  CAST(t.top_tok * 1000000 // b.n_tokens AS BIGINT)
         |    AS top_tok_ppm,
         |  CAST((s.n_sh - s.n_d) * 1000000 // s.n_sh AS BIGINT)
         |    AS dup3_ppm
         |FROM base b JOIN topt t ON b.doc_id = t.doc_id
         |LEFT JOIN sh s ON b.doc_id = s.doc_id
         |WHERE b.n_tokens > 0""".stripMargin) { (spark, dir) =>
      // top-token count WITHOUT an explode+groupBy: O(L) run-length
      // fold over the sorted token array. The struct accumulator
      // carries (prev, run, best); a repeated token extends the run,
      // anything else resets it. At 100 TB this keeps the quality
      // filter a pure map stage — the explode formulation shuffles one
      // row per TOKEN of the corpus.
      def topRun(tk: Column): Column = aggregate(
        array_sort(tk),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"),
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      val shAll = TextOps.shingles(col("__tk"), 3)
      t(spark, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .withColumn("n_tokens", size(col("__tk")).cast("long"))
        .filter(col("n_tokens") > 0)
        .withColumn("top_tok", topRun(col("__tk")))
        .withColumn("__nsh", size(shAll).cast("long"))
        .withColumn("__nd", size(array_distinct(shAll)).cast("long"))
        .select(col("doc_id"), col("n_tokens"), col("top_tok"),
          (col("top_tok") * 1000000L / col("n_tokens")).cast("long")
            .as("top_tok_ppm"),
          when(col("__nsh") > 0,
            ((col("__nsh") - col("__nd")) * 1000000L / col("__nsh"))
              .cast("long")).as("dup3_ppm"))
    }
  )
}
