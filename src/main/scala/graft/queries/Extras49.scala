package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Forty-ninth coverage wave: the AUDIO modality's header decode —
  * RIFF/WAVE fmt-chunk fields as native codegen'd expressions — so all
  * three media families (BMP q177, PNG q181, WAV here) parse structural
  * metadata at the same first-class standard.
  *
  * q185 synthesizes a canonical 36-byte WAV header (RIFF + "WAVE" +
  * leading "fmt " chunk, public layout) per document from its payload
  * hash and recovers audio-format / channels / sample-rate / byte-rate /
  * bits-per-sample with the `wav_*` Catalyst expressions
  * (functions/MediaHeader.scala) — little-endian fmt fields inside
  * whole-stage codegen, the RIFF twin of q181's network-order path.
  * The corrupt slice (~10% of rows: 'R' → 'Q' in the RIFF magic) must
  * decode to NULL on BOTH engines — the oracle states the magic check
  * declaratively, so the hash match covers the degradation contract.
  * byte_rate is written as the spec-consistent product
  * rate × channels × bits/8 and parsed back from its own @28 field, so
  * the result is internally consistency-checkable downstream.
  *
  * Reference tie-in: the reference moves raw little-endian field bytes
  * through its ring (/root/reference/src/main.rs:46-62); here the same
  * LE byte discipline parses a public audio container's metadata.
  */
object Extras49 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q185_wav_header", {
        // little-endian u16/u32 as hex — low byte first, per the RIFF spec
        def le16(x: String) =
          s"printf('%02x', ($x) % 256) || printf('%02x', ($x) // 256)"
        def le32(x: String) =
          s"printf('%02x', ($x) % 256) || printf('%02x', (($x) // 256) % 256)" +
            s" || printf('%02x', (($x) // 65536) % 256)" +
            s" || printf('%02x', (($x) // 16777216) % 256)"
        val magic = "substr(hx, 1, 8) = '52494646'" +
          " AND substr(hx, 17, 8) = '57415645'" +
          " AND substr(hx, 25, 8) = '666D7420'"
        def u16(pos: Int) = s"CAST(('0x' || substr(hx, ${pos + 2}, 2)" +
          s" || substr(hx, $pos, 2)) AS INTEGER)"
        def u32(pos: Int) = s"CAST(('0x' || substr(hx, ${pos + 6}, 2)" +
          s" || substr(hx, ${pos + 4}, 2) || substr(hx, ${pos + 2}, 2)" +
          s" || substr(hx, $pos, 2)) AS INTEGER)"
        def guard(v: String) = s"CASE WHEN $magic THEN $v ELSE NULL END"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    CASE h60 % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
           |      WHEN 2 THEN 6 ELSE 8 END AS nch,
           |    CASE (h60 // 4) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
           |      WHEN 2 THEN 22050 WHEN 3 THEN 44100
           |      WHEN 4 THEN 48000 ELSE 96000 END AS rate,
           |    CASE (h60 // 24) % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
           |      WHEN 2 THEN 24 ELSE 32 END AS bits,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, unhex(
           |    (CASE WHEN corrupt THEN '51' ELSE '52' END) || '494646'
           |    || ${le32("36")} || '57415645' || '666d7420'
           |    || ${le32("16")} || ${le16("1")} || ${le16("nch")}
           |    || ${le32("rate")} || ${le32("rate * nch * (bits // 8)")}
           |    || ${le16("nch * (bits // 8)")} || ${le16("bits")}) AS blob
           |  FROM p),
           |x AS (SELECT doc_id, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id,
           |  ${guard(u16(41))} AS audio_fmt,
           |  ${guard(u16(45))} AS channels,
           |  ${guard(u32(49))} AS sample_rate,
           |  ${guard(u32(57))} AS byte_rate,
           |  ${guard(u16(69))} AS bits
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      // little-endian u16 as two u8 bytes (values here never exceed 16 bits)
      def le16(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("nch", element_at(
          array(Seq(1, 2, 6, 8).map(lit): _*),
          expr("CAST(h60 % 4 AS INT)") + 1))
        .withColumn("rate", element_at(
          array(Seq(8000, 16000, 22050, 44100, 48000, 96000).map(lit): _*),
          // integer DIV, never `/`: h60 is a 60-bit value and a double
          // quotient drops low bits beyond the 53-bit mantissa
          expr("CAST((h60 DIV 4) % 6 AS INT)") + 1))
        .withColumn("bits", element_at(
          array(Seq(8, 16, 24, 32).map(lit): _*),
          expr("CAST((h60 DIV 24) % 4 AS INT)") + 1))
        .withColumn("blob", concat(
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 81 ELSE 82 END)"),
          lit("IFF".getBytes("US-ASCII")),
          expr("le_encode_u32(36)"),
          lit("WAVEfmt ".getBytes("US-ASCII")),
          expr("le_encode_u32(16)"),
          le16("1"), le16("nch"),
          expr("le_encode_u32(rate)"),
          expr("le_encode_u32(rate * nch * (bits DIV 8))"),
          le16("nch * (bits DIV 8)"), le16("bits")))
        .select($"doc_id".as("media_id"),
          expr("wav_audio_format(blob)").as("audio_fmt"),
          expr("wav_channels(blob)").as("channels"),
          expr("wav_sample_rate(blob)").as("sample_rate"),
          expr("wav_byte_rate(blob)").as("byte_rate"),
          expr("wav_bits_per_sample(blob)").as("bits"))
    }
  )
}
