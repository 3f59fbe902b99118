package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft._
import graft.functions.GraftFunctions
import graft.sources.Tables
import graft.streaming.Streams

/** Fifty-second coverage wave: the media-family CAPSTONE — a
  * heterogeneous media corpus (each document carries ONE payload in a
  * hash-chosen container: BMP / PNG / GIF / JPEG / WAV / MP4, ~10%
  * corrupt) rolled up to a per-format manifest, in BATCH (q192) and
  * under STRUCTURED STREAMING (q193, the media-ingest-monitoring
  * shape — both produce the identical manifest, so stream/batch
  * equivalence is itself inside the oracle hash). This is the q143
  * shape applied to the multimodal family: the individual decoders
  * (q177/q181/q185-q186/q189-q191) prove byte-level inversion; the
  * capstone proves the COMPOSITION a real curation pipeline runs —
  * type sniffing over opaque binary via the decoders' never-throw NULL
  * contract (a magic mismatch IS the detector; no separate sniffer
  * code to disagree with the parser), normalized dimension/rate/
  * duration extraction, and a per-format corpus rollup with corrupt
  * rows landing in their own bucket instead of failing the job.
  *
  * The ORACLE works at PARAMETER level: it re-derives each document's
  * intended format and field values from the same hash and aggregates
  * those directly — Spark must decode its synthesized bytes back to
  * exactly those parameters for the hash to match (byte-level offset
  * fidelity is already pinned per-format by the individual queries).
  *
  * Scale shape: one pure per-row map (six bounded parses over one
  * binary column — all codegen'd, no UDF) into a 7-group aggregate;
  * the only shuffle is the final tiny rollup. The streaming variant is
  * the same stateless projection feeding a streaming aggregation.
  */
object Extras52 {

  /** Synthesize the hash-chosen media payload per document: adds
    * `blob` (plus the derivation columns) to a frame with doc_id+text.
    * Works identically on batch and streaming frames — every
    * expression is stateless. Single source for q192 and q193. */
  private def withMediaBlob(spark: SparkSession, docs: DataFrame)
      : DataFrame = {
    GraftFunctions.register(spark)
    def bytes(hex: String) = lit(
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    def le16(x: String) = concat(
      expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
      expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"))
    def be16(x: String) = concat(
      expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"),
      expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
    def be32(x: String) = concat(
      expr(s"le_encode_u8(CAST(($x) DIV 16777216 % 256 AS INT))"),
      expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"),
      expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
      expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
    // first magic byte, flipped on the corrupt slice (each format's
    // corrupt form matches NO other format's magic — disjoint set)
    def lead(ok: Int, bad: Int) =
      expr(s"le_encode_u8(CASE WHEN corrupt THEN $bad ELSE $ok END)")
    val bmp = concat(lead(0x42, 0x43), lit("M".getBytes("US-ASCII")),
      expr("le_encode_u32(54)"), expr("le_encode_u32(0)"),
      expr("le_encode_u32(54)"), expr("le_encode_u32(40)"),
      expr("le_encode_u32(w)"), expr("le_encode_u32(hgt)"),
      expr("le_encode_u32(1 + 24 * 65536)"))
    val png = concat(lead(0x89, 0x88), bytes("504E470D0A1A0A"),
      bytes("0000000D"), lit("IHDR".getBytes("US-ASCII")),
      be32("w"), be32("hgt"), bytes("0806000000"))
    val gif = concat(lead(0x47, 0x48), lit("IF89a".getBytes("US-ASCII")),
      le16("w % 65536"), le16("hgt % 65536"), bytes("910000"))
    val jpeg = concat(lead(0xFF, 0xFE), bytes("D8"),
      bytes("FFE000104A46494600010100000100010000"),
      bytes("FFC00011"), bytes("08"), be16("hgt"), be16("w"),
      bytes("03011100021101031101"))
    val wav = concat(lead(0x52, 0x51), lit("IFF".getBytes("US-ASCII")),
      expr("le_encode_u32(36)"), lit("WAVEfmt ".getBytes("US-ASCII")),
      expr("le_encode_u32(16)"), le16("1"), le16("2"),
      expr("le_encode_u32(rate)"), expr("le_encode_u32(rate * 4)"),
      le16("4"), le16("16"))
    val mp4 = concat(bytes("00000018"), lead(0x66, 0x67),
      lit("typisom".getBytes("US-ASCII")), bytes("00000200"),
      lit("isomiso2".getBytes("US-ASCII")),
      bytes("000000246D6F6F760000001C6D766864" +
        "000000000000000000000000"),
      be32("ts"), be32("dur"))
    docs
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
          .as("h60"))
      .withColumn("pick", expr("CAST(h60 % 6 AS INT)"))
      .withColumn("corrupt", expr("h60 % 10 = 0"))
      .withColumn("w", expr("CAST(1 + (h60 DIV 6) % 4096 AS INT)"))
      .withColumn("hgt", expr("CAST(1 + (h60 DIV 24576) % 4096 AS INT)"))
      .withColumn("rate", element_at(
        array(Seq(8000, 16000, 22050, 44100, 48000, 96000).map(lit): _*),
        expr("CAST((h60 DIV 6) % 6 AS INT)") + 1))
      .withColumn("ts", element_at(
        array(Seq(600, 1000, 44100, 90000).map(lit): _*),
        expr("CAST((h60 DIV 6) % 4 AS INT)") + 1))
      .withColumn("dur", expr("CAST(1 + (h60 DIV 24) % 100000000 AS INT)"))
      .withColumn("blob",
        when(col("pick") === 0, bmp).when(col("pick") === 1, png)
          .when(col("pick") === 2, gif).when(col("pick") === 3, jpeg)
          .when(col("pick") === 4, wav).otherwise(mp4))
  }

  /** Parameter-level oracle, shared verbatim by q192 (batch) and q193
    * (streaming) — identical expected manifests make stream/batch
    * equivalence part of the gate. */
  private val ManifestOracle: String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
       |  FROM documents),
       |p AS (SELECT doc_id,
       |    h60 % 6 AS pick,
       |    (h60 % 10 = 0) AS corrupt,
       |    1 + (h60 // 6) % 4096 AS w,
       |    1 + (h60 // 24576) % 4096 AS hgt,
       |    CASE (h60 // 6) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |      WHEN 2 THEN 22050 WHEN 3 THEN 44100
       |      WHEN 4 THEN 48000 ELSE 96000 END AS rate,
       |    CASE (h60 // 6) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
       |      WHEN 2 THEN 44100 ELSE 90000 END AS ts,
       |    1 + (h60 // 24) % 100000000 AS dur
       |  FROM d),
       |r AS (SELECT doc_id,
       |    CASE WHEN corrupt THEN 'corrupt'
       |      ELSE CASE pick WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
       |        WHEN 2 THEN 'gif' WHEN 3 THEN 'jpeg'
       |        WHEN 4 THEN 'wav' ELSE 'mp4' END END AS fmt,
       |    CASE WHEN NOT corrupt AND pick <= 3 THEN w END AS width,
       |    CASE WHEN NOT corrupt AND pick <= 3 THEN hgt END AS height,
       |    CASE WHEN NOT corrupt AND pick = 4 THEN rate END AS rate,
       |    CASE WHEN NOT corrupt AND pick = 5
       |      THEN CAST(dur AS BIGINT) * 1000 // ts END AS dms
       |  FROM p)
       |SELECT fmt, COUNT(*) AS n,
       |  CAST(SUM(width) AS BIGINT) AS sum_w,
       |  CAST(SUM(height) AS BIGINT) AS sum_h,
       |  CAST(SUM(rate) AS BIGINT) AS sum_rate,
       |  CAST(SUM(dms) AS BIGINT) AS sum_dur_ms
       |FROM r GROUP BY 1""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry("q192_media_manifest", ManifestOracle) { (spark, dir) =>
      // sniff + rollup: Graft.mediaManifest (single source with the
      // facade — type detection is the decoders' NULL contract)
      withMediaBlob(spark, Tables(spark, dir).documents)
        .mediaManifest("blob")
    },

    // ---- the same manifest under Structured Streaming -------------------
    // Media-ingest monitoring: documents arrive as a file stream, the
    // synthesis + six-decoder sniff run as a stateless projection on
    // each micro-batch, and the per-format manifest is a streaming
    // aggregation in complete mode. The oracle is IDENTICAL to q192's,
    // so the hash match proves the streaming pipeline converges to the
    // batch manifest — corrupt payloads are counted, never fail the
    // stream.
    Qry("q193_stream_media", ManifestOracle) { (spark, dir) =>
      val src = Streams.fileStream(spark, dir, "documents")
      val agg = withMediaBlob(spark, src)
        .mediaSniffed("blob")
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          sum(col("width")).as("sum_w"),
          sum(col("height")).as("sum_h"),
          sum(col("rate")).as("sum_rate"),
          sum(col("duration_ms")).as("sum_dur_ms"))
      Streams.runToMemory(agg, "complete")
    }
  )
}
