package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft._
import graft.sources.Tables

/** Fifty-sixth coverage wave: table-service mechanics + the widened
  * media capstone.
  *
  *  - q204: compaction PLANNING — the small-files problem is the
  *    canonical 100-TB operational issue, and the fix starts with a
  *    plan computed from file METADATA only (never the data): order
  *    files deterministically within each stratum, running-sum their
  *    sizes, and cut a new output group every `Target` bytes. One
  *    window pass per stratum, one rollup — the query a table service
  *    (OPTIMIZE / rewrite_data_files) runs to decide what to rewrite,
  *    here over the documents fixture with each document standing in
  *    for a data file of `n_chars` bytes.
  *  - q205: the q192 manifest capstone at TEN formats — every decoder
  *    family the engine now carries (bmp/png/gif/jpeg/webp/tiff/wav/
  *    mp3/flac/mp4, ~9% corrupt) sniffed by Graft.mediaSniffed and
  *    rolled up per format. Each format's corrupt form flips its lead
  *    byte to a value matching NO other format's magic, so the
  *    detection chain's order can never mask a misclassification.
  *  - q206: q205 under Structured Streaming, sharing the oracle
  *    VERBATIM — stream/batch equivalence inside the gate hash.
  */
object Extras56 {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** Target compacted-output size in stand-in bytes. */
  private val Target = 50000L

  val all: Seq[Qry] = Seq(

    Qry(
      "q204_compaction_plan",
      s"""WITH f AS (SELECT source, doc_id, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS csum
         |  FROM documents),
         |g AS (SELECT source, doc_id, n_chars,
         |    CAST((csum - n_chars) // $Target AS BIGINT) AS grp
         |  FROM f)
         |SELECT source, grp, COUNT(*) AS n_files,
         |  CAST(SUM(n_chars) AS BIGINT) AS grp_bytes,
         |  MIN(doc_id) AS first_file, MAX(doc_id) AS last_file
         |FROM g GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // group = where the file STARTS in the running layout: files are
      // never split, a group may overshoot Target by at most one file —
      // the same contract real rewrite planners use. The window is the
      // only shuffle (hash by source); the rollup reuses its
      // partitioning.
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir).documents
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("grp",
          ((sum($"n_chars").over(w) - $"n_chars") / Target)
            .cast("long"))
        .groupBy($"source", $"grp")
        .agg(count(lit(1)).as("n_files"),
          sum($"n_chars").as("grp_bytes"),
          min($"doc_id").as("first_file"),
          max($"doc_id").as("last_file"))
    },

    // ---- ten-format media manifest capstone -----------------------------
    Qry("q205_media_manifest10", Manifest10Oracle) { (spark, dir) =>
      withMediaBlob10(spark, Tables(spark, dir).documents)
        .mediaManifest("blob")
    },

    // ---- the same ten-format manifest under Structured Streaming --------
    // q193's stream/batch-equivalence pattern at the full decoder
    // matrix: documents arrive as a file stream, the synthesis + the
    // ten-decoder sniff run as a stateless projection per micro-batch,
    // and the manifest is a streaming aggregation in complete mode
    // sharing q205's oracle VERBATIM — the hash match IS the
    // equivalence proof.
    Qry("q206_stream_media10", Manifest10Oracle) { (spark, dir) =>
      import graft.streaming.Streams
      val agg = withMediaBlob10(spark,
          Streams.fileStream(spark, dir, "documents"))
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

  /** Parameter-level oracle shared verbatim by q205 (batch) and q206
    * (streaming) — identical expected manifests put stream/batch
    * equivalence inside the gate hash (the q192/q193 pattern). */
  // lazy: declared after `all`, which references it at object init
  private lazy val Manifest10Oracle: String =
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    h60 % 10 AS pick,
         |    (h60 % 11 = 0) AS corrupt,
         |    1 + (h60 // 10) % 4096 AS w,
         |    1 + (h60 // 40960) % 4096 AS hgt,
         |    CASE (h60 // 3) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
         |      WHEN 2 THEN 22050 WHEN 3 THEN 44100 WHEN 4 THEN 48000
         |      ELSE 96000 END AS arate,
         |    CASE (h60 // 7) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
         |      ELSE 32000 END AS mrate,
         |    CASE (h60 // 6) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
         |      WHEN 2 THEN 44100 ELSE 90000 END AS ts,
         |    1 + (h60 // 24) % 100000000 AS dur
         |  FROM d),
         |r AS (SELECT doc_id,
         |    CASE WHEN corrupt THEN 'corrupt'
         |      ELSE CASE pick WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
         |        WHEN 2 THEN 'gif' WHEN 3 THEN 'jpeg' WHEN 4 THEN 'webp'
         |        WHEN 5 THEN 'tiff' WHEN 6 THEN 'wav' WHEN 7 THEN 'mp3'
         |        WHEN 8 THEN 'flac' ELSE 'mp4' END END AS fmt,
         |    CASE WHEN NOT corrupt AND pick <= 5 THEN w END AS width,
         |    CASE WHEN NOT corrupt AND pick <= 5 THEN hgt END AS height,
         |    CASE WHEN NOT corrupt AND pick IN (6, 8) THEN arate
         |      WHEN NOT corrupt AND pick = 7 THEN mrate END AS rate,
         |    CASE WHEN NOT corrupt AND pick = 9
         |      THEN CAST(dur AS BIGINT) * 1000 // ts END AS dms
         |  FROM p)
         |SELECT fmt, COUNT(*) AS n,
         |  CAST(SUM(width) AS BIGINT) AS sum_w,
         |  CAST(SUM(height) AS BIGINT) AS sum_h,
         |  CAST(SUM(rate) AS BIGINT) AS sum_rate,
         |  CAST(SUM(dms) AS BIGINT) AS sum_dur_ms
         |FROM r GROUP BY 1""".stripMargin

  /** Hash-synthesized ten-format media payload per document (adds
    * `blob` + derivation columns). Every expression is stateless, so
    * batch and streaming frames share this single source. */
  private def withMediaBlob10(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      graft.functions.GraftFunctions.register(spark)
      def bytes(hex: String) = lit(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      def u8(x: String) =
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))")
      def le16(x: String) = concat(u8(x), u8(s"($x) DIV 256"))
      def le32(x: String) = concat(le16(x), le16(s"($x) DIV 65536"))
      def be16(x: String) = concat(u8(s"($x) DIV 256"), u8(x))
      def be32(x: String) = concat(be16(s"($x) DIV 65536"), be16(x))
      def ascii(s: String) = lit(s.getBytes("US-ASCII"))
      // each format's corrupt lead byte matches NO format's magic
      def lead(ok: Int, bad: Int) =
        expr(s"le_encode_u8(CASE WHEN corrupt THEN $bad ELSE $ok END)")
      val bmp = concat(lead(0x42, 0x43), ascii("M"),
        le32("54"), le32("0"), le32("54"), le32("40"),
        le32("w"), le32("hgt"), le32((1 + 24 * 65536).toString))
      val png = concat(lead(0x89, 0x88), bytes("504E470D0A1A0A"),
        bytes("0000000D"), ascii("IHDR"), be32("w"), be32("hgt"),
        bytes("0806000000"))
      val gif = concat(lead(0x47, 0x48), ascii("IF89a"),
        le16("w"), le16("hgt"), bytes("910000"))
      val jpeg = concat(lead(0xFF, 0xFE), bytes("D8"),
        bytes("FFE000104A46494600010100000100010000"),
        bytes("FFC00011"), bytes("08"), be16("hgt"), be16("w"),
        bytes("03011100021101031101"))
      // VP8L flavor: w,hgt <= 4096 fit the 14-bit packed fields
      val webp = concat(lead(0x52, 0x53), ascii("IFF"), le32("30"),
        ascii("WEBPVP8L"), le32("5"), bytes("2F"),
        u8("(w - 1) % 256"),
        u8("(w - 1) DIV 256 + ((hgt - 1) % 4) * 64"),
        u8("(hgt - 1) DIV 4 % 256"), u8("(hgt - 1) DIV 1024"))
      def tifEntry(tag: Int, v: String) = concat(le16(tag.toString),
        le16("3"), le32("1"), le16(v), bytes("0000"))
      val tiff = concat(lead(0x49, 0x4A), ascii("I"), le16("42"),
        le32("8"), le16("2"), tifEntry(256, "w"), tifEntry(257, "hgt"),
        le32("0"))
      val wav = concat(lead(0x52, 0x51), ascii("IFF"), le32("36"),
        ascii("WAVEfmt "), le32("16"), le16("1"), le16("2"),
        le32("arate"), le32("arate * 4"), le16("4"), le16("16"))
      val mp3 = concat(lead(0xFF, 0xFE), bytes("FB"),
        u8("(1 + (h60 DIV 5) % 14) * 16 + ((h60 DIV 7) % 3) * 4"),
        bytes("00"))
      val flacPacked = "arate * 17592186044416 + 1 * 2199023255552" +
        " + 15 * 68719476736 + (h60 DIV 13) % 68719476736"
      val flac = concat(lead(0x66, 0x67), ascii("LaC"), bytes("00"),
        bytes("000022"), be16("4608"), be16("4608"),
        bytes("000000000000"),
        be32(s"($flacPacked) DIV 4294967296"),
        be32(s"($flacPacked) % 4294967296"),
        bytes("00" * 16))
      val mp4 = concat(bytes("00000018"), lead(0x66, 0x67),
        ascii("typisom"), bytes("00000200"), ascii("isomiso2"),
        bytes("000000246D6F6F760000001C6D766864000000000000000000000000"),
        be32("ts"), be32("dur"))
      docs
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("pick", expr("CAST(h60 % 10 AS INT)"))
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("w", expr("1 + (h60 DIV 10) % 4096"))
        .withColumn("hgt", expr("1 + (h60 DIV 40960) % 4096"))
        .withColumn("arate", element_at(
          array(Seq(8000, 16000, 22050, 44100, 48000, 96000).map(lit): _*),
          expr("CAST((h60 DIV 3) % 6 AS INT)") + 1))
        .withColumn("ts", element_at(
          array(Seq(600, 1000, 44100, 90000).map(lit): _*),
          expr("CAST((h60 DIV 6) % 4 AS INT)") + 1))
        .withColumn("dur", expr("CAST(1 + (h60 DIV 24) % 100000000 AS INT)"))
        .withColumn("blob",
          when(col("pick") === 0, bmp).when(col("pick") === 1, png)
            .when(col("pick") === 2, gif).when(col("pick") === 3, jpeg)
            .when(col("pick") === 4, webp).when(col("pick") === 5, tiff)
            .when(col("pick") === 6, wav).when(col("pick") === 7, mp3)
            .when(col("pick") === 8, flac).otherwise(mp4))
  }
}
