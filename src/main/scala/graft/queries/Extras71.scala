package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft._
import graft.sources.Tables
import graft.streaming.Streams

/** Seventy-first coverage wave: the six-codec transport capstone,
  * batch + streaming.
  *
  *  - q235/q236: q210's transport manifest widened to the FULL
  *    `codecSniffed` matrix — gzip, zstd, TFRecord, Ogg/Opus, tar,
  *    zip, plus a junk class matching NO magic — classified purely by
  *    the decoders' never-throw NULL contract and rolled up per codec
  *    with declared-size sums. q236 runs the SAME synthesis and
  *    rollup under Structured Streaming against the SAME oracle text
  *    verbatim (the q192/q193 / q205/q206 equivalence pattern), so
  *    batch/stream divergence in any of the six walks is itself
  *    gate-checked. Per-codec declared semantics: gzip and Ogg NULL
  *    (gzip's ISIZE is a trailer field; an Ogg BOS page declares no
  *    payload size), zstd the u32 frame-content size, TFRecord the
  *    CRC-gated length, tar/zip the archive payload sums.
  */
object Extras71 {

  private val TarSize = 40L
  private val ZipSize = 56L

  private def h60Of(spark: SparkSession, dir: String) =
    Tables(spark, dir).documents.select(col("doc_id"), col("text"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  private def u8(x: String) =
    expr(s"le_encode_u8(CAST(($x) % 256 AS INT))")

  /** Shared oracle: parameter-level per-codec expectation. */
  private val OracleSql: String =
    s"""WITH d AS (SELECT doc_id, strlen(text) AS nbytes,
       |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
       |  FROM documents),
       |p AS (SELECT doc_id, nbytes, h60 % 7 AS pick,
       |    (h60 // 7) % 4294967296 AS zsz
       |  FROM d),
       |r AS (SELECT doc_id,
       |    CASE pick WHEN 0 THEN 'gzip' WHEN 1 THEN 'zstd'
       |      WHEN 2 THEN 'tfrecord' WHEN 3 THEN 'tar' WHEN 4 THEN 'zip'
       |      WHEN 5 THEN 'ogg'
       |      ELSE 'corrupt' END AS codec,
       |    CASE pick WHEN 1 THEN zsz WHEN 2 THEN nbytes
       |      WHEN 3 THEN $TarSize WHEN 4 THEN $ZipSize END AS declared
       |  FROM p)
       |SELECT codec, COUNT(*) AS n,
       |  CAST(SUM(declared) AS BIGINT) AS sum_declared
       |FROM r GROUP BY 1""".stripMargin

  /** The shared per-row synthesis + sniff + rollup over a documents
    * frame (batch or streaming — identical column pipeline). */
  private def manifestOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val gz = concat(bytesLit("1F8B0800"),
      expr("le_encode_u32(CAST(h60 % 2147483648 AS INT))"),
      bytesLit("0003"))
    val zstd = concat(bytesLit("28B52FFD"), bytesLit("A0"),
      concat(u8("zsz"), u8("zsz DIV 256"), u8("zsz DIV 65536"),
        u8("zsz DIV 16777216")))
    val tar = concat(
      lit(Extras66.hdrBytes("t.txt", TarSize)),
      expr(s"substring(CAST(rpad(text, 600, 'x') AS BINARY), 1, $TarSize)"),
      lit(new Array[Byte](Extras66.pad(TarSize))),
      lit(new Array[Byte](1024)))
    val zip = concat(
      lit(Extras66.lfhBytes("z.txt", ZipSize)),
      expr(s"substring(CAST(rpad(text, 600, 'x') AS BINARY), 1, $ZipSize)"),
      lit(Extras66.Eocd))
    // minimal Ogg BOS page carrying an OpusHead first packet (q207's
    // clean one-segment layout): constant except the u32 LE serial
    val ogg = concat(
      bytesLit("4F676753" + "0002" + "00" * 8),           // OggS v0 BOS + granule
      expr("le_encode_u32(CAST(h60 % 2147483648 AS INT))"), // serial
      bytesLit("00" * 8 + "01" + "13"),                   // seq+crc, 1 lacing of 19
      lit("OpusHead".getBytes("US-ASCII")),
      bytesLit("0102" + "0000" + "80BB0000" + "000000"))  // v1 ch=2 48kHz
    docs
      .withColumn("pick", expr("CAST(h60 % 7 AS INT)"))
      .withColumn("zsz", expr("(h60 DIV 7) % 4294967296"))
      .withColumn("fr", expr("tfrecord_frame(CAST(text AS BINARY))"))
      .withColumn("b", when(col("pick") === 0, gz)
        .when(col("pick") === 1, zstd)
        .when(col("pick") === 2, col("fr"))
        .when(col("pick") === 3, tar)
        .when(col("pick") === 4, zip)
        .when(col("pick") === 5, ogg)
        .otherwise(bytesLit("00DECAFBAD")))
      .codecSniffed("b")
      .groupBy(col("codec"))
      .agg(count(lit(1)).as("n"),
        sum(col("declared_size")).as("sum_declared"))
  }

  val all: Seq[Qry] = Seq(

    Qry("q235_transport_manifest5", OracleSql) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      manifestOf(h60Of(spark, dir))
    },

    Qry("q236_stream_transport5", OracleSql) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      val stream = Streams.fileStream(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
      Streams.runToMemory(manifestOf(stream), "complete")
    }
  )
}
