package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft._
import graft.sources.Tables

/** Fifty-eighth coverage wave: transport capstone + data profiling.
  *
  *  - q210: the q205 manifest pattern applied to the TRANSPORT layer —
  *    a heterogeneous blob column mixing gzip members, zstd frames and
  *    TFRecord frames (~9% corrupt) classified purely by the decoders'
  *    never-throw NULL contract and rolled up per codec with declared
  *    payload-size sums. This is the first question a 100-TB ingest
  *    job asks of a bucket: what containers, how many bytes CLAIMED,
  *    before spending a single decompression cycle.
  *  - q211: one-pass table profiler over lineitem — per-column null
  *    counts, distinct estimates vs exact, and min/max — the
  *    engine-utility every warehouse ships (ANALYZE/profile). One scan,
  *    one aggregate row; the oracle states the same numbers exactly.
  */
object Extras58 {

  private def h60Of(spark: SparkSession, dir: String) =
    Tables(spark, dir).documents.select(col("doc_id"), col("text"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  private def u8(x: String) =
    expr(s"le_encode_u8(CAST(($x) % 256 AS INT))")

  val all: Seq[Qry] = Seq(

    // ---- transport-layer manifest ---------------------------------------
    Qry(
      "q210_transport_manifest",
      s"""WITH d AS (SELECT doc_id, strlen(text) AS nbytes,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id, nbytes,
         |    h60 % 3 AS pick,
         |    (h60 % 11 = 0) AS corrupt,
         |    (h60 // 4) % 4294967296 AS zsz
         |  FROM d),
         |r AS (SELECT doc_id,
         |    CASE WHEN corrupt THEN 'corrupt'
         |      ELSE CASE pick WHEN 0 THEN 'gzip' WHEN 1 THEN 'zstd'
         |        ELSE 'tfrecord' END END AS codec,
         |    CASE WHEN corrupt THEN NULL
         |      WHEN pick = 1 THEN zsz
         |      WHEN pick = 2 THEN nbytes END AS declared
         |  FROM p)
         |SELECT codec, COUNT(*) AS n,
         |  CAST(SUM(declared) AS BIGINT) AS sum_declared
         |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // gzip member (no FNAME — the manifest reads mtime/os only, and
      // the codec verdict is the magic); declared size: gzip does not
      // carry one in the header (NULL — ISIZE is a trailer field),
      // zstd declares it in the frame header (u32 form), tfrecord's
      // length field is CRC-gated
      val gz = concat(bytesLit("1F"),
        u8("CASE WHEN corrupt THEN 140 ELSE 139 END"),
        bytesLit("0800"), expr("le_encode_u32(CAST(h60 % 2147483648" +
          " AS INT))"), bytesLit("0003"))
      val zstd = concat(
        u8("CASE WHEN corrupt THEN 41 ELSE 40 END"),
        bytesLit("B52FFD"), bytesLit("A0"), // fcs=2 (u32), single
        concat(u8("zsz"), u8("zsz DIV 256"), u8("zsz DIV 65536"),
          u8("zsz DIV 16777216")))
      val tfr = when(col("corrupt"), concat(
        expr("substr(fr, 1, 8)"),
        expr("le_encode_u8(CAST((conv(hex(substr(fr, 9, 1)), 16, 10)" +
          " + 1) % 256 AS INT))"),
        expr("substr(fr, 10)")))
        .otherwise(col("fr"))
      h60Of(spark, dir)
        .withColumn("pick", expr("CAST(h60 % 3 AS INT)"))
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("zsz", expr("(h60 DIV 4) % 4294967296"))
        .withColumn("fr", expr("tfrecord_frame(CAST(text AS BINARY))"))
        .withColumn("b", when(col("pick") === 0, gz)
          .when(col("pick") === 1, zstd).otherwise(tfr))
        .codecSniffed("b")
        .groupBy(col("codec"))
        .agg(count(lit(1)).as("n"),
          sum(col("declared_size")).as("sum_declared"))
    },

    // ---- one-pass table profiler ----------------------------------------
    Qry(
      "q211_table_profile",
      s"""SELECT COUNT(*) AS n_rows,
         |  COUNT(DISTINCT l_orderkey) AS d_orderkey,
         |  COUNT(DISTINCT l_suppkey) AS d_suppkey,
         |  COUNT(DISTINCT l_returnflag) AS d_returnflag,
         |  COUNT(*) - COUNT(l_tax) AS null_tax,
         |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
         |  CAST(TRUE AS BOOLEAN) AS approx_ok
         |FROM lineitem""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // the scale path is the APPROX profile (HLL sketches, one pass,
      // mergeable); the exact distincts are the fixture-scale truth the
      // sketch is asserted against (within 10%), the q86 pattern — only
      // exact values are emitted, the bound rides as a constant the
      // gate would catch drifting
      Tables(spark, dir).lineitem
        .agg(count(lit(1)).as("n_rows"),
          countDistinct($"l_orderkey").as("d_orderkey"),
          countDistinct($"l_suppkey").as("d_suppkey"),
          countDistinct($"l_returnflag").as("d_returnflag"),
          (count(lit(1)) - count($"l_tax")).as("null_tax"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          min($"l_shipdate").as("min_ship"),
          max($"l_shipdate").as("max_ship"),
          approx_count_distinct($"l_orderkey").as("approx"))
        .select($"n_rows", $"d_orderkey", $"d_suppkey", $"d_returnflag",
          $"null_tax", $"min_qty", $"max_qty", $"min_ship",
          $"max_ship",
          (abs($"approx" - $"d_orderkey") <=
            lit(0.1) * $"d_orderkey").as("approx_ok"))
    }
  )
}
