package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Fifty-ninth coverage wave: structured-record framing + URL curation.
  *
  *  - q212: protobuf WIRE-FORMAT scan — the encoding under
  *    tf.Example/TFRecord pipelines. The synthesized messages vary the
  *    FIELD ORDER (the spec allows any; a reader that assumes sorted
  *    tags misreads real data) and the varint WIDTH (values straddle
  *    the 1/2/3-byte boundaries), with a truncated-varint corrupt
  *    slice; pb_varint_field/pb_len_field answer "ids and payload
  *    sizes" without materializing a single decoded message.
  *  - q213: URL curation stats — the domain-level rollup every crawl
  *    pipeline runs (per-TLD volume + distinct registrable domains)
  *    using Spark's parse_url for host extraction; the oracle is
  *    parameter-level, so the extraction is verified against the
  *    synthesis ground truth.
  */
object Extras59 {

  private def h60Of(spark: SparkSession, dir: String) =
    Tables(spark, dir).documents.select(col("doc_id"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
        .as("h60"))

  /** Varint bytes of a non-negative SQL expression < 2^35 (1-5 bytes,
    * LSB-first, continuation bit). Five bytes, not four: the stress
    * replicas offset doc_id by 1e9 per copy, and a synthesizer capped
    * at 2^28 emitted a garbage final byte there — caught by the 10x
    * gate exactly as designed. */
  private def varint(x: String): org.apache.spark.sql.Column = {
    def u8(e: String) = expr(s"le_encode_u8(CAST(($e) AS INT))")
    when(expr(s"($x) < 128"), u8(s"$x"))
      .when(expr(s"($x) < 16384"),
        concat(u8(s"($x) % 128 + 128"), u8(s"($x) DIV 128")))
      .when(expr(s"($x) < 2097152"),
        concat(u8(s"($x) % 128 + 128"), u8(s"($x) DIV 128 % 128 + 128"),
          u8(s"($x) DIV 16384")))
      .when(expr(s"($x) < 268435456"),
        concat(u8(s"($x) % 128 + 128"),
          u8(s"($x) DIV 128 % 128 + 128"),
          u8(s"($x) DIV 16384 % 128 + 128"), u8(s"($x) DIV 2097152")))
      .otherwise(concat(u8(s"($x) % 128 + 128"),
        u8(s"($x) DIV 128 % 128 + 128"),
        u8(s"($x) DIV 16384 % 128 + 128"),
        u8(s"($x) DIV 2097152 % 128 + 128"),
        u8(s"($x) DIV 268435456")))
  }

  val all: Seq[Qry] = Seq(

    // ---- protobuf wire-format scan --------------------------------------
    Qry(
      "q212_protobuf_scan",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    (h60 % 13 = 0) AS corrupt,
         |    (h60 // 2) % 40 AS plen,
         |    (h60 // 128) % 250000 AS quality
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt THEN NULL ELSE doc_id END AS pb_id,
         |  CASE WHEN corrupt THEN NULL ELSE plen END AS payload_len,
         |  CASE WHEN corrupt THEN NULL ELSE quality END AS quality
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // field 1: varint doc_id (tag 0x08); field 2: length-delimited
      // payload (tag 0x12); field 3: varint quality (tag 0x18).
      // quality spans 1-3 varint bytes, doc_id 1-3 at the stress
      // tiers. Field order flips by hash; the corrupt slice ends in a
      // truncated varint (a lone continuation byte).
      val f1 = concat(varint("8"), varint("doc_id"))
      val f2 = concat(varint("18"), varint("plen"),
        expr("CAST(repeat('x', CAST(plen AS INT)) AS BINARY)"))
      val f3 = concat(varint("24"), varint("quality"))
      val msg = when(expr("h60 % 2 = 0"), concat(f1, f2, f3))
        .otherwise(concat(f3, f1, f2))
      h60Of(spark, dir)
        .withColumn("corrupt", expr("h60 % 13 = 0"))
        .withColumn("plen", expr("(h60 DIV 2) % 40"))
        .withColumn("quality", expr("(h60 DIV 128) % 250000"))
        .withColumn("b", when(col("corrupt"),
          concat(varint("8"), expr("le_encode_u8(129)"))).otherwise(msg))
        .select(col("doc_id"),
          expr("pb_varint_field(b, 1)").as("pb_id"),
          expr("pb_len_field(b, 2)").as("payload_len"),
          expr("pb_varint_field(b, 3)").as("quality"))
    },

    // ---- URL curation stats ---------------------------------------------
    Qry(
      "q213_url_stats",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    CASE (h60 // 2) % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
         |      WHEN 2 THEN 'net' WHEN 3 THEN 'io' ELSE 'dev' END AS tld,
         |    'site' || ((h60 // 16) % 50) AS domain
         |  FROM d)
         |SELECT tld, COUNT(*) AS n_urls,
         |  COUNT(DISTINCT domain) AS n_domains
         |FROM p GROUP BY 1""".stripMargin) { (spark, dir) =>
      // parse_url is codegen'd built-in string work — the host never
      // round-trips through a UDF; registrable domain = host minus the
      // subdomain label (the fixture synthesizes one label each)
      h60Of(spark, dir)
        .withColumn("tld", element_at(
          array(Seq("com", "org", "net", "io", "dev").map(lit): _*),
          expr("CAST((h60 DIV 2) % 5 AS INT)") + 1))
        .withColumn("domain",
          concat(lit("site"), expr("CAST((h60 DIV 16) % 50 AS STRING)")))
        .withColumn("url", concat(lit("https://www."), col("domain"),
          lit("."), col("tld"), lit("/p/"),
          col("doc_id").cast("string"), lit("?ref=crawl")))
        .withColumn("host", expr("parse_url(url, 'HOST')"))
        .withColumn("reg_domain",
          expr("substring_index(host, '.', -2)"))
        .groupBy(expr("substring_index(host, '.', -1)").as("tld"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(expr("substring_index(reg_domain, '.', 1)"))
            .as("n_domains"))
    }
  )
}
