package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps, Vectors}
import graft.operators.TextOps.P
import graft.sources.Tables
import graft.streaming.Streams

/** Fifty-third coverage wave: the DELTA-INGEST dedup family goes
  * streaming and vector-valued — the daily-crawl economics the batch
  * delta queries (q156 text, q107 chunks) established, applied to the
  * two remaining ingestion surfaces:
  *
  *  - q194: STREAMING near-dup dedup — incoming micro-batches probe a
  *    static corpus MinHash band index (stream-static broadcast join)
  *    and near-dup hits are flagged exactly once despite at-least-once
  *    delivery (`dropDuplicatesWithinWatermark`). The signature/band
  *    computation is [[Dedup.lshBandsStateless]] — row-local, no
  *    stateful aggregation, so the whole pre-join pipeline is a
  *    stateless projection per micro-batch. Oracle: the batch twin of
  *    the same band probe (q156's CTE stack), so stream/batch
  *    equivalence is itself inside the gate hash (the q192/q193
  *    pattern). Reference tie: this is the reference's competing-
  *    consumer ingest loop (src/tests/integration_test.rs:209-293)
  *    upgraded with the dedup an LLM-corpus pipeline demands.
  *  - q195: MP4 mvhd coverage widened to real muxer layouts — version
  *    1 (64-bit times) and non-first mvhd (iods/udta-led moov), plus
  *    the corrupt contract for an mvhd whose DECLARED size cannot hold
  *    its versioned header. Parameter-level oracle (the q192 pattern):
  *    payloads are hash-synthesized in-engine, the oracle re-derives
  *    the parameters, and Spark must decode its own bytes back to
  *    exactly those values.
  *  - q196: embedding delta-decontamination — the q156 asymmetry
  *    applied to the SRP-LSH vector path (q77's banding): the incoming
  *    batch's band buckets BROADCAST against the staged corpus band
  *    index, exact cosine runs on candidates only, and the corpus
  *    never self-joins. At 100 TB the candidate stage is bounded by
  *    |delta| x bands x bucket-width — the corpus contributes one
  *    stored band index scan, no corpus x corpus product anywhere
  *    (PlanSpec pins the broadcast shape).
  */
object Extras53 {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)
  private val one = lit(1)

  // q194 reuses q156's MinHash geometry + delta split so both queries
  // describe the same corpus/ingest world: K=16 hashes, 4 bands x 4,
  // every doc_id ending in 7 plays the incoming stream.
  private val K = 16; private val B = 4; private val R = 4
  private val DeltaMod = 10; private val DeltaRem = 7

  // q196 geometry: q77's SRP banding over the embeddings fixture.
  private val EBands = 4; private val EPlanes = 8
  private val ETau = 0.42
  private val EMod = 10; private val ERem = 7

  /** DuckDB twin of `Vectors.dot(v, Vectors.hyperplane(j))` — same Weyl
    * constants as Embeddings.planeSqlFor, regenerated here so the two
    * sides cannot drift. */
  private def planeSql(j: Int): String =
    s"""list_reduce(list_prepend(0.0e0, list_transform(range(64),
       |      i -> v[i+1] * ((($j*64 + i) * 2654435761 % 1000003)
       |        / 1000003.0e0 - 0.5e0))),
       |      (acc, x) -> acc + x)""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- streaming near-dup dedup against a static corpus index --------
    Qry(
      "q194_stream_neardup", {
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) % $P) AS m$i")
          .mkString(", ")
        val bandSelects = (0 until B).map { b =>
          val ks = (0 until R).map(r => s"m${b * R + r}").mkString(", ")
          s"SELECT doc_id, $b AS band_idx, concat_ws(':', $ks) AS band_key FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |sig AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |newb AS (SELECT * FROM banded
           |         WHERE doc_id % $DeltaMod = $DeltaRem),
           |corpb AS (SELECT * FROM banded
           |          WHERE doc_id % $DeltaMod <> $DeltaRem),
           |dup AS (SELECT DISTINCT n.doc_id FROM newb n JOIN corpb c
           |        ON n.band_idx = c.band_idx AND n.band_key = c.band_key)
           |SELECT d.doc_id, d.lang, d.source
           |FROM documents d JOIN dup ON d.doc_id = dup.doc_id""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val isDelta = col("doc_id") % DeltaMod === DeltaRem
      // static corpus band index — at production scale a stored table
      // maintained by ingestion; staged here (minhashSignatures
      // checkpoints) so the stream-static join doesn't recompute the
      // corpus pipeline per micro-batch
      val corpB = Dedup.lshBands(
        Dedup.minhashSignatures(
          Dedup.shingleHashes(
            t(spark, dir).documents.filter(!isDelta), "doc_id", "text"),
          "doc_id", "h", K),
        "doc_id", B, R)
        .select($"band_idx".as("ci"), $"band_key".as("ck"))
      // incoming stream, delivered at-least-once (every file twice)
      val src = Streams.fileStreamDup(spark, dir, "documents", copies = 2)
        .filter(isDelta)
      val banded = Dedup.lshBandsStateless(src, "doc_id", "text",
        K, B, R, carry = Seq("lang", "source"))
      // stream-static semi join: a band hit marks the doc as a
      // near-dup candidate of the corpus; the static side broadcasts
      // (band index of the corpus slice — the probe structure)
      val hits = banded
        .join(broadcast(corpB),
          $"band_idx" === $"ci" && $"band_key" === $"ck", "left_semi")
        // one verdict per doc despite 2x delivery AND multi-band hits:
        // bounded-state streaming dedup on the doc key. Event time is
        // derived (the fixture carries none); the watermark bounds the
        // dedup state exactly as a real ingest pipeline would bound it
        // by arrival-time skew.
        .withColumn("ets", timestamp_millis($"doc_id"))
        .withWatermark("ets", "1 hour")
        .dropDuplicatesWithinWatermark("doc_id")
        .select($"doc_id", $"lang", $"source")
      Streams.runToMemory(hits, "append")
    },

    // ---- MP4 mvhd: version 1, non-first mvhd, declared-size contract ---
    Qry(
      "q195_mp4_versions",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    h60 % 2 AS ver,
         |    (h60 % 11 = 0) AS corrupt,
         |    CASE (h60 // 8) % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
         |      WHEN 2 THEN 44100 ELSE 90000 END AS ts,
         |    (h60 // 32) % (CASE WHEN h60 % 2 = 0
         |      THEN 4294967296 ELSE 1099511627776 END) AS dur
         |  FROM d)
         |SELECT doc_id,
         |  CASE WHEN corrupt OR ver = 1 THEN NULL ELSE ts END AS ts32,
         |  CASE WHEN corrupt OR ver = 1 OR dur >= 2147483648
         |    THEN NULL ELSE dur END AS dur32,
         |  CASE WHEN corrupt THEN NULL ELSE ts END AS ts64,
         |  CASE WHEN corrupt THEN NULL ELSE dur END AS dur64,
         |  CASE WHEN corrupt THEN NULL
         |    ELSE dur * 1000 // ts END AS dur_ms
         |FROM p""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      def bytes(hex: String) = lit(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      def fill(n: Int) = lit(Array.fill[Byte](n)(0x6A))
      // u32/u64 BE from BIGINT expressions (values may exceed Int range)
      def be32(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) DIV 16777216 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 65536 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"))
      def be64(x: String) =
        concat(be32(s"($x) DIV 4294967296"), be32(s"($x) % 4294967296"))
      val ftyp = concat(bytes("00000018"),
        lit("ftypisom".getBytes("US-ASCII")), bytes("00000200"),
        lit("isomiso2".getBytes("US-ASCII")))
      // children preceding mvhd inside moov, chosen by hash: none /
      // iods(16) / iods(16)+udta(20) — the real-muxer layouts the
      // round-8 child walk exists for
      val kids = when(col("nkids") === 0, lit(Array.empty[Byte]))
        .when(col("nkids") === 1,
          concat(be32("16"), lit("iods".getBytes("US-ASCII")), fill(8)))
        .otherwise(concat(
          be32("16"), lit("iods".getBytes("US-ASCII")), fill(8),
          be32("20"), lit("udta".getBytes("US-ASCII")), fill(12)))
      // declared mvhd size: the real header size, or a LYING 20 on the
      // corrupt slice — full bytes still follow, so a parser that
      // trusts the array bound instead of the declared size would read
      // them (the advisor-r7 finding this query pins closed)
      val declSz = "CASE WHEN corrupt THEN 20 " +
        "WHEN ver = 0 THEN 28 ELSE 40 END"
      val mvhd0 = concat(be32(declSz), lit("mvhd".getBytes("US-ASCII")),
        bytes("00000000" + "00000000" * 2), be32("ts"), be32("dur"))
      val mvhd1 = concat(be32(declSz), lit("mvhd".getBytes("US-ASCII")),
        bytes("01000000" + "00000000" * 4), be32("ts"), be64("dur"))
      val moovSz = "8 + (CASE nkids WHEN 0 THEN 0 WHEN 1 THEN 16 " +
        "ELSE 36 END) + (CASE WHEN ver = 0 THEN 28 ELSE 40 END)"
      val blob = concat(ftyp, be32(moovSz),
        lit("moov".getBytes("US-ASCII")), kids,
        when(col("ver") === 0, mvhd0).otherwise(mvhd1))
      t(spark, dir).documents
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("ver", expr("CAST(h60 % 2 AS INT)"))
        .withColumn("nkids", expr("CAST((h60 DIV 2) % 3 AS INT)"))
        .withColumn("corrupt", expr("h60 % 11 = 0"))
        .withColumn("ts", element_at(
          array(Seq(600, 1000, 44100, 90000).map(lit): _*),
          expr("CAST((h60 DIV 8) % 4 AS INT)") + 1))
        .withColumn("dur", expr("(h60 DIV 32) % (CASE WHEN ver = 0 " +
          "THEN 4294967296 ELSE 1099511627776 END)"))
        .withColumn("b", blob)
        .select(col("doc_id"),
          expr("mp4_timescale(b)").as("ts32"),
          expr("mp4_duration(b)").as("dur32"),
          expr("mp4_timescale64(b)").as("ts64"),
          expr("mp4_duration64(b)").as("dur64"),
          expr("mp4_duration64(b) * 1000 DIV nullif(mp4_timescale64(b), 0)")
            .as("dur_ms"))
    },

    // ---- embedding delta-decontamination (SRP band probe) --------------
    Qry(
      "q196_embed_delta_decontam", {
        val bandSelects = (0 until EBands).map { b =>
          val bits = (0 until EPlanes).map { p =>
            s"CASE WHEN ${planeSql(b * EPlanes + p)} > 0 " +
              s"THEN ${1L << p} ELSE 0 END"
          }.mkString("\n      + ")
          s"SELECT vec_id, $b AS b, CAST($bits AS BIGINT) AS bk FROM e"
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id, label,
           |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, label, v,
           |    sqrt(list_dot_product(v, v)) AS nr FROM e),
           |bands AS ($bandSelects),
           |cand AS (SELECT DISTINCT d.vec_id AS di, c.vec_id AS ci
           |  FROM (SELECT * FROM bands WHERE vec_id % $EMod = $ERem) d
           |  JOIN (SELECT * FROM bands WHERE vec_id % $EMod <> $ERem) c
           |    ON d.b = c.b AND d.bk = c.bk),
           |hit AS (SELECT DISTINCT di FROM cand
           |  JOIN n nd ON di = nd.vec_id
           |  JOIN n nc ON ci = nc.vec_id
           |  WHERE list_dot_product(nd.v, nc.v) / (nd.nr * nc.nr)
           |    > $ETau)
           |SELECT vec_id, label,
           |  CASE WHEN hit.di IS NULL THEN 0 ELSE 1 END AS is_dup
           |FROM n LEFT JOIN hit ON n.vec_id = hit.di
           |WHERE vec_id % $EMod = $ERem""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val n = t(spark, dir).embeddings
        .select($"vec_id", $"label", Vectors.toDouble($"embedding").as("v"))
        .withColumn("nr", Vectors.norm($"v"))
      val isDelta = $"vec_id" % EMod === ERem
      def banded(df: DataFrame, idAs: String) = df.select(
        col("vec_id").as(idAs),
        explode(array((0 until EBands).map { b =>
          struct(lit(b).as("b"),
            Vectors.srpBandBucket(col("v"), b, EPlanes).as("bk"))
        }: _*)).as("band"))
        .select(col(idAs), col("band.b"), col("band.bk"))
      // corpus band index: at production a STORED table maintained by
      // ingestion — it streams through the probe join once; the delta's
      // bands are the small side and BROADCAST (PlanSpec pins this
      // shape), so the candidate set is bounded by
      // |delta| x bands x bucket-width with no corpus self-join.
      val corpB = banded(n.filter(!isDelta), "ci")
        .withColumnRenamed("b", "cb").withColumnRenamed("bk", "cbk")
      val deltaB = banded(n.filter(isDelta), "di")
      val cand = corpB.join(broadcast(deltaB),
          $"cb" === $"b" && $"cbk" === $"bk")
        .select($"di", $"ci").distinct()
      // exact cosine on CANDIDATES ONLY — the verify stage touches
      // |cand| pairs, never |delta| x |corpus|
      val hit = cand
        .join(n.filter(isDelta)
          .select($"vec_id".as("dv_id"), $"v".as("dv"), $"nr".as("dnr")),
          $"di" === $"dv_id")
        .join(n.filter(!isDelta)
          .select($"vec_id".as("cv_id"), $"v".as("cv"), $"nr".as("cnr")),
          $"ci" === $"cv_id")
        .filter(Vectors.cosine(
          Vectors.dot($"dv", $"cv"), $"dnr", $"cnr") > ETau)
        .select($"di").distinct()
      n.filter(isDelta)
        .join(broadcast(hit), $"vec_id" === $"di", "left_outer")
        .select($"vec_id", $"label",
          when($"di".isNotNull, 1).otherwise(0).as("is_dup"))
    }
  )
}
