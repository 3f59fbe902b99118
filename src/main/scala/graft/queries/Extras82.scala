package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, Vectors}
import graft.sources.Tables

/** Eighty-second coverage wave: the transport family moves PAYLOAD
  * bytes, not just headers, and the IVF audit gains its tuning knob.
  *
  *  - q256: bounded gzip payload inflation round-trip. q202 parses gzip
  *    member headers; here the member body actually decompresses:
  *    every document's text is gzip-compressed IN-ENGINE
  *    (functions.GzipCompress) and inflated back through the bounded
  *    `gzip_inflate(blob, max_bytes)` expression, with three
  *    hash-chosen damage classes exercising the NULL contract — a
  *    truncated member (trailer cut), an inflate bound below the
  *    payload size (the zip-bomb guard firing), and a corrupted magic.
  *    The oracle predicts the INFLATED side purely from the synthesis
  *    parameters (the q192 pattern): intact rows must round-trip to
  *    exactly the original text's length and md5, damaged rows to NULL
  *    — the compressed bytes themselves are never asserted on, so the
  *    gate is independent of zlib version/level. Scale shape: one
  *    corpus scan, every stage a codegen'd projection, zero joins.
  *  - q259: the zstd twin of q256 over Spark's own zstd-jni (q203
  *    decoded zstd frame HEADERS; this moves the payload) — same
  *    bounded-inflate contract, deterministic-only damage classes
  *    (zstd has no mandatory checksum, so mid-frame damage is not a
  *    class here, documented at the query).
  *  - q257: multi-probe IVF — nprobe is the recall/cost knob every IVF
  *    deployment tunes, and q240 built the measurement harness for
  *    exactly one probed cell. Here each query probes its nprobe ∈
  *    {1,2,3} NEAREST centroids and the audit reports the full
  *    (recall@k, candidates-scanned) operating CURVE per query — the
  *    evidence an operator needs before committing nlist/nprobe at
  *    100 TB. Scale shape: q240's exactly — ONE staged assigned-vector
  *    leaf feeds the exact-truth ranking, the candidate scan, and the
  *    scan-cost count; the per-query centroid ranking (10×8 rows) and
  *    the 3-row nprobe grid ride as broadcasts, so adding the knob
  *    adds zero corpus-sized shuffles.
  */
object Extras82 {

  private val K = 3
  private val NProbes = Seq(1, 2, 3)

  val all: Seq[Qry] = Seq(

    // ---- bounded gzip inflation round-trip ------------------------------
    Qry(
      "q256_gzip_roundtrip",
      """WITH d AS (SELECT doc_id, text,
        |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 7
        |      AS cls
        |  FROM documents)
        |SELECT doc_id, CAST(cls AS INT) AS cls,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE CAST(strlen(text) AS BIGINT) END AS inflated_len,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE md5(text) END AS inflated_md5
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      // damage classes 0/1/2; 3-6 intact (the majority, so the happy
      // path dominates the round-trip evidence):
      //   0: trailer cut (CRC32+ISIZE gone) -> EOF during trailer read
      //   1: inflate bound one byte below the payload -> bomb guard
      //   2: first magic byte overwritten -> not a gzip stream
      Tables(spark, dir).documents
        .select($"doc_id", $"text",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)" +
            " % 7").cast("int").as("cls"))
        .withColumn("blob", expr("gzip_compress(CAST(text AS BINARY))"))
        .withColumn("mutated",
          when($"cls" === 0, expr("substring(blob, 1, length(blob) - 8)"))
            .when($"cls" === 2, concat(lit(Array[Byte](0x58, 0x58)),
              expr("substring(blob, 3, length(blob) - 2)")))
            .otherwise($"blob"))
        // class 1's bound is len-1 (for an empty text that is -1, which
        // the expression also NULLs); intact rows get exactly len — the
        // tightest bound that must still succeed
        .withColumn("cap",
          when($"cls" === 1, expr("CAST(length(text) - 1 AS INT)"))
            .otherwise(expr("CAST(length(text) AS INT)")))
        .withColumn("inf", expr("gzip_inflate(mutated, cap)"))
        .select($"doc_id", $"cls",
          length($"inf").cast(LongType).as("inflated_len"),
          md5($"inf").as("inflated_md5"))
    },

    // ---- bounded zstd inflation round-trip ------------------------------
    // q256's proof shape over the OTHER transport codec (q203's): the
    // zstd-jni library Spark already ships. Damage classes reuse the
    // gzip trio EXCEPT that zstd frames carry no mandatory checksum, so
    // only deterministic failures are synthesized (magic, truncation,
    // bound) — a mid-frame bit flip is not guaranteed detectable and is
    // deliberately absent. Class assignment hashes a different fold of
    // h60 than q256 so the two round-trips damage different documents.
    Qry(
      "q259_zstd_roundtrip",
      """WITH d AS (SELECT doc_id, text,
        |    (CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) // 7)
        |      % 7 AS cls
        |  FROM documents)
        |SELECT doc_id, CAST(cls AS INT) AS cls,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE CAST(strlen(text) AS BIGINT) END AS inflated_len,
        |  CASE WHEN cls IN (0, 1, 2) THEN NULL
        |    ELSE md5(text) END AS inflated_md5
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      Tables(spark, dir).documents
        .select($"doc_id", $"text",
          expr("(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)" +
            " DIV 7) % 7").cast("int").as("cls"))
        .withColumn("blob", expr("zstd_compress(CAST(text AS BINARY))"))
        .withColumn("mutated",
          when($"cls" === 0, expr("substring(blob, 1, length(blob) - 6)"))
            .when($"cls" === 2, concat(lit(Array[Byte](0x58, 0x58)),
              expr("substring(blob, 3, length(blob) - 2)")))
            .otherwise($"blob"))
        .withColumn("cap",
          when($"cls" === 1, expr("CAST(length(text) - 1 AS INT)"))
            .otherwise(expr("CAST(length(text) AS INT)")))
        .withColumn("inf", expr("zstd_inflate(mutated, cap)"))
        .select($"doc_id", $"cls",
          length($"inf").cast(LongType).as("inflated_len"),
          md5($"inf").as("inflated_md5"))
    },

    // ---- multi-probe IVF: the (recall, scanned) curve per nprobe --------
    Qry(
      "q257_ivf_multiprobe",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (SELECT vec_id, cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2
         |  FROM e, c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
         |n AS (SELECT e.vec_id, a.cid, v, sqrt(list_dot_product(v, v)) AS nr
         |      FROM e JOIN assign a ON e.vec_id = a.vec_id),
         |q AS (SELECT vec_id AS qid, v AS qv, nr AS qnr
         |      FROM n WHERE vec_id < 10),
         |qr AS (SELECT qid, cid, crank, qv, qnr FROM (
         |    SELECT qid, cid, qv, qnr, row_number() OVER (
         |        PARTITION BY qid ORDER BY
         |        list_reduce(list_prepend(0.0e0,
         |          list_transform(range(len(qv)),
         |            i -> (qv[i+1] - cv[i+1]) * (qv[i+1] - cv[i+1]))),
         |          (acc, x) -> acc + x), cid) AS crank
         |    FROM q, c) WHERE crank <= ${NProbes.max}),
         |probes AS (SELECT unnest([${NProbes.mkString(", ")}]) AS nprobe),
         |truth AS (SELECT qid, vec_id FROM (
         |    SELECT qid, n.vec_id, row_number() OVER (PARTITION BY qid
         |        ORDER BY list_dot_product(qv, v) / (qnr * nr) DESC,
         |          n.vec_id) AS rn
         |    FROM n, q WHERE n.vec_id <> qid) WHERE rn <= $K),
         |cand AS (SELECT qr.qid, qr.crank, n.vec_id,
         |    list_dot_product(qr.qv, n.v) / (qr.qnr * n.nr) AS cosine
         |  FROM n JOIN qr ON n.cid = qr.cid
         |  WHERE n.vec_id <> qr.qid),
         |ivf AS (SELECT nprobe, qid, vec_id FROM (
         |    SELECT p.nprobe, cd.qid, cd.vec_id,
         |      row_number() OVER (PARTITION BY p.nprobe, cd.qid
         |        ORDER BY cd.cosine DESC, cd.vec_id) AS rn
         |    FROM cand cd JOIN probes p ON cd.crank <= p.nprobe)
         |  WHERE rn <= $K),
         |sz AS (SELECT cd.qid, p.nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand
         |  FROM cand cd JOIN probes p ON cd.crank <= p.nprobe
         |  GROUP BY 1, 2)
         |SELECT t.qid, CAST(p.nprobe AS INT) AS nprobe, sz.n_cand,
         |  CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
         |  1000000 * COUNT(i.vec_id) // $K AS recall_ppm
         |FROM truth t CROSS JOIN probes p
         |  JOIN sz ON sz.qid = t.qid AND sz.nprobe = p.nprobe
         |  LEFT JOIN ivf i ON i.qid = t.qid AND i.nprobe = p.nprobe
         |    AND i.vec_id = t.vec_id
         |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      val assign = e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id".as("aid"), $"cid")
      // ONE staged leaf (q240's): vectors + norms + IVF assignment —
      // truth, candidate scan and scan-cost count all read it
      val n = Staging.stage(e.join(assign, $"vec_id" === $"aid")
        .select($"vec_id", $"cid", $"v", Vectors.norm($"v").as("nr")),
        eager = false)
      val q = n.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nr".as("qnr"))
      // per-query centroid RANKING (the multi-probe order): 10x8 rows,
      // rank-limited to the largest nprobe, rides as a broadcast
      val wCrank = Window.partitionBy($"qid").orderBy($"d2", $"qr_cid")
      val qr = q.crossJoin(broadcast(c))
        .select($"qid", $"cid".as("qr_cid"), $"qv", $"qnr",
          Vectors.distSq($"qv", $"cv").as("d2"))
        .withColumn("crank", row_number().over(wCrank))
        .filter($"crank" <= NProbes.max)
        .select($"qid", $"qr_cid", $"crank", $"qv", $"qnr")
      val probes = NProbes.toDF("nprobe")
      val wRank = Window.partitionBy($"qid")
        .orderBy($"cosine".desc, $"vec_id")
      val truth = n.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"qid")
        .select($"qid",
          Vectors.cosine(Vectors.dot($"qv", $"v"), $"qnr", $"nr")
            .as("cosine"),
          $"vec_id")
        .withColumn("rn", row_number().over(wRank))
        .filter($"rn" <= K)
        .select($"qid", $"vec_id")
      val cand = n.join(broadcast(qr),
          $"cid" === $"qr_cid" && $"vec_id" =!= $"qid")
        .select($"qid", $"crank", $"vec_id",
          Vectors.cosine(Vectors.dot($"qv", $"v"), $"qnr", $"nr")
            .as("cosine"))
      // the 3-row nprobe grid joins on crank <= nprobe — a broadcast
      // NLJ of a provably tiny side (the q247 grid pattern)
      val wIvf = Window.partitionBy($"nprobe", $"qid")
        .orderBy($"cosine".desc, $"vec_id")
      val ivf = cand.join(broadcast(probes), $"crank" <= $"nprobe")
        .withColumn("rn", row_number().over(wIvf))
        .filter($"rn" <= K)
        .select($"nprobe".as("i_np"), $"qid".as("i_qid"),
          $"vec_id".as("i_vid"))
      val sz = cand.join(broadcast(probes), $"crank" <= $"nprobe")
        .groupBy($"qid".as("s_qid"), $"nprobe".as("s_np"))
        .agg(count(lit(1)).as("n_cand"))
      truth.crossJoin(broadcast(probes))
        .join(ivf, $"qid" === $"i_qid" && $"nprobe" === $"i_np" &&
          $"vec_id" === $"i_vid", "left_outer")
        .groupBy($"qid", $"nprobe")
        .agg(count($"i_vid").as("n_hit"))
        .join(broadcast(sz), $"qid" === $"s_qid" && $"nprobe" === $"s_np")
        .select($"qid", $"nprobe", $"n_cand".cast(LongType).as("n_cand"),
          $"n_hit".cast(LongType).as("n_hit"),
          expr(s"1000000 * n_hit DIV $K").as("recall_ppm"))
    }
  )
}
