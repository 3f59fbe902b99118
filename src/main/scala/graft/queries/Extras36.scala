package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextOps}
import graft.operators.TextOps.P
import graft.sources.Tables

/** Thirty-sixth coverage wave: corpus assembly mechanics.
  *
  *  - Mixture-weight upsampling (q155): materializing a training mix
  *    from per-source epoch weights (the dataset-card "sampling
  *    proportion" column). Integer part of the weight = guaranteed
  *    copies; fractional part = a deterministic per-document Bernoulli
  *    draw keyed on content hash, so the realized mix is reproducible
  *    across runs, partitionings, and engines — no RNG state anywhere.
  *  - Incremental (delta) dedup (q156): deduplicating an INCOMING batch
  *    against an existing corpus without ever self-joining the corpus —
  *    the production shape of crawl ingestion, where the corpus's
  *    MinHash band index is precomputed and only the delta's bands
  *    probe it. Complements q37 (corpus×corpus candidate pairs) and
  *    q74 (full clustering): here the corpus is read-only and the
  *    output is a keep/drop verdict per new document.
  */
object Extras36 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // ---- q155: per-source epoch milli-weights ----------------------------
  // Milli-weights (2500 = 2.5 epochs), integer so the fractional
  // Bernoulli threshold `hash % 1000 < wm % 1000` is exact in both
  // engines — a double weight would put a float compare on the replica
  // boundary. Sources absent from the map default to 1.0 (one epoch).
  private val MixMilli: Seq[(String, Int)] = Seq(
    "src0" -> 2500, "src1" -> 1800, "src2" -> 1200, "src3" -> 300,
    "src4" -> 900, "src5" -> 1000, "src6" -> 600, "src7" -> 1500,
    "src8" -> 400, "src9" -> 2000)

  // q156 reuses the q37/q103 MinHash geometry: K=16 hashes, 4 bands × 4.
  private val K = 16; private val B = 4; private val R = 4
  // every 10th document (doc_id ending in 7) plays the incoming batch
  private val DeltaMod = 10; private val DeltaRem = 7

  val all: Seq[Qry] = Seq(

    // ---- mixture-weight upsampling ------------------------------------
    // One scan → map-side weight lookup + hash draw → explode to
    // `n_copies` rows per kept document. Weights < 1.0 downsample (the
    // draw keeps a deterministic wm/1000 fraction); weights > 1.0 emit
    // floor(w) copies plus the fractional draw. copy_idx makes each
    // replica addressable (shuffling/sharding downstream shards by
    // (doc_id, copy_idx), not doc_id, so replicas spread). At 100 TB
    // this is pure map-side row generation — no shuffle, no state; the
    // explode multiplies bytes by the mix factor exactly where a writer
    // would re-emit the document.
    Qry(
      "q155_epoch_upsample", {
        val caseArms = MixMilli.map { case (s, w) =>
          s"WHEN '$s' THEN $w" }.mkString(" ")
        s"""WITH w AS (SELECT doc_id, source,
           |    CASE source $caseArms ELSE 1000 END AS wm,
           |    ${TextOps.oracleHashSql("text")} AS hv
           |  FROM documents),
           |r AS (SELECT doc_id, source,
           |    wm // 1000
           |      + CASE WHEN hv % 1000 < wm % 1000 THEN 1 ELSE 0 END
           |      AS rep
           |  FROM w)
           |SELECT doc_id, source, CAST(i AS BIGINT) AS copy_idx,
           |  CAST(rep AS BIGINT) AS n_copies
           |FROM (SELECT doc_id, source, rep,
           |        unnest(generate_series(1, rep)) AS i
           |      FROM r)""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val wm = coalesce(
        element_at(typedLit(MixMilli.toMap), $"source"), lit(1000))
      t(spark, dir).documents
        .select($"doc_id", $"source", wm.as("wm"),
          TextOps.hashMod($"text").as("hv"))
        .withColumn("rep",
          ($"wm".cast(LongType) / 1000).cast(LongType) +
            when($"hv" % 1000 < $"wm" % 1000, 1L).otherwise(0L))
        // rep = 0 (downsampled out) must NOT reach sequence(): Spark's
        // sequence(1, 0) yields a DESCENDING [1, 0], not empty. A
        // `.filter(rep >= 1)` instead of the when-guard gets pushed
        // below the projection and re-evaluates the md5 in the Filter
        // AND the Project (q151's expensive-expression pushdown tax,
        // verified in this query's first plan dump); the null branch
        // is dropped by non-outer explode for free.
        .select($"doc_id", $"source",
          explode(when($"rep" >= 1, sequence(lit(1L), $"rep")))
            .as("copy_idx"),
          $"rep".as("n_copies"))
    },

    // ---- incremental (delta) dedup against an existing corpus ---------
    // The corpus side contributes ONLY its band index (one hash
    // aggregate + band explode — at production scale this is a stored
    // table maintained by ingestion, not recomputed); the incoming
    // batch's bands probe it with a semi-join shape and each new doc
    // gets a keep/drop verdict. No corpus×corpus pair is ever formed,
    // so cost is O(corpus bands) + O(delta × bucket width) — the
    // asymmetry that makes daily crawl dedup feasible where q74's full
    // clustering would be a weekly batch job. The delta's matched-id
    // set is tiny → broadcast back against the batch for the verdict
    // column.
    Qry(
      "q156_delta_dedup", {
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
           |SELECT d.doc_id, d.lang, d.source,
           |  CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
           |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
           |WHERE d.doc_id % $DeltaMod = $DeltaRem""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val d = t(spark, dir).documents
      val sh = Dedup.shingleHashes(d, "doc_id", "text")
      val sig = Dedup.minhashSignatures(sh, "doc_id", "h", K)
      val banded = Dedup.lshBands(sig, "doc_id", B, R)
      val isDelta = col("doc_id") % DeltaMod === DeltaRem
      val corpB = banded.filter(!isDelta)
        .select($"band_idx".as("ci"), $"band_key".as("ck"))
      val dupIds = banded.filter(isDelta)
        .join(corpB, $"band_idx" === $"ci" && $"band_key" === $"ck",
          "left_semi")
        .select($"doc_id".as("dup_id")).distinct()
      d.filter(isDelta)
        .join(broadcast(dupIds), $"doc_id" === $"dup_id", "left_outer")
        .select($"doc_id", $"lang", $"source",
          when($"dup_id".isNotNull, 1).otherwise(0).as("is_dup"))
    }
  )
}
