package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, Vectors}
import graft.sources.Tables

/** Thirty-fifth coverage wave: corpus governance.
  *
  *  - Semantic decontamination (q153): removing training documents that
  *    are SEMANTICALLY close to an evaluation benchmark, the
  *    embedding-space counterpart of q107's exact-chunk decontamination.
  *    The benchmark side is small by definition (an eval set), which
  *    makes the scale shape different from q77's corpus×corpus near-dup:
  *    broadcast the benchmark, stream the corpus through ONE exact-cosine
  *    pass, aggregate per corpus row — no LSH needed until the benchmark
  *    itself outgrows a broadcast (then q43's SRP bucketing takes over
  *    candidate generation).
  *  - Corpus manifest (q154): the dataset-card fingerprint — per-stratum
  *    counts, sizes, and an order-independent content checksum, so a
  *    corpus version is verifiable with one cheap aggregate.
  */
object Extras35 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // every 97th vector plays the eval benchmark; 0.35 cosine = "too close"
  private val BenchMod = 97
  private val Tau = 0.35

  val all: Seq[Qry] = Seq(

    // ---- semantic decontamination --------------------------------------
    // Output: the REMOVED corpus vectors — how many benchmark entries
    // each collided with and the worst (max) cosine. The aggregate is
    // the barrier here, so the HAVING-style filter runs post-agg and
    // nothing recomputes. Cosines are computed on double-widened
    // vectors in index order on both engines (the q41-established
    // parity), so max_cos hash-compares exactly.
    Qry(
      "q153_semantic_decontam",
      s"""WITH e AS (SELECT vec_id, label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v,
         |    sqrt(list_dot_product(v, v)) AS nr FROM e),
         |b AS (SELECT v AS bv, nr AS bnr FROM n
         |      WHERE vec_id % $BenchMod = 0),
         |p AS (SELECT c.vec_id, c.label,
         |    list_dot_product(c.v, bv) / (c.nr * bnr) AS cos
         |  FROM (SELECT * FROM n WHERE vec_id % $BenchMod <> 0) c
         |  CROSS JOIN b)
         |SELECT vec_id, label,
         |  COUNT(*) FILTER (cos >= $Tau) AS n_hits,
         |  MAX(cos) AS max_cos
         |FROM p GROUP BY 1, 2 HAVING n_hits > 0""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val n = t(spark, dir).embeddings
        .select($"vec_id", $"label",
          Vectors.toDouble($"embedding").as("v"))
        .withColumn("nr", Vectors.norm($"v"))
      val bench = n.filter($"vec_id" % BenchMod === 0)
        .select($"v".as("bv"), $"nr".as("bnr"))
      n.filter($"vec_id" % BenchMod =!= 0)
        .crossJoin(broadcast(bench))
        .select($"vec_id", $"label",
          Vectors.cosine(Vectors.dot($"v", $"bv"), $"nr", $"bnr").as("cos"))
        .groupBy($"vec_id", $"label")
        .agg(count(when($"cos" >= Tau, 1)).as("n_hits"),
          max($"cos").as("max_cos"))
        .filter($"n_hits" > 0)
    },

    // ---- corpus manifest / dataset fingerprint -------------------------
    // The versioning record a dataset card carries per (source, lang)
    // stratum: document count, total characters, id range, and an
    // ORDER-INDEPENDENT content fingerprint — the sum of per-document
    // content hashes. Commutative + partial-aggregable, so the
    // fingerprint is reproducible across any partitioning or input file
    // order, and two corpus versions diff by comparing 30-odd rows. One
    // scan, one partial+final aggregate; at 100 TB it costs what a
    // count(*) costs.
    Qry(
      "q154_corpus_manifest",
      s"""SELECT source, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
         |  MIN(doc_id) AS id_lo, MAX(doc_id) AS id_hi,
         |  CAST(SUM(${TextOps.oracleHashSql("text")}) AS BIGINT)
         |    AS content_fp
         |FROM documents GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("chars_total"),
          min($"doc_id").as("id_lo"), max($"doc_id").as("id_hi"),
          sum(TextOps.hashMod($"text")).as("content_fp"))
    }
  )
}
