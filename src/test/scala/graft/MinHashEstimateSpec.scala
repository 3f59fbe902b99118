package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The estimator-quality claim that used to live in q103's oracle: at
  * fixture scale, every true near-dup pair's K=16 signature-agreement
  * estimate lands within 0.3 of exact Jaccard (binomial noise budget;
  * the modpow coefficient family is what keeps this true — see
  * TextOps.aParam). The GATE now checks n_match exactly; this spec
  * checks the statistics. */
class MinHashEstimateSpec extends SparkTestBase {
  import spark.implicits._

  test("K=16 signature agreement tracks exact Jaccard within 0.3") {
    val K = 16
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .documents
    val shc = Dedup.dfCapped(
      Dedup.shingleHashes(docs, "doc_id", "text"), Dedup.DefaultDfCap)
      .localCheckpoint(false)
    val exact = Dedup.jaccardPairs(shc, "doc_id", dfCap = 0)
      .filter($"jaccard" >= 0.5)
    val sig = Dedup.minhashSignatures(shc, "doc_id", "h", K)
    val sa = sig.select($"doc_id".as("ka") +:
      (0 until K).map(i => col(s"m$i").as(s"a$i")): _*)
    val sb = sig.select($"doc_id".as("kb") +:
      (0 until K).map(i => col(s"m$i").as(s"b$i")): _*)
    val nMatch = (0 until K).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
    val rows = exact.join(sa, $"id_a" === $"ka")
      .join(sb, $"id_b" === $"kb")
      .select($"jaccard", (nMatch.cast("double") / K).as("est"))
      .collect()
    assert(rows.nonEmpty)
    val worst = rows.map(r =>
      math.abs(r.getDouble(0) - r.getDouble(1))).max
    assert(worst <= 0.3, s"worst |est - J| = $worst over ${rows.length} pairs")
  }
}
