package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The round-6 dedup-suite closers (q178/q180 operators), exercised on
  * SYNTHETIC shapes the fixture cannot produce: the fixture's near-dups
  * are symmetric same-length clones, so every high-containment pair
  * there is also high-Jaccard — these specs pin the asymmetric and
  * template cases that justify the operators at corpus scale.
  */
class DedupSuiteSpec extends SparkTestBase {
  import spark.implicits._

  test("containment flags a subset/quote pair that the Jaccard threshold misses") {
    // doc 2 is a verbatim prefix of doc 1 (10 of its 30 words): its
    // 8 shingles are all contained in doc 1's 28, so C = 1.0 exactly,
    // while J = 8/28 ≈ 0.286 — invisible to a 0.5 Jaccard gate.
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val docsDf = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(
      Dedup.shingleHashes(docsDf, "doc_id", "text"), "doc_id").collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("shared") == 8L &&
      r.getAs[Long]("n_a") == 28L && r.getAs[Long]("n_b") == 8L)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Double]("jaccard") < 0.5,
      s"subset pair must sit below the symmetric threshold: $r")
  }

  test("containment and jaccard agree on identical documents") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val docsDf = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(
      Dedup.shingleHashes(docsDf, "doc_id", "text"), "doc_id")
      .collect().head
    assert(r.getAs[Double]("containment") == 1.0 &&
      r.getAs[Double]("jaccard") == 1.0)
  }

  test("boilerplate aggregate flags the shared template, not per-doc content") {
    // source a: 5 docs, each = 5-word template + unique tail → the 3
    // template-internal shingles have df 5 (ratio 1.0 ≥ 0.1, df ≥ 3);
    // bridge shingles (template→tail) and tail shingles are unique.
    // source b: only 2 docs share a phrase → under the df ≥ 3 floor.
    val template = "subscribe to our newsletter today"
    val a = (1 to 5).map(i => (i.toLong, s"$template unique$i tail$i", "a"))
    val b = Seq((6L, "rare shared phrase one", "b"),
      (7L, "rare shared phrase two", "b"))
    val docsDf = (a ++ b).toDF("doc_id", "text", "source")
    val flagged = Dedup.boilerplateShingles(
      Dedup.shingleHashes(docsDf, "doc_id", "text",
        n = 3, carry = Seq("source")),
      "doc_id", "source").collect()
    assert(flagged.forall(_.getAs[String]("source") == "a"),
      s"df-2 phrase in source b must stay under the floor: ${flagged.toSeq}")
    assert(flagged.length == 3, // exactly the template-internal shingles
      s"expected the 3 template shingles, got: ${flagged.toSeq}")
    assert(flagged.forall(_.getAs[Long]("df") == 5L))
  }

  test("dedup-suite operators degrade to empty on shingle-free documents") {
    // < 3 tokens → zero shingles per doc → empty results, never a crash
    // (the mixed-corpus contract: short rows drop out of the n-gram
    // operators rather than poisoning them)
    val docsDf = Seq((1L, "too short", "a"), (2L, "also tiny", "a"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.containmentPairs(
      Dedup.shingleHashes(docsDf, "doc_id", "text"), "doc_id").count() == 0)
    assert(Dedup.boilerplateShingles(
      Dedup.shingleHashes(docsDf, "doc_id", "text", n = 3,
        carry = Seq("source")),
      "doc_id", "source").count() == 0)
  }

  test("row-local stateless banding equals the exploded minhash pipeline") {
    // lshBandsStateless exists so STREAMING frames can band without a
    // stateful aggregation; its contract is exact equality with the
    // explode-groupBy pipeline on any batch frame — same hash family,
    // same distinct-shingle set, same band_key packing. Pin it on the
    // real fixture (sf0.001 documents, which carries planted
    // near-dup clones AND sub-3-token short docs).
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSig = Dedup.lshBands(
      Dedup.minhashSignatures(
        Dedup.shingleHashes(docs, "doc_id", "text"), "doc_id", "h", 16),
      "doc_id", 4, 4)
    val rowLocal = Dedup.lshBandsStateless(docs, "doc_id", "text", 16, 4, 4)
      .select("doc_id", "band_idx", "band_key")
    assert(viaSig.exceptAll(rowLocal).isEmpty &&
      rowLocal.exceptAll(viaSig).isEmpty,
      "stateless and exploded band rows must be identical")
    assert(rowLocal.count() > 0)
  }

  test("carry columns ride the shingle explode without changing the hashes") {
    val docsDf = Seq((1L, "alpha beta gamma delta", "s0"))
      .toDF("doc_id", "text", "source")
    val plain = Dedup.shingleHashes(docsDf, "doc_id", "text")
    val carried = Dedup.shingleHashes(docsDf, "doc_id", "text",
      n = 3, carry = Seq("source"))
    assert(carried.columns.toSeq == Seq("doc_id", "source", "h"))
    assert(carried.select("h").collect().map(_.getLong(0)).sorted.toSeq ==
      plain.select("h").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
