package graft

import org.apache.spark.sql.functions._

import graft.Graft._

class GraftFacadeSpec extends SparkTestBase {
  import spark.implicits._

  test("facade: as-of + sessionize + dedup + topk compose on DataFrames") {
    val trades = Seq((1L, 100L, 9.0), (1L, 200L, 11.0))
      .toDF("sym", "ts", "px")
    val quotes = Seq((1L, 90L, 8.5), (1L, 150L, 10.5))
      .toDF("sym", "qts", "bid")
    val enriched = trades.asofBackward(quotes, Seq("sym" -> "sym"),
      "ts", "qts", carry = Seq("bid" -> "bid"))
    assert(enriched.orderBy("ts").select("bid").as[Double]
      .collect().toSeq == Seq(8.5, 10.5))

    val sess = Seq((1L, 0L), (1L, 100L), (1L, 5000L)).toDF("u", "ms")
      .sessionized(Seq("u"), "ms", gapMs = 1000L)
    assert(sess.select("session_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L))

    val docs = Seq((1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps high"),
      (3L, "entirely different words here now")).toDF("id", "text")
    assert(docs.exactDedup("id", "text").count() == 2)
    val pairs = docs.nearDupPairs("id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))

    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f))).toDF("id", "vec")
    val nn = vecs.cosineTopK(vecs.filter($"id" === 1), "id", "vec", k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(nn.toSeq == Seq(2L)) // 2 is nearest to 1
  }

  test("facade: fuzzy match, embed near-dup, BPE token count") {
    val names = Seq((1L, "alpha-node-17"), (2L, "alpha-node-18"),
      (3L, "omega-zzz-999")).toDF("id", "name")
    val fm = names.fuzzyMatchPairs("id", "name", maxDist = 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fm == Set((1L, 2L, 1)))

    // 64-dim so the SRP hyperplanes see real components
    def v(seed: Int) = Array.tabulate(64)(i =>
      math.sin(seed * 97 + i).toFloat)
    val near = v(1).clone(); near(0) = near(0) + 0.01f
    val emb = Seq((1L, v(1)), (2L, near), (3L, v(5)))
      .toDF("id", "vec")
      .select($"id", $"vec".cast("array<double>").as("vec"))
    val nd = emb.embedNearDupPairs("id", "vec", threshold = 0.95)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd == Set((1L, 2L)))

    val counted = Seq("I'll jump over 2 dogs!").toDF("text")
      .withBpeTokenCount("text")
    // I |'ll| jump| over| 2| dogs|! → 7 pre-tokens
    assert(counted.select("bpe_tokens").as[Long].head() == 7L)
  }

  test("round-2 facade additions: stats, nearest as-of, char n-grams") {
    // linearFit via facade on a perfect line
    val line = (1 to 50).map(i => (i.toDouble, 3.0 * i - 2.0, 0))
      .toDF("x", "y", "g")
    val fit = line.linearFit($"x", $"y", $"g").head()
    assert(math.abs(fit.getAs[Double]("slope") - 3.0) < 1e-9 &&
      math.abs(fit.getAs[Double]("intercept") + 2.0) < 1e-9)

    // zscoreOutliers via facade
    val vals = ((1 to 200).map(i => (i.toLong, "a", 5.0 + (i % 2))) :+
      ((999L, "a", 500.0))).toDF("id", "k", "v")
    assert(vals.zscoreOutliers("k", "v").select("id").as[Long]
      .collect().toSeq == Seq(999L))

    // ewma via facade: taps=2, alpha=0.5
    val e = Seq((1L, 1, 4.0), (1L, 2, 1.0)).toDF("k", "t", "v")
      .ewma(Seq($"k"), Seq($"t"), "v", alpha = 0.5, taps = 2)
    assert(e.select("ewma").as[Double].head() == (1.0 + 0.5 * 4.0) / 1.5)

    // nearest as-of via facade
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L, "past"), (1L, 104L, "future"))
      .toDF("k", "rt", "rv")
    val nearest = l.asofNearest(r, Seq("k" -> "k"), "t", "rt",
      carry = Seq("rv" -> "rv"), rightTieBreak = Seq("rv")).head()
    assert(nearest.getString(2) == "future" && nearest.getLong(3) == 4L)

    // char n-gram pairs via facade: trigram-similar identifiers match
    val ids = Seq((1L, "node-0017"), (2L, "node-0018"), (3L, "xxxxxx"))
      .toDF("id", "s")
    val pairs = ids.charNGramPairs("id", "s", threshold = 0.3,
      dfCap = 16).select("id_a", "id_b")
      .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))

    // native as-of via facade agrees with the union formulation
    val nl = Seq((1L, 10L, 7L)).toDF("k", "t", "lv")
    val nr = Seq((1L, 5L, 0.25)).toDF("k", "t", "rv")
    val nat = nl.asofBackwardNative(nr, Seq("k" -> "k"), "t", "t",
      carry = Seq("rv" -> "rv")).head()
    assert(nat.getDouble(3) == 0.25)

    // token chunks + decontamination via facade
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),        // shares chunk "a..h" with held-out
      (2L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val held = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    assert(corpus.tokenChunks("doc_id", "text", 8).count() == 2)
    assert(corpus.contaminatedBy(held, "doc_id", "text", 8)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("round-4 facade additions: dup clusters, staging control") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "the quick brown fox jumps high today"),
      (5L, "the quick brown fox jumps high tonight"),
      (9L, "entirely different words appear here now then"))
      .toDF("id", "text")
    val clusters = docs.dupClusters("id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1-2-5 form one cluster labeled by its min id; 9 is unpaired and
    // absent from the edge graph
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))

    val staged = docs.staged(eager = true)
    assert(staged.count() == 4)
    Graft.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("round-5 facade additions: PII scrub, semantic decontam, z-order write") {
    // piiRedacted: in-place scrub of all three pattern families
    val docs = Seq(
      (1L, "mail me at a.b+c@x-corp.io or call +1-555-0100"),
      (2L, "server 192.168.0.1 answered"),
      (3L, "no pii here")).toDF("id", "text")
    val red = docs.piiRedacted("text").orderBy("id")
      .select("text").as[String].collect().toSeq
    assert(red == Seq("mail me at <EMAIL> or call <PHONE>",
      "server <IP> answered", "no pii here"))

    // semanticDecontaminated: id 2 is the benchmark's near-twin and must
    // go; orthogonal id 3 survives; the benchmark itself isn't in df
    def v(seed: Int) = Array.tabulate(64)(i => math.sin(seed * 97 + i).toFloat)
    val near = v(1).clone(); near(0) = near(0) + 0.01f
    val corpus = Seq((2L, near), (3L, v(5))).toDF("id", "vec")
    val bench = Seq((100L, v(1))).toDF("id", "vec")
    val kept = corpus.semanticDecontaminated(bench, "id", "vec", tau = 0.9)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(3L))

    // zOrderedBy: the layout path drops its working column, keeps the
    // schema, preserves every row, and lands the requested file count
    val grid = (0L until 256L).map(i => (i % 16, i / 16)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw_")
    grid.zOrderedBy("x", "y", files = 4).write
      .mode("overwrite").parquet(s"$dir/g")
    val back = spark.read.parquet(s"$dir/g")
    assert(back.columns.toSeq.sorted == Seq("x", "y"))
    assert(back.count() == 256)
    assert(back.select(input_file_name()).distinct().count() == 4)
  }

  test("round-5 SQL surface: pii_redact + z_interleave16 match the Column operators") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("write a@b.io now", 3L, 5L)).toDF("t", "x", "y")
      .createOrReplaceTempView("graft_sqlfn_v")
    val r = spark.sql(
      "SELECT pii_redact(t) AS t, z_interleave16(x, y) AS z FROM graft_sqlfn_v")
      .head()
    assert(r.getString(0) == "write <EMAIL> now")
    // x=3 → bits 0,2 set; y=5 → bits 1,5 set; z = 1+4+2+32
    assert(r.getLong(1) == 39L)
  }

  test("session-4 facade additions: split, upsample, delta dedup, weighted sample, LM score, pagerank") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "src0"),
      (2L, "alpha beta gamma delta epsilon zeta", "src1"),
      (3L, "one two three four five six seven eight", "src0"),
      (4L, "completely different words entirely here now", "src1"))
      .toDF("doc_id", "text", "source")

    // splitAssigned: deterministic, content-driven — identical text gets
    // the identical split regardless of source/id
    val sp = docs.splitAssigned("text")
    assert(sp.columns.contains("split"))
    val splits = sp.orderBy("doc_id").select("split").as[String]
      .collect().toSeq
    assert(splits(0) == splits(1), "identical text must co-split")

    // epochUpsampled: 2.0 = exactly two copies of every src0 doc;
    // 0.0 = src1 drops entirely
    val up = docs.epochUpsampled(Map("src0" -> 2.0, "src1" -> 0.0),
      "source", "text")
    assert(up.filter($"source" === "src1").count() == 0)
    assert(up.filter($"doc_id" === 1L).count() == 2)
    assert(up.filter($"doc_id" === 1L).select("copy_idx").as[Long]
      .collect().toSet == Set(1L, 2L))

    // deltaDedupedAgainst: doc 2 is an exact twin of corpus doc 1 →
    // dropped; docs 3/4 share no shingles with the corpus → kept
    val corpus = docs.filter($"doc_id" === 1L)
    val delta = docs.filter($"doc_id" =!= 1L)
    val kept = delta.deltaDedupedAgainst(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), s"got $kept")

    // weightedSampled: k larger than any stratum keeps everything —
    // the draw must never duplicate or invent rows
    val sampled = docs.weightedSampled("source", length($"text"), "text", 10)
    assert(sampled.count() == 4)
    assert(docs.weightedSampled("source", length($"text"), "text", 1)
      .groupBy("source").count().select("count").as[Long]
      .collect().forall(_ == 1L))

    // trigramLmScoredAgainst: a doc IDENTICAL to the train text scores
    // strictly lower NLL than an out-of-distribution doc
    val train = docs.filter($"doc_id" === 1L)
    val scored = docs.filter($"doc_id".isin(2L, 4L))
      .trigramLmScoredAgainst(train, "doc_id", "text")
    val nll = scored.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(nll(2L) < nll(4L),
      s"in-distribution text must score lower NLL: $nll")

    // pagerank facade: wiring smoke (semantics pinned in PageRankSpec)
    val pr = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("s", "d", "w")
      .pagerank("s", "d", "w")
    assert(pr.count() == 2)
  }

  test("round-5 facade additions: scd2 + cusum + benford + novelty + quant + merges") {
    // SCD2: one key, attr changes A->B->A, middle interval closed
    val hist = Seq((1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"),
      (1L, 40L, "A")).toDF("k", "ts", "attr")
      .scd2History(Seq("k"), "attr", "ts", "ts")
      .orderBy("version").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
    assert(hist(0).getAs[Long]("valid_to") == 30L &&
      hist(1).getAs[Long]("valid_to") == 40L && hist(2).isNullAt(4))

    // CUSUM: a level shift drives the path to an extreme at the shift
    val cs = Seq.tabulate(8)(i =>
      ("s", i.toLong, if (i < 4) 0.0 else 10.0))
      .toDF("k", "t", "v").withCusum("k", "v", col("t"))
    val path = cs.orderBy("t").select("cusum").as[Double].collect()
    assert(path.min == path(3), s"trough must sit at the shift: ${path.toSeq}")
    assert(math.abs(path.last) < 1e-9, "path must return to ~0 at the end")

    // Benford: digits outside 1-9 impossible; ppm sums near 1e6
    val bf = Seq(1.2, 19.0, 22.0, 310.0, 4.0, 55.0, 190.0)
      .toDF("x").benfordDigits("x").collect()
    assert(bf.forall(r => (1L to 9L).contains(r.getAs[Long]("digit"))))
    assert(bf.map(_.getAs[Long]("n_obs")).sum == 7)

    // novelty: g1's shingles unique, g2/g3 share everything
    val nov = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "g1"),
      (2L, "one two three four five six", "g2"),
      (3L, "one two three four five six", "g3"))
      .toDF("id", "text", "g").groupNovelty("id", "text", "g")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("novelty_ppm")).toMap
    assert(nov("g1") == 1000000L && nov("g2") == 0L && nov("g3") == 0L, s"$nov")

    // int8 quantization: error bounded by s/254 per dim
    val qe = Seq((1L, Array.tabulate(64)(i => (i % 7 - 3) / 10f)))
      .toDF("id", "vec").int8QuantError("vec")
      .select("max_err").as[Double].head()
    assert(qe <= 0.3 / 254 + 1e-9, s"max_err $qe exceeds half-step bound")

    // rolling median: robust to the outlier at t=2 (mean is not)
    val rm = Seq(("k", 1L, 5.0), ("k", 2L, 500.0), ("k", 3L, 7.0))
      .toDF("k", "t", "v").withRollingMedian("k", "v", 3, col("t"))
      .orderBy("t").select("roll_med").as[Double].collect()
    assert(rm.toSeq == Seq(5.0, 5.0, 7.0), rm.toSeq.toString)

    // BPE merges: 'aa' dominates a corpus of 'aaa' repeated
    val bm = Seq("aaa aaa aab").toDF("text").bpeTopMerges("text", 2)
      .collect()
    assert(bm.head.getAs[String]("pair") == "aa" &&
      bm.head.getAs[Long]("n_occ") == 5L, bm.mkString(","))

    // centroid cosine: orthogonal labels -> cosine ~0, parallel -> ~1
    val cm = Seq(
      (0, Array(1f, 0f, 0f, 0f)), (0, Array(1f, 0f, 0f, 0f)),
      (1, Array(0f, 1f, 0f, 0f)),
      (2, Array(2f, 0f, 0f, 0f)))
      .toDF("label", "vec").centroidCosineMatrix("label", "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cm((0, 1))) < 1e-9 && math.abs(cm((0, 2)) - 1.0) < 1e-9,
      s"$cm")
  }

  test("round-5 facade additions: ring bus create + stream") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("v", LongType)))
    val ring = Graft.createRing("facade_ring", schema, 16)
    try {
      (0L until 10L).foreach(i =>
        assert(ring.tryEnqueue(org.apache.spark.sql.Row(i))))
      val got = graft.streaming.Streams.runToMemory(
        Graft.ringStream(spark, "facade_ring"), "append")
      assert(got.count() == 10)
    } finally graft.sources.RingRegistry.remove("facade_ring")
  }

  test("round-6 facade additions: containment pairs + boilerplate shingles") {
    // subset pair: doc 2 is a prefix of doc 1 — containment catches it,
    // the symmetric nearDupPairs threshold does not
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short)).toDF("id", "text")
    val c = docs.containmentPairs("id", "text", threshold = 0.8).collect()
    assert(c.length == 1 && c.head.getAs[Double]("containment") == 1.0)
    assert(docs.nearDupPairs("id", "text", threshold = 0.8).count() == 0)

    val template = "subscribe to our newsletter today"
    val tDocs = (1 to 5).map(i => (i.toLong, s"$template extra$i", "a"))
      .toDF("id", "text", "src")
    val flagged = tDocs.boilerplateShingles("id", "text", "src")
    assert(flagged.count() == 3 && // the template-internal shingles
      flagged.collect().forall(_.getAs[Long]("df") == 5L))

    // encode with a trained-artifact-shaped merge list, rank order
    // (t,h) then (th,e): "the" → [the]; "then" → [th,e,n] → [the,n]
    val enc = Seq((1L, "the then")).toDF("id", "text")
      .bpeEncodedCounts("id", "text", Seq("t" -> "h", "th" -> "e"))
      .collect().head
    assert(enc.getAs[Long]("n_words") == 2L &&
      enc.getAs[Long]("n_chars") == 7L &&
      enc.getAs[Long]("n_bpe") == 3L) // [the] + [the, n]
  }

  test("round-8 facade additions: streaming-capable near-dup probe + " +
      "embedding delta decontamination") {
    // nearDupHitsAgainst: doc 10 is a clone of corpus doc 1 -> hit;
    // doc 11 shares nothing -> silent. Batch frame here; q194 runs the
    // same operator on a streaming frame.
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different corpus content sits here now"))
      .toDF("id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "nothing in common with anything above at all"))
      .toDF("id", "text")
    val hits = delta.nearDupHitsAgainst(corpus, "id", "text")
      .dropDuplicates("id").select("id").as[Long].collect().toSeq
    assert(hits == Seq(10L), s"got $hits")

    // embedDeltaDecontaminated: delta 10 is corpus 1's near-twin ->
    // dropped; orthogonal-ish 11 survives
    def v(seed: Int) = Array.tabulate(64)(i =>
      math.sin(seed * 97 + i))
    val near = v(1).clone(); near(0) = near(0) + 0.01
    val corpusV = Seq((1L, v(1)), (2L, v(5))).toDF("id", "vec")
    val deltaV = Seq((10L, near), (11L, v(9))).toDF("id", "vec")
    val kept = deltaV.embedDeltaDecontaminated(corpusV, "id", "vec",
      tau = 0.9).select("id").as[Long].collect().toSeq
    assert(kept == Seq(11L), s"got $kept")
  }

  test("facade: media sniff + manifest over a mixed binary column") {
    import java.nio.{ByteBuffer, ByteOrder}
    // independent serializers (java.nio), one payload per format
    def gif(w: Int, h: Int) = {
      val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(w.toShort).putShort(h.toShort).put(Array[Byte](0, 0, 0))
      b.array()
    }
    def wav(rate: Int) = {
      val b = ByteBuffer.allocate(36).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(2).putInt(rate).putInt(rate * 4)
      b.putShort(4).putShort(16)
      b.array()
    }
    def mp4(ts: Int, dur: Int) = {
      val b = ByteBuffer.allocate(60).order(ByteOrder.BIG_ENDIAN)
      b.putInt(24).put("ftypisom".getBytes("US-ASCII"))
        .putInt(512).put("isomiso2".getBytes("US-ASCII"))
      b.putInt(36).put("moov".getBytes("US-ASCII"))
      b.putInt(28).put("mvhd".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      b.array()
    }
    val rows = Seq(
      (1L, gif(320, 200)), (2L, wav(44100)), (3L, mp4(1000, 5500)),
      (4L, "not media at all".getBytes("UTF-8")),
      // magic-valid MP4 declaring timescale 0: the never-fail contract
      // means duration_ms NULLs — under ANSI mode a bare DIV here threw
      // DIVIDE_BY_ZERO and killed the whole job (advisor r7)
      (5L, mp4(0, 5500)))
      .toDF("id", "blob")
    val sniffed = rows.mediaSniffed("blob").orderBy("id")
      .select("fmt", "width", "rate", "duration_ms").collect()
    assert(sniffed.map(_.getString(0)).toSeq ==
      Seq("gif", "wav", "mp4", "corrupt", "mp4"))
    assert(sniffed(0).getInt(1) == 320 && sniffed(1).getInt(2) == 44100 &&
      sniffed(2).getLong(3) == 5500L)
    assert(sniffed(4).isNullAt(3), "timescale-0 MP4 must NULL, not fail")
    val man = rows.mediaManifest("blob").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(man == Map("gif" -> 1L, "wav" -> 1L, "mp4" -> 2L,
      "corrupt" -> 1L))
  }
}
