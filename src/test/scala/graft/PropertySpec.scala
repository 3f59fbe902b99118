package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Sessionize, TextOps}

/** ScalaCheck property tests (SURVEY.md §5.2.3) — invariants the
  * reference never asserted, checked over generated inputs. Uses the
  * ScalaCheck API directly (fixed seed via the default RNG + bounded
  * sizes keep runtime sane on a shared Spark session). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, tests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  test("property: sessionization is a partition (conservation + bounds)") {
    val rowsGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 4L), Gen.choose(0L, 5000L)))
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "t")
      val out = Sessionize.byGap(df, Seq("k"), "t", gapMs = 500L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val conserved = out.length == rows.length
      val withinGap = out.groupBy(r => (r._1, r._3)).forall {
        case (_, sess) =>
          val ts = sess.map(_._2).sorted
          ts.zip(ts.tail).forall { case (a, b) => b - a < 500L }
      }
      // session ids are 1..K contiguous per key
      val contiguous = out.groupBy(_._1).forall { case (_, rs) =>
        val ids = rs.map(_._3).distinct.sorted.toList
        ids == (1L to ids.length).toList
      }
      conserved && withinGap && contiguous
    }, tests = 15)
  }

  test("property: fingerprint is injective-ish and permutation-sensitive") {
    val tokGen = Gen.listOfN(6,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    check(Prop.forAll(tokGen, tokGen) { (a, b) =>
      val Seq(fa, fb) = Seq(a, b).map(_.mkString(" "))
        .toDF("text").select(TextOps.docFingerprint($"text"))
        .as[Long].collect().toSeq
      // equal token sequences → equal fingerprints; the converse holds
      // with overwhelming probability for these tiny vocabularies
      if (a == b) fa == fb
      else fa != fb || a == b
    }, tests = 15)
  }

  test("property: deletion-variant blocking is complete for lev <= 2") {
    // apply up to 2 random edits (sub/ins/del) to a base string; the
    // edited pair must ALWAYS be found by editDistancePairs (SymSpell
    // completeness), with the dist column equal to true levenshtein
    val baseGen = Gen.chooseNum(4, 10)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val editGen = Gen.chooseNum(0, 2).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 100),
        Gen.alphaLowerChar)))
    check(Prop.forAll(baseGen, editGen) { (base, edits) =>
      val edited = edits.foldLeft(base) { case (s, (kind, posSeed, ch)) =>
        if (s.isEmpty) s + ch
        else {
          val p = posSeed % s.length
          kind % 3 match {
            case 0 => s.updated(p, ch)                         // substitute
            case 1 => s.substring(0, p) + ch + s.substring(p)  // insert
            case 2 => s.substring(0, p) + s.substring(p + 1)   // delete
          }
        }
      }
      if (edited.isEmpty) true // operator documents non-empty input
      else {
        val df = Seq((1L, base), (2L, edited)).toDF("id", "s")
        val found = Dedup.editDistancePairs(df, "id", "s", maxDist = 2)
          .select($"dist").as[Int].collect().toSeq
        val expected = df.agg(
          org.apache.spark.sql.functions.levenshtein(
            org.apache.spark.sql.functions.min($"s"),
            org.apache.spark.sql.functions.max($"s"))).as[Int].head()
        if (expected <= 2 && base != edited) found == Seq(expected)
        else if (base == edited) found == Seq(0)
        else found.isEmpty
      }
    }, tests = 12)
  }

  test("property: hashMod stays in [0, P) and is stable") {
    val sGen = Gen.alphaNumStr.map(_.take(40))
    check(Prop.forAll(Gen.listOfN(20, sGen)) { ss =>
      val hs = ss.toDF("s").select(TextOps.hashMod($"s"))
        .as[Long].collect()
      val hs2 = ss.toDF("s").select(TextOps.hashMod($"s"))
        .as[Long].collect()
      hs.forall(h => h >= 0 && h < TextOps.P) && hs.sameElements(hs2)
    }, tests = 10)
  }

  test("property: zip_with-fold shingles equal the naive sliding window") {
    // the fast formulation (argument-position HOFs, see TextOps.shingles)
    // must be extensionally identical to the obvious Scala one for every
    // n and token sequence, including the < n boundary
    val tokGen = Gen.choose(0, 9).flatMap(k => Gen.listOfN(k,
      Gen.oneOf("a", "bb", "ccc", "d0", "e", "ff")))
    check(Prop.forAll(tokGen, Gen.choose(1, 4)) { (toks, n) =>
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(TextOps.shingles(TextOps.tokens($"text"), n).as("sh"))
        .as[Seq[String]].head()
      val expected =
        if (toks.length < n) Seq.empty
        else toks.sliding(n, 1).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
      got == expected
    }, tests = 25)
  }

  test("property: strideChunks equals every-nth non-overlapping window") {
    // the aggregate-fold chunker (argument-position tk, L/n materialized
    // chunks) must match the obvious grouped(n) with the leftover tail
    // dropped, for every n and token count including the < n boundary
    val tokGen = Gen.choose(0, 20).flatMap(k => Gen.listOfN(k,
      Gen.oneOf("a", "bb", "ccc", "d0", "e", "ff")))
    check(Prop.forAll(tokGen, Gen.choose(1, 5)) { (toks, n) =>
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(TextOps.strideChunks(TextOps.tokens($"text"), n).as("ch"))
        .as[Seq[String]].head()
      val expected = toks.grouped(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
      got == expected
    }, tests = 25)
  }

  test("property: charNGramHashes emits one hash per distinct n-gram") {
    val sGen = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', '0')).map(_.mkString))
    check(Prop.forAll(sGen) { s =>
      val got = Dedup.charNGramHashes(
          Seq((1L, s)).toDF("id", "s"), "id", "s", 3)
        .count()
      val expected =
        if (s.length < 3) 0L
        else s.sliding(3, 1).filter(_.length == 3).toSet.size.toLong
      got == expected
    }, tests = 25)
  }

  test("property: SCD2 intervals partition each key's timeline") {
    import graft.Graft._
    import org.apache.spark.sql.functions.col
    val rowsGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(0L, 1000L), Gen.oneOf("A", "B", "C")))
    check(Prop.forAll(rowsGen) { rows =>
      // unique (k, t) — ties would make the change-point order arbitrary
      val uniq = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = uniq.toDF("k", "t", "attr")
      val hist = df.scd2History(Seq("k"), "attr", "t", "t")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3), if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
      hist.groupBy(_._1).forall { case (k, vs) =>
        val sorted = vs.sortBy(_._2).toList
        val events = uniq.filter(_._1 == k).sortBy(r => (r._2, r._1))
        // intervals abut: each valid_to equals the next valid_from;
        // first starts at the key's first event; exactly one open end
        val abut = sorted.zip(sorted.tail).forall {
          case (a, b) => a._5 == b._4
        }
        val starts = sorted.head._4 == events.map(_._2).min
        val oneOpen = sorted.count(_._5 == Long.MaxValue) == 1 &&
          sorted.last._5 == Long.MaxValue
        // adjacent versions always change the attribute
        val changes = sorted.zip(sorted.tail).forall {
          case (a, b) => a._3 != b._3
        }
        abut && starts && oneOpen && changes
      }
    }, tests = 10)
  }

  test("property: CUSUM path terminates at ~0 and rolling median is a window element") {
    import graft.Graft._
    import org.apache.spark.sql.functions.col
    val valsGen = Gen.listOfN(25, Gen.choose(-50.0, 50.0))
    check(Prop.forAll(valsGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("k", i.toLong, math.rint(v * 100) / 100) }.toDF("k", "t", "v")
      val path = df.withCusum("k", "v", col("t"))
        .orderBy("t").select("cusum").as[Double].collect()
      // Σ(v - mean) over the whole series is 0 up to the decimal grid:
      // each deviation is 6-dp-rounded before accumulation, so the
      // terminal value is bounded by n · 5e-7
      val terminal = math.abs(path.last) <= vs.length * 5e-7 + 1e-9
      val med = df.withRollingMedian("k", "v", 5, col("t"))
        .orderBy("t").select("v", "roll_med")
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      // every rolling median is an actual element of its trailing window
      val member = med.zipWithIndex.forall { case ((_, m), i) =>
        med.slice(math.max(0, i - 4), i + 1).exists(_._1 == m)
      }
      terminal && member
    }, tests = 10)
  }

  test("property: MinHash coefficients are large and distinct (no " +
    "small-preimage order preservation)") {
    // the round-2 family fix: every a_i must be big enough that even the
    // smallest wrap window (x < P / a_i) is negligible, and coefficients
    // must not repeat across the K=16 functions
    val as = (0 until 16).map(TextOps.aParam)
    val bs = (0 until 16).map(TextOps.bParam)
    assert(as.distinct.size == 16 && bs.distinct.size == 16)
    assert(as.forall(a => a > (1L << 20)),
      s"small coefficient would preserve order on tiny hashes: $as")
    // products must not overflow a signed 64-bit long in either engine
    assert(as.forall(a => a.toDouble * (TextOps.P - 1) < Long.MaxValue))
    assert(bs.forall(b => b > 0 && b < TextOps.P))
  }

  test("property: containment dominates jaccard; subsets reach exactly 1") {
    // random word-sequence corpora: for EVERY emitted pair,
    // C = shared/min >= J = shared/union (set algebra: min <= union),
    // with equality iff one shingle set contains the other — and a
    // constructed prefix-subset pair must read exactly C = 1.0.
    val docGen = Gen.listOfN(4,
      Gen.listOfN(12, Gen.choose(1, 8).map(i => s"w$i")))
    check(Prop.forAll(docGen) { texts =>
      val df = texts.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val pairs = Dedup.containmentPairs(
        Dedup.shingleHashes(df, "doc_id", "text"), "doc_id")
        .collect()
      pairs.forall { r =>
        val c = r.getAs[Double]("containment")
        val j = r.getAs[Double]("jaccard")
        c >= j && c <= 1.0 + 1e-12 && j > 0.0
      }
    }, tests = 10)
    val subset = Seq(
      (1L, (1 to 25).map(i => s"s$i").mkString(" ")),
      (2L, (1 to 6).map(i => s"s$i").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(
      Dedup.shingleHashes(subset, "doc_id", "text"), "doc_id")
      .collect().head
    assert(r.getAs[Double]("containment") == 1.0 &&
      r.getAs[Double]("jaccard") < 1.0)
  }

  test("property: media-header parses invert an independent serializer " +
      "over the full field domains") {
    // Random field values serialized with java.nio (not the le_encode_*
    // path the queries use) must round-trip through every header-field
    // expression — including the signed/unsigned edges the fixed specs
    // can't sweep: BMP height is SIGNED i32 (top-down bitmaps), u16
    // fields cover the full 0..65535 range (getShort sign-extends if
    // masked wrong), PNG is big-endian. Interpreted eval per case (no
    // job), then one batched DataFrame pass cross-checks codegen.
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions._
    def wav(ch: Int, rate: Int, bits: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(36).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(ch.toShort).putInt(rate)
      b.putInt(0).putShort(0).putShort(bits.toShort)
      b.array()
    }
    def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(0).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(bpp.toShort)
      b.array()
    }
    def png(w: Int, h: Int, depth: Int, color: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(26).order(ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(w).putInt(h).put(depth.toByte).put(color.toByte)
      b.array()
    }
    def gif(ver: Char, w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      b.put(s"GIF8${ver}a".getBytes("US-ASCII"))
      b.putShort(w.toShort).putShort(h.toShort)
      b.put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    val u16 = Gen.choose(0, 65535)
    val u8 = Gen.choose(0, 255)
    val i32 = Gen.choose(Int.MinValue, Int.MaxValue)
    val pos31 = Gen.choose(1, Int.MaxValue)
    val wavGen = Gen.zip(u16, pos31, u16)
    val bmpGen = Gen.zip(i32, i32, u16)
    val pngGen = Gen.zip(pos31, pos31, u8, u8)
    val gifGen = Gen.zip(Gen.oneOf('7', '9'), u16, u16)
    check(Prop.forAll(wavGen, bmpGen, pngGen, gifGen) {
      case ((ch, rate, bits), (bw, bh, bpp), (pw, ph, depth, color),
        (gv, gw, gh)) =>
      WavChannels(Literal(wav(ch, rate, bits))).eval() == ch &&
      WavSampleRate(Literal(wav(ch, rate, bits))).eval() == rate &&
      WavBitsPerSample(Literal(wav(ch, rate, bits))).eval() == bits &&
      BmpWidth(Literal(bmp(bw, bh, bpp))).eval() == bw &&
      BmpHeight(Literal(bmp(bw, bh, bpp))).eval() == bh &&
      BmpBpp(Literal(bmp(bw, bh, bpp))).eval() == bpp &&
      PngWidth(Literal(png(pw, ph, depth, color))).eval() == pw &&
      PngHeight(Literal(png(pw, ph, depth, color))).eval() == ph &&
      PngBitDepth(Literal(png(pw, ph, depth, color))).eval() == depth &&
      PngColorType(Literal(png(pw, ph, depth, color))).eval() == color &&
      GifWidth(Literal(gif(gv, gw, gh))).eval() == gw &&
      GifHeight(Literal(gif(gv, gw, gh))).eval() == gh
    }, tests = 40)
    // codegen path over one generated batch must agree with interpreted
    val rng = new scala.util.Random(42)
    val rows = (1 to 50).map { _ =>
      (wav(rng.nextInt(65536), rng.nextInt(Int.MaxValue) + 1,
        rng.nextInt(65536)),
        bmp(rng.nextInt(), rng.nextInt(), rng.nextInt(65536)))
    }
    val got = rows.toDF("w", "b")
      .selectExpr("wav_channels(w) c", "wav_sample_rate(w) r",
        "wav_bits_per_sample(w) p", "bmp_width(b) x", "bmp_height(b) y",
        "bmp_bpp(b) z")
      .collect()
    rows.zip(got).foreach { case ((wb, bb), r) =>
      assert(r.getInt(0) == WavChannels(Literal(wb)).eval() &&
        r.getInt(1) == WavSampleRate(Literal(wb)).eval() &&
        r.getInt(2) == WavBitsPerSample(Literal(wb)).eval() &&
        r.getInt(3) == BmpWidth(Literal(bb)).eval() &&
        r.getInt(4) == BmpHeight(Literal(bb)).eval() &&
        r.getInt(5) == BmpBpp(Literal(bb)).eval())
    }
  }

  test("property: WAV chunk walk inverts random-layout RIFF files") {
    // Random metadata chunks (0-6, random ids/payload sizes incl. the
    // odd-size pad-byte case) before fmt: the bounded walk must land on
    // the fmt chunk wherever the layout put it — and must give up (NULL,
    // not a wrong read) when the layout exceeds its 8-chunk budget.
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions._
    def chunked(pre: Seq[(String, Array[Byte])], ch: Int, rate: Int,
        bits: Int): Array[Byte] = {
      val preLen =
        pre.map { case (_, d) => 8 + d.length + (d.length & 1) }.sum
      val total = 12 + preLen + 8 + 16
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      b.put("WAVE".getBytes("US-ASCII"))
      pre.foreach { case (id, d) =>
        b.put(id.getBytes("US-ASCII")).putInt(d.length).put(d)
        if ((d.length & 1) == 1) b.put(0.toByte)
      }
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(ch.toShort).putInt(rate)
      b.putInt(0).putShort(0).putShort(bits.toShort)
      b.array()
    }
    // lowercase-alpha ids can never collide with "fmt " (trailing space)
    val chunkGen = Gen.zip(
      Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString),
      Gen.choose(0, 20).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)).map(_.toArray)))
    val u16 = Gen.choose(0, 65535)
    val pos31 = Gen.choose(1, Int.MaxValue)
    check(Prop.forAll(Gen.choose(0, 6).flatMap(Gen.listOfN(_, chunkGen)),
      u16, pos31, u16) { (pre, ch, rate, bits) =>
      val b = chunked(pre, ch, rate, bits)
      WavChannels(Literal(b)).eval() == ch &&
      WavSampleRate(Literal(b)).eval() == rate &&
      WavBitsPerSample(Literal(b)).eval() == bits &&
      WavAudioFormat(Literal(b)).eval() == 1
    }, tests = 40)
    check(Prop.forAll(Gen.listOfN(9, chunkGen), u16, pos31, u16) {
      (pre, ch, rate, bits) =>
      WavChannels(Literal(chunked(pre, ch, rate, bits))).eval() == null
    }, tests = 10)
  }

  test("property: JPEG marker walk and MP4 box walk invert random layouts") {
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions._
    def jpeg(pre: Seq[(Int, Array[Byte])], sof: Int, prec: Int, h: Int,
        w: Int, nc: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(2 + pre.map(4 + _._2.length).sum + 10)
        .order(ByteOrder.BIG_ENDIAN)
      b.put(0xFF.toByte).put(0xD8.toByte)
      pre.foreach { case (m, d) =>
        b.put(0xFF.toByte).put(m.toByte)
          .putShort((2 + d.length).toShort).put(d)
      }
      b.put(0xFF.toByte).put(sof.toByte).putShort(8.toShort)
      b.put(prec.toByte).putShort(h.toShort).putShort(w.toShort)
        .put(nc.toByte)
      b.array()
    }
    def mp4(pads: Seq[Int], ts: Int, dur: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(24 + pads.map(8 + _).sum + 36)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(24).put("ftypisom".getBytes("US-ASCII"))
        .putInt(512).put("isomiso2".getBytes("US-ASCII"))
      pads.foreach { n =>
        b.putInt(8 + n).put("free".getBytes("US-ASCII"))
          .put(Array.fill[Byte](n)(0))
      }
      b.putInt(36).put("moov".getBytes("US-ASCII"))
      b.putInt(28).put("mvhd".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      b.array()
    }
    val u16 = Gen.choose(0, 65535)
    val u8 = Gen.choose(0, 255)
    // APPn/COM markers (never SOF/SOS), random payloads 0-20 bytes
    val segGen = Gen.zip(
      Gen.oneOf(Gen.choose(0xE0, 0xEF), Gen.const(0xFE)),
      Gen.choose(0, 20).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)).map(_.toArray)))
    val sofGen = Gen.oneOf(0xC0, 0xC1, 0xC2)
    check(Prop.forAll(Gen.choose(0, 8).flatMap(Gen.listOfN(_, segGen)),
      sofGen, u8, u16, u16, u8) { (pre, sof, prec, h, w, nc) =>
      val b = jpeg(pre, sof, prec, h, w, nc)
      JpegPrecision(Literal(b)).eval() == prec &&
      JpegHeight(Literal(b)).eval() == h &&
      JpegWidth(Literal(b)).eval() == w &&
      JpegComponents(Literal(b)).eval() == nc
    }, tests = 40)
    val pos31 = Gen.choose(1, Int.MaxValue)
    check(Prop.forAll(Gen.choose(0, 6).flatMap(
      Gen.listOfN(_, Gen.choose(0, 24))), pos31, pos31) { (pads, ts, dur) =>
      val b = mp4(pads, ts, dur)
      Mp4Timescale(Literal(b)).eval() == ts &&
      Mp4Duration(Literal(b)).eval() == dur
    }, tests = 40)
    // beyond-budget layouts must be NULL, not a wrong read
    check(Prop.forAll(Gen.listOfN(17, segGen), sofGen) { (pre, sof) =>
      JpegWidth(Literal(jpeg(pre, sof, 8, 1, 1, 3))).eval() == null
    }, tests = 10)
    check(Prop.forAll(Gen.listOfN(9, Gen.choose(0, 24)), pos31) {
      (pads, ts) =>
      Mp4Duration(Literal(mp4(pads, ts, 1))).eval() == null
    }, tests = 10)
  }

  test("property: round-8 walkers invert random layouts " +
      "(mvhd children, ID3 tags, TIFF IFDs, protobuf fields)") {
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions._
    // MP4: random non-mvhd children (0-3) before a v0 or v1 mvhd —
    // the round-8 child walk (budget 4 INCLUDING mvhd) must land on
    // it; 4+ preceding children push mvhd past the budget -> NULL
    def mp4k(kids: Seq[Int], ver: Int, ts: Long, dur: Long): Array[Byte] = {
      val mvhdSz = if (ver == 0) 28 else 40
      val kidLen = kids.map(8 + _).sum
      val b = ByteBuffer.allocate(24 + 8 + kidLen + mvhdSz)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(24).put("ftypisom".getBytes("US-ASCII"))
        .putInt(512).put("isomiso2".getBytes("US-ASCII"))
      b.putInt(8 + kidLen + mvhdSz).put("moov".getBytes("US-ASCII"))
      kids.foreach { n =>
        b.putInt(8 + n).put("udta".getBytes("US-ASCII"))
          .put(Array.fill[Byte](n)(1))
      }
      b.putInt(mvhdSz).put("mvhd".getBytes("US-ASCII"))
        .putInt(ver << 24)
      if (ver == 0)
        b.putInt(0).putInt(0).putInt(ts.toInt).putInt(dur.toInt)
      else b.putLong(0L).putLong(0L).putInt(ts.toInt).putLong(dur)
      b.array()
    }
    val tsGen = Gen.choose(1L, Int.MaxValue.toLong)
    val kidsGen = Gen.choose(0, 3).flatMap(
      Gen.listOfN(_, Gen.choose(0, 16)))
    check(Prop.forAll(kidsGen, Gen.oneOf(0, 1), tsGen, tsGen) {
      (kids, ver, ts, dur) =>
      val b = mp4k(kids, ver, ts, dur)
      Mp4Timescale64(Literal(b)).eval() == ts &&
      Mp4Duration64(Literal(b)).eval() == dur
    }, tests = 40)
    check(Prop.forAll(Gen.listOfN(4, Gen.choose(0, 16)), tsGen) {
      (kids, ts) =>
      Mp4Duration64(Literal(mp4k(kids, 0, ts, 1L))).eval() == null
    }, tests = 10)
    // MP3: random syncsafe tag size (incl. > 2^14, exercising three
    // size bytes) and footer flag — the frame must be found past it
    def mp3t(tagSz: Int, footer: Boolean, bIdx: Int,
        sIdx: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(10 + tagSz + (if (footer) 10 else 0) + 4)
      b.put("ID3".getBytes("US-ASCII")).put(4.toByte).put(0.toByte)
        .put((if (footer) 0x10 else 0).toByte)
      b.put(((tagSz >> 21) & 0x7F).toByte)
        .put(((tagSz >> 14) & 0x7F).toByte)
        .put(((tagSz >> 7) & 0x7F).toByte).put((tagSz & 0x7F).toByte)
      b.put(Array.fill[Byte](tagSz + (if (footer) 10 else 0))(0x6A))
      b.put(0xFF.toByte).put(0xFB.toByte)
        .put(((bIdx << 4) | (sIdx << 2)).toByte).put(0.toByte)
      b.array()
    }
    val Bitrates = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320)
    val Rates = Array(44100, 48000, 32000)
    check(Prop.forAll(Gen.choose(0, 40000), Gen.oneOf(true, false),
      Gen.choose(1, 14), Gen.choose(0, 2)) { (sz, foot, bi, si) =>
      val b = mp3t(sz, foot, bi, si)
      Mp3BitrateKbps(Literal(b)).eval() == Bitrates(bi) &&
      Mp3SampleRate(Literal(b)).eval() == Rates(si)
    }, tests = 40)
    // TIFF: random endianness, SHORT/LONG type, 0-3 padding entries
    def tiffG(le: Boolean, pads: Int, typ: Int, w: Long,
        h: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(10 + 12 * (pads + 2) + 4).order(
        if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.put((if (le) "II" else "MM").getBytes("US-ASCII"))
        .putShort(42.toShort).putInt(8)
      b.putShort((pads + 2).toShort)
      (0 until pads).foreach { i =>
        b.putShort((100 + i).toShort).putShort(4.toShort).putInt(1)
          .putInt(0)
      }
      Seq(256 -> w, 257 -> h).foreach { case (tag, v) =>
        b.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
        if (typ == 3) { b.putShort(v.toShort); b.putShort(0.toShort) }
        else b.putInt(v.toInt)
      }
      b.putInt(0)
      b.array()
    }
    val dimGen = Gen.zip(Gen.oneOf(3, 4), Gen.oneOf(true, false),
      Gen.choose(0, 3))
    check(Prop.forAll(dimGen, Gen.choose(1L, 65535L),
      Gen.choose(1L, 65535L)) { case ((typ, le, pads), w, h) =>
      val b = tiffG(le, pads, typ, w, h)
      TiffWidth(Literal(b)).eval() == w.toInt &&
      TiffHeight(Literal(b)).eval() == h.toInt
    }, tests = 40)
    // protobuf: a random permutation of varint/len/fixed fields — the
    // scan must find the target varint and the target len field
    // wherever the order put them
    def vint(v: Long): Array[Byte] = {
      var x = v; val b = scala.collection.mutable.ArrayBuffer[Byte]()
      while (x >= 0x80) { b += ((x & 0x7F) | 0x80).toByte; x >>= 7 }
      b += x.toByte; b.toArray
    }
    def tag(fld: Int, wt: Int) = vint((fld << 3 | wt).toLong)
    check(Prop.forAll(Gen.choose(0L, 1L << 40), Gen.choose(0, 30),
      Gen.choose(0L, 1000000L)) { (idVal, payLen, extra) =>
      val f1 = tag(1, 0) ++ vint(idVal)
      val f2 = tag(2, 2) ++ vint(payLen.toLong) ++
        Array.fill[Byte](payLen)(0x78)
      val f9 = tag(9, 0) ++ vint(extra)
      val fx = tag(4, 1) ++ Array.fill[Byte](8)(0x22) // skipped fixed64
      // three deterministic-but-varied orders driven by the inputs
      val msg = ((idVal + payLen + extra) % 3) match {
        case 0 => f1 ++ f2 ++ f9 ++ fx
        case 1 => fx ++ f9 ++ f2 ++ f1
        case _ => f2 ++ fx ++ f1 ++ f9
      }
      PbVarintField(Literal(msg), Literal(1)).eval() == idVal &&
      PbLenField(Literal(msg), Literal(2)).eval() == payLen.toLong &&
      PbVarintField(Literal(msg), Literal(9)).eval() == extra
    }, tests = 40)
  }

  test("property: archive walks invert random tar and zip layouts") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{TarWalk, ZipFirstName, ZipWalk}
    // independent serializers (octal by hand; LE via ByteBuffer) —
    // NOT the query-side builders, so a shared bug can't self-verify
    def tarOf(members: List[(String, Int)]): Array[Byte] = {
      val blocks = members.map { case (name, size) =>
        val h = new Array[Byte](512)
        name.getBytes.copyToArray(h, 0)
        java.lang.Long.toOctalString(size.toLong).reverse.padTo(11, '0')
          .reverse.getBytes.copyToArray(h, 124)
        "ustar".getBytes.copyToArray(h, 257)
        h ++ new Array[Byte](((size + 511) / 512) * 512)
      }
      (blocks :+ new Array[Byte](1024)).reduce(_ ++ _)
    }
    val memGen = Gen.listOfN(3, Gen.zip(
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
      Gen.chooseNum(0, 1500)))
      .flatMap(ms => Gen.chooseNum(1, 3).map(k => ms.take(k)))
    check(Prop.forAll(memGen) { ms =>
      val a = tarOf(ms)
      val w = TarWalk.walk(a)
      val names = TarWalk.memberNames(a).map(_.toString).toList
      w(0) == ms.length &&
        w(1) == ms.map(_._2.toLong).sum &&
        names == ms.map(_._1) &&
        // boundary truncation = clean EOF with the prefix's members
        (ms.length < 2 || {
          val cut = 512 + ((ms.head._2 + 511) / 512) * 512
          TarWalk.walk(a.take(cut))(0) == 1
        }) &&
        // mid-data truncation is corrupt, not a short read
        (ms.head._2 < 2 || TarWalk.walk(a.take(513)) == null)
    }, tests = 40)
    def zipOf(entries: List[(String, Int, Int)],
        flag3: Boolean): Array[Byte] = {
      val parts = entries.map { case (name, extraLen, size) =>
        val n = name.getBytes
        val b = java.nio.ByteBuffer.allocate(30 + n.length + extraLen + size)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(0x04034B50).putShort(20)
          .putShort(if (flag3) 8 else 0).putShort(0)
        b.putShort(0).putShort(0).putInt(0)
        b.putInt(size).putInt(size)
        b.putShort(n.length.toShort).putShort(extraLen.toShort)
        b.put(n).put(new Array[Byte](extraLen + size))
        b.array()
      }
      val eocd = java.nio.ByteBuffer.allocate(22)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x06054B50).array()
      (parts :+ eocd).reduce(_ ++ _)
    }
    val entGen = Gen.listOfN(3, Gen.zip(
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
      Gen.chooseNum(0, 8), Gen.chooseNum(0, 300)))
      .flatMap(es => Gen.chooseNum(1, 3).map(k => es.take(k)))
    check(Prop.forAll(entGen) { es =>
      val ok = zipOf(es, flag3 = false)
      val streaming = zipOf(es, flag3 = true)
      val w = ZipWalk.walk(ok)
      w(0) == es.length &&
        w(1) == es.map(_._3.toLong).sum &&
        ZipFirstName(Literal(ok)).eval().toString == es.head._1 &&
        ZipWalk.walk(streaming) == null
    }, tests = 40)
  }
}
