package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Near-duplicate detection operators: MinHash+LSH and SimHash.
  * LLM-pipeline surface (BASELINE.json); nothing comparable exists in the
  * reference. Both are built as single-pass hash aggregates + equi-joins
  * so Catalyst/AQE handle them like any groupBy/join at 100 TB:
  *
  *   - signatures: ONE hash aggregate producing K min-columns (map-side
  *     partial min ⇒ shuffle carries ≤ one row per (doc, partition)).
  *   - LSH banding: explode docs × B bands (B small, e.g. 4) and
  *     equi-join on (band index, band key) — candidate generation is a
  *     shuffle join on a short string key, never an all-pairs product.
  *   - verification joins candidates back to signatures (broadcastable
  *     when the candidate set is small; sort-merge otherwise).
  *
  * Exact-dup dedup is a plain `groupBy(md5(text))` — see q32.
  */
object Dedup {

  /** Distinct word-n-gram shingle hashes per id: (idCol, carry..., h)
    * with h in [0, P). The canonical input to jaccardPairs /
    * minhashSignatures. `carry` columns (e.g. `source` for per-source
    * boilerplate detection, q180) ride the explode for free — carrying a
    * row-local attribute through the map stage beats re-attaching it with
    * a corpus-sized join on idCol afterwards. */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, carry: Seq[String] = Nil): DataFrame = {
    // tokenize into a materialized column FIRST: `shingles` references its
    // input several times (guard, sequence bound, per-index slice), and an
    // inlined tokens(textCol) would re-run the regex split per reference —
    // measured 7-10x slower on the shingle-join queries
    // NO outer .distinct(): per-doc dedup already happened at STRING
    // level (array_distinct), so an (id, h) duplicate can only be an
    // md5-mod hash collision inside one document — and the DuckDB twin
    // (TextOps.oracleSh3Cte) computes the identical hash, so any such
    // duplicate appears in BOTH engines and parity holds. The distinct
    // was a full extra shuffle of the family's hottest table (9+ queries
    // pay it), measured ~15-20% of the shingle steady state.
    val keys = col(idCol) +: carry.map(col)
    df.select(keys :+ TextOps.tokens(col(textCol)).as("__tk"): _*)
      .select(keys :+
        explode(array_distinct(TextOps.shingles(col("__tk"), n))).as("__sh"): _*)
      .select(keys :+ TextOps.hashMod(col("__sh")).as("h"): _*)
  }

  /** Distinct character-n-gram hashes per id (the pg_trgm shape): char
    * n-grams distinguish identifier-like strings whose word shingles are
    * useless (every "Supplier#..." tokenizes identically). Same (id, h)
    * contract as `shingleHashes`, so `jaccardPairs` composes directly.
    * The lambda captures only the raw string column — a per-element
    * re-read of a row field, not a recomputed expression (cf. the
    * shingles lambda-capture note). */
  def charNGramHashes(df: DataFrame, idCol: String, strCol: String,
      n: Int = 3): DataFrame =
    // no outer .distinct() — same argument as shingleHashes: the grams
    // are string-deduped per row, residual hash collisions are
    // engine-identical (q92's oracle mirrors this)
    df.select(col(idCol),
        explode(array_distinct(expr(
          s"""CASE WHEN length($strCol) >= $n
             |THEN transform(sequence(1, length($strCol) - ${n - 1}),
             |  i -> substring($strCol, i, $n))
             |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)))
          .as("__g"))
      .select(col(idCol), TextOps.hashMod(col("__g")).as("h"))

  /** Hot-shingle document-frequency cap. The shared-shingle join fans
    * out quadratically in a shingle's document frequency, so a single
    * boilerplate n-gram appearing in 10^6 documents would put 10^12 rows
    * through the shuffle. Ubiquitous shingles carry no near-dup signal;
    * dropping them bounds the per-key fanout at dfCap² while leaving
    * discriminative shingles untouched. 256 is far above the fixtures'
    * max df (25) — results are identical there — and far below where the
    * fanout hurts. */
  val DefaultDfCap: Int = 256

  /** `sh` minus hashes whose document frequency exceeds `cap` (<= 0
    * disables).
    *
    * Shape: stage the (id, h) table once, aggregate document frequencies
    * per h (map-side partial count — a few bytes per DISTINCT shingle
    * cross the wire), and semi-join the rare-shingle keys back. NOT a
    * `count() OVER (PARTITION BY h)` window: the window form hashes the
    * full shingle table on h and SORTS each partition — and a hot
    * shingle (the exact pathology the cap exists for: one boilerplate
    * n-gram in 10^6 documents) puts its entire group into ONE window
    * partition, a single-task straggler at corpus scale. The aggregate
    * form collapses hot keys map-side; the semi-join is a plain hash
    * join, no sort anywhere. Staging (not a self-reference) keeps the
    * expensive tokenize→shingle→hash→distinct pipeline from running
    * twice (once per join side — Catalyst has no ReusedExchange across
    * self-join sides). */
  def dfCapped(sh: DataFrame, cap: Int): DataFrame =
    if (cap > 0) {
      val staged = Staging.stage(sh, eager = false)
      val rare = staged.groupBy(col("h"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= cap)
        .select(col("h"))
      staged.join(rare, Seq("h"), "left_semi")
    } else sh

  /** Exact Jaccard pairs (id_a < id_b) from per-id shingle-hash sets:
    * one shared-shingle equi-join + set-size joins. Columns:
    * id_a, id_b, shared, n_a, n_b, jaccard. Callers threshold/rename.
    *
    * Shingles with document frequency > dfCap are dropped FIRST (set
    * sizes and jaccard are computed over the capped shingle space, so
    * the semantics stay internally consistent); dfCap <= 0 disables the
    * cap. Oracle twin: TextOps.oracleShCappedCte. */
  def jaccardPairs(sh: DataFrame, idCol: String,
      dfCap: Int = DefaultDfCap): DataFrame =
    jaccardPairsFromCounted(countedShingles(sh, idCol, dfCap), idCol)

  /** (id, h, __n) shingle table over the df-capped shingle space:
    * `__n` = per-id distinct-shingle count. Callers that ALSO need the
    * shingle set for other stages (e.g. MinHash signatures, q103) build
    * this once and share it, instead of letting jaccardPairs re-derive
    * it internally.
    *
    * ONE staged leaf carries the whole chain: `sh` — the expensive
    * tokenize→shingle→hash→distinct pipeline — is staged
    * (Staging.stage: local checkpoint by default, reliable checkpoint
    * when spark.graft.checkpointDir is set — executor-loss safety for
    * cluster runs), and everything above it stays LAZY: the df-cap
    * semi-join (see [[dfCapped]] for why an aggregate + semi-join, never
    * an h-partitioned window), the per-id size aggregate (map-side
    * collapsed to one row per id), and the size re-attach join (AQE
    * broadcasts it when small). Consumers referencing the result more
    * than once (the pair self-join's two sides) re-run only these cheap
    * hash joins over staged blocks — never the tokenize pipeline.
    * A measured A/B rejected checkpointing the capped table a second
    * time (two checkpoint writes cost more than the lazy tail's repeat
    * scans: family bench total 32.8 -> 37.0 s).
    *
    * Staging rather than persist(): persist registers the plan in the
    * session CacheManager, and every LATER query then pays
    * plan-canonicalization against it during lookup — measured seconds
    * of driver time on the wide-expression queries. The staged frame
    * stays private to this DataFrame; long-lived sessions release it
    * via Staging.sweep. */
  def countedShingles(sh: DataFrame, idCol: String,
      cap: Int = DefaultDfCap): DataFrame = {
    val leaf = Staging.stage(sh, eager = false)
    val capped =
      if (cap > 0) {
        val rare = leaf.groupBy(col("h"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
          .select(col("h"))
        leaf.join(rare, Seq("h"), "left_semi")
      } else leaf
    capped.join(
      capped.groupBy(col(idCol)).agg(count(lit(1)).as("__n")), idCol)
  }

  /** Asymmetric near-duplicate pairs by Broder containment
    * C(A,B) = shared / min(|A|, |B|), emitted beside the symmetric
    * Jaccard. Containment catches subset/quote duplication — a short
    * document wholly embedded in a longer one keeps C = 1 while
    * J = shared/(|A|+|B|-shared) falls toward 0 as the length ratio
    * grows, so a Jaccard-only dedup pass ships the duplicated text
    * anyway. Cost and scale shape are exactly [[jaccardPairs]] (same
    * bounded shared-shingle equi-join; only the final per-pair
    * expression differs). Callers threshold on `containment`. */
  def containmentPairs(sh: DataFrame, idCol: String,
      dfCap: Int = DefaultDfCap): DataFrame =
    jaccardPairs(sh, idCol, dfCap)
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")))

  /** Per-group boilerplate shingles over an (idCol, groupCol, h) shingle
    * table (build with `shingleHashes(carry = Seq(groupCol))` so the
    * group attribute rides the explode — no corpus-sized id re-join):
    * hashes present in at least `minPermille`/1000 of the group's
    * documents AND at least `minDf` documents absolutely. Returns
    * (groupCol, h, df, n_docs, df_ratio).
    *
    * df counts DISTINCT ids — a rare in-document md5-mod hash collision
    * (two distinct shingle strings, one h) must not double-count the
    * document or push df_ratio past 1.0. The ratio floor is INTEGER
    * arithmetic (df·1000 ≥ n_docs·minPermille): `n_docs * 0.07` style
    * double math drops exact-boundary shingles on FP representation.
    * The stream is deliberately UNCAPPED (the near-dup df-cap exists to
    * drop hot shingles as noise; here they are the signal), staged once
    * (both aggregates below would otherwise re-run the tokenize→explode
    * pipeline — no ReusedExchange across join sides), and the
    * one-row-per-group totals broadcast into the final filter join.
    * Long-lived sessions release the staged blocks via Staging.sweep. */
  def boilerplateShingles(sh: DataFrame, idCol: String, groupCol: String,
      minPermille: Long = 100, minDf: Long = 3): DataFrame = {
    val leaf = Staging.stage(sh, eager = false)
    val nd = leaf.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    leaf.groupBy(col(groupCol), col("h"))
      .agg(countDistinct(col(idCol)).as("df"))
      .join(broadcast(nd), groupCol)
      .filter(col("df") >= minDf &&
        col("df") * 1000 >= col("n_docs") * minPermille)
      .select(col(groupCol), col("h"), col("df"), col("n_docs"),
        (col("df").cast("double") / col("n_docs")).as("df_ratio"))
  }

  /** The pair join/aggregate half of [[jaccardPairs]], over a
    * [[countedShingles]] table. */
  def jaccardPairsFromCounted(withN: DataFrame, idCol: String): DataFrame = {
    val a = withN.select(col(idCol).as("id_a"), col("h"),
      col("__n").as("n_a"))
    val b = withN.select(col(idCol).as("id_b"), col("h").as("__h2"),
      col("__n").as("n_b"))
    a.join(b, col("h") === col("__h2") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(col("id_a"), col("id_b"), col("shared"), col("n_a"), col("n_b"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared"))).as("jaccard"))
  }

  /** MinHash signature per id: K columns m0..m{K-1}, one hash aggregate.
    * Input: (idCol, shingle-hash column `h` with h in [0, P)).
    *
    * The result is staged lazily (Staging.stage): every LSH consumer
    * reads the signature table ≥3 times (banding + both verification-join
    * sides), each read would re-run the upstream shingle pipeline (no
    * ReusedExchange across self-join sides), and at one short row per
    * document the signature table is the cheapest frame in the whole
    * pipeline to stage. (Checkpoint, not persist — see jaccardPairs.) */
  def minhashSignatures(shingleHashes: DataFrame, idCol: String, h: String,
      k: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min((col(h) * aParam(i) + bParam(i)) % P).as(s"m$i"))
    Staging.stage(
      shingleHashes.groupBy(col(idCol)).agg(mins.head, mins.tail: _*),
      eager = false)
  }

  /** One row per (id, band): `band_idx` plus the band's R min-hash values
    * packed into a joinable `band_key` string. The LSH blocking frame —
    * a band-key equi-join over it yields candidate pairs (all-pairs
    * within a bucket) or, joined against a second corpus' bands, the
    * incremental-dedup candidate set (q156).
    */
  def lshBands(sig: DataFrame, idCol: String, bands: Int,
      rows: Int): DataFrame = {
    require(bands > 0 && rows > 0,
      s"bands ($bands) and rows ($rows) must be positive")
    require(sig.columns.contains(s"m${bands * rows - 1}"),
      s"signature needs ${bands * rows} min-hash columns (bands*rows)")
    sig.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          concat_ws(":", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)
            .as("band_key"))
      }: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_key"))
  }

  /** MinHash LSH band rows computed ROW-LOCALLY — no explode-groupBy,
    * no shuffle, no state: tokens → distinct shingles → per-shingle
    * hashes as an ARRAY column, then each of the K min-hashes is an
    * `array_min(transform(...))` over it. Semantically identical to
    * `lshBands(minhashSignatures(shingleHashes(df)))` (min over the
    * same shingle-hash multiset, same (a,b,P) family, same band_key
    * packing — q194's oracle pins the equality), but the plan is a pure
    * per-row map + band explode, which makes it
    *
    *  (a) legal on a STREAMING frame in append mode (a groupBy minhash
    *      is a stateful aggregation; this is a stateless projection —
    *      the micro-batch ingest-dedup path), and
    *  (b) the cheaper batch plan when the shingle table isn't needed
    *      downstream: the exploded pipeline shuffles one row per
    *      (doc, shingle); this shuffles nothing.
    *
    * Intermediates are materialized one per select so each appears only
    * in ARGUMENT position of the next higher-order function (the
    * TextOps.shingles lambda-capture rule); `__hs` is referenced K
    * times, which keeps CollapseProject from inlining the md5 chain
    * into every min. Docs with no shingles (< n tokens) produce no
    * band rows, matching the exploded pipeline where they vanish at the
    * explode. */
  def lshBandsStateless(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rows: Int, n: Int = 3,
      carry: Seq[String] = Nil): DataFrame = {
    require(bands > 0 && rows > 0 && bands * rows == k,
      s"k ($k) must equal bands*rows (${bands}x$rows)")
    val keys = col(idCol) +: carry.map(col)
    df.select(keys :+ TextOps.tokens(col(textCol)).as("__tk"): _*)
      .select(keys :+
        array_distinct(TextOps.shingles(col("__tk"), n)).as("__sg"): _*)
      .select(keys :+
        transform(col("__sg"), s => TextOps.hashMod(s)).as("__hs"): _*)
      .filter(size(col("__hs")) >= 1)
      .select(keys :+ array((0 until k).map(i =>
        array_min(transform(col("__hs"),
          h => (h * aParam(i) + bParam(i)) % P))): _*).as("__mh"): _*)
      .select(keys :+ explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          concat_ws(":", (0 until rows).map(r =>
            col("__mh").getItem(b * rows + r)): _*).as("band_key"))
      }: _*)).as("band"): _*)
      .select(keys ++ Seq(col("band.band_idx"), col("band.band_key")): _*)
  }

  /** LSH candidate pairs (idA < idB) from signatures: B bands of R rows
    * (K = B·R); a pair is a candidate iff some band's R values all match.
    */
  def lshCandidatePairs(sig: DataFrame, idCol: String, bands: Int,
      rows: Int): DataFrame = {
    val banded = lshBands(sig, idCol, bands, rows)
    val a = banded.select(col(idCol).as("ida"), col("band_idx"), col("band_key"))
    val b = banded.select(col(idCol).as("idb"), col("band_idx").as("bi2"),
      col("band_key").as("bk2"))
    a.join(b, col("band_idx") === col("bi2") && col("band_key") === col("bk2")
        && col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
  }

  /** Deletion-neighborhood variants (the SymSpell blocking key): every
    * string reachable from `strCol` by deleting up to `d` characters
    * (d <= 2), one row per (id, distinct variant). If lev(A,B) <= d then
    * deleting the edited positions from each side reaches a common
    * variant, so candidate generation for an edit-distance join is an
    * EQUI-JOIN on the variant — complete for Levenshtein (substitutions
    * AND indels), with block sizes bounded by local string similarity
    * rather than corpus size (positional-segment and rare-q-gram
    * blocking both degenerate to all-pairs on constant-prefix
    * identifier corpora). Per-string variant count is O(L^d); assumes
    * non-empty strings. */
  def deletionVariants(df: DataFrame, idCol: String, strCol: String,
      d: Int = 2): DataFrame = {
    require(d == 1 || d == 2, s"d ($d) must be 1 or 2")
    val s = strCol
    // tail slices take length($s) as their length bound (never a fixed
    // constant — a constant would silently truncate long strings and
    // merge variants that differ beyond it)
    val del1 =
      s"""transform(sequence(1, length($s)), i ->
         |  concat(substring($s, 1, i-1), substring($s, i+1, length($s))))"""
        .stripMargin
    val del2 =
      s"""flatten(transform(sequence(1, length($s) - 1), i ->
         |  transform(sequence(i+1, length($s)), j ->
         |    concat(substring($s, 1, i-1), substring($s, i+1, j-i-1),
         |           substring($s, j+1, length($s))))))""".stripMargin
    val variants =
      if (d == 1) s"concat(array($s), $del1)"
      else s"concat(array($s), $del1, $del2)"
    df.select(col(idCol), col(strCol),
      explode(array_distinct(expr(variants))).as("var"))
  }

  /** Edit-distance pairs (id_a < id_b, lev <= maxDist) via
    * deletion-variant blocking. Columns: id_a, id_b, s_a, s_b, dist. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2): DataFrame = {
    val v = deletionVariants(df, idCol, strCol, maxDist)
    val a = v.select(col(idCol).as("id_a"), col(strCol).as("s_a"), col("var"))
    val b = v.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      col("var").as("var2"))
    a.join(b, col("var") === col("var2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b")).distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
  }

  /** Banded SRP-LSH candidate pairs (id_a < id_b) over a double-array
    * vector column: any-band bucket collision (bands × planesPerBand
    * hyperplanes; more bands → higher recall). The cosine analog of
    * `lshCandidatePairs`. */
  def srpCandidatePairs(vecs: DataFrame, idCol: String, vecCol: String,
      bands: Int, planesPerBand: Int): DataFrame = {
    // NOT staged, deliberately: a measured A/B (round 4) put the staged
    // variant at 8x the runtime — the banding is pure per-row codegen'd
    // arithmetic over a columnar scan, and cutting the plan here trades
    // "compute the bands twice, fully pipelined" for "materialize +
    // row-serialize the banded table", which loses badly. Staging pays
    // off only above an expensive SHUFFLE boundary (cf. jaccardPairs'
    // windowed shingle pipeline).
    val banded = vecs.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("bi"),
          Vectors.srpBandBucket(col(vecCol), b, planesPerBand).as("bv"))
      }: _*)).as("s"))
      .select(col(idCol), col("s.bi").as("bi"), col("s.bv").as("bv"))
    val a = banded.select(col(idCol).as("id_a"), col("bi"), col("bv"))
    val b = banded.select(col(idCol).as("id_b"), col("bi").as("bi2"),
      col("bv").as("bv2"))
    a.join(b, col("bi") === col("bi2") && col("bv") === col("bv2") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Embedding-cosine near-duplicate pairs: banded SRP-LSH candidates,
    * exact cosine only within candidates (vectors re-joined by id, never
    * carried through the band explode), thresholded. Columns:
    * id_a, id_b, cosine. */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      bands: Int, planesPerBand: Int, threshold: Double): DataFrame = {
    // not staged — same A/B verdict as srpCandidatePairs: per-row norm
    // arithmetic recomputed per join side beats materializing the
    // vectors out of the columnar scan
    val n = vecs.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__nr", Vectors.norm(col("__v")))
    val cand = srpCandidatePairs(vecs, idCol, vecCol, bands, planesPerBand)
    cand
      .join(n.select(col(idCol).as("id_a"), col("__v").as("__va"),
        col("__nr").as("__na")), "id_a")
      .join(n.select(col(idCol).as("id_b"), col("__v").as("__vb"),
        col("__nr").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Vectors.cosine(Vectors.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")).as("cosine"))
      .filter(col("cosine") > threshold)
  }

  /** 31-bit SimHash from a set of element hashes (h in [0, 2^31)):
    * bit j of the result is set iff more element hashes have bit j set
    * than clear. One hash aggregate with 31 sum columns, then a single
    * projection folds them into the fingerprint. */
  def simhash(elemHashes: DataFrame, idCol: String, h: String): DataFrame = {
    val bitSums = (0 until 31).map(j =>
      sum(when(shiftright(col(h), j) % 2 === 1, 1)
        .otherwise(-1)).as(s"s$j"))
    val agg = elemHashes.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 31).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), fp.as("simhash"))
  }
}
