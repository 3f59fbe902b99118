package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators._

/** User-facing facade: the operator library as DataFrame syntax.
  *
  * {{{
  * import graft.Graft._
  * trades.asofBackward(quotes, Seq("sym" -> "sym"), "ts", "qts",
  *   carry = Seq("bid" -> "bid", "ask" -> "ask"))
  * docs.nearDupPairs(idCol = "doc_id", textCol = "text", threshold = 0.8)
  * events.sessionized(Seq("user_id"), "ms", gapMs = 30 * 60 * 1000L)
  * }}}
  */
object Graft {

  /** Release every staged block in the session — call between logical
    * jobs in a long-lived session (see operators.Staging.sweep). */
  def sweep(spark: org.apache.spark.sql.SparkSession): Unit =
    Staging.sweep(spark)

  /** Create (or replace) a named in-process ring-buffer bus readable via
    * `spark.readStream.format("graft-ring").option("ring", name)` — see
    * sources.RingSource for the contract (power-of-two capacity,
    * reject-new vs drop-oldest overflow, observable drop counter). */
  def createRing(name: String, schema: org.apache.spark.sql.types.StructType,
      capacity: Int, dropOldest: Boolean = false): graft.sources.GraftRing =
    graft.sources.RingRegistry.create(name, schema, capacity, dropOldest)

  /** Read a registered ring as a micro-batch stream. */
  def ringStream(spark: org.apache.spark.sql.SparkSession,
      name: String): DataFrame =
    graft.streaming.Streams.ringStream(spark, name)

  implicit class GraftDataFrame(private val df: DataFrame) extends AnyVal {

    /** Backward as-of join (see operators.AsOfJoin). */
    def asofBackward(right: DataFrame, keys: Seq[(String, String)],
        leftTime: String, rightTime: String,
        carry: Seq[(String, String)],
        rightTieBreak: Seq[String] = Nil): DataFrame =
      AsOfJoin.backward(df, right, keys, leftTime, rightTime, carry,
        rightTieBreak)

    /** Nearest as-of join: closest right row on either side, ties to the
      * past match; appends carry columns + `asof_gap`
      * (see operators.AsOfJoin.nearest). */
    def asofNearest(right: DataFrame, keys: Seq[(String, String)],
        leftTime: String, rightTime: String,
        carry: Seq[(String, String)],
        rightTieBreak: Seq[String] = Nil): DataFrame =
      AsOfJoin.nearest(df, right, keys, leftTime, rightTime, carry,
        rightTieBreak)

    /** Backward as-of join through the NATIVE plan node
      * (plans.AsOfJoinPlan → AsOfJoinExec: co-partitioned sorted merge,
      * O(1) state; see operators.NativeAsOf). Same contract as
      * `asofBackward`; time columns must be LongType. */
    def asofBackwardNative(right: DataFrame, keys: Seq[(String, String)],
        leftTime: String, rightTime: String,
        carry: Seq[(String, String)],
        rightTieBreak: Seq[String] = Nil): DataFrame =
      NativeAsOf.backward(df, right, keys, leftTime, rightTime, carry,
        rightTieBreak)

    /** Bucketed interval join (see operators.RangeJoin). */
    def intervalJoin(right: DataFrame, leftKey: String, rightKey: String,
        leftTimeMs: String, rightTimeMs: String,
        beforeMs: Long, afterMs: Long, bucketMs: Long): DataFrame =
      RangeJoin.intervalJoin(df, right, leftKey, rightKey, leftTimeMs,
        rightTimeMs, beforeMs, afterMs, bucketMs)

    /** Gap-based session ids (see operators.Sessionize). */
    def sessionized(keys: Seq[String], timeMs: String, gapMs: Long,
        tieBreak: Seq[String] = Nil): DataFrame =
      Sessionize.byGap(df, keys, timeMs, gapMs, tieBreak)

    /** Salted skew join (see operators.SkewJoin). */
    def saltedJoin(small: DataFrame, largeKey: String, smallKey: String,
        salts: Int): DataFrame =
      SkewJoin.saltedJoin(df, small, largeKey, smallKey, salts)

    /** Exact dedup: one surviving row id per identical `textCol`. */
    def exactDedup(idCol: String, textCol: String): DataFrame =
      df.groupBy(md5(col(textCol)).as("content_hash"))
        .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

    /** Distinct word-{n}-gram shingle hashes per id — input to the
      * near-dup operators (delegates to operators.Dedup, the single
      * source of truth). */
    def shingleHashes(idCol: String, textCol: String, n: Int = 3)
        : DataFrame =
      Dedup.shingleHashes(df, idCol, textCol, n)

    /** n-gram Jaccard near-duplicate pairs (idA < idB) at or above
      * `threshold`. */
    def nearDupPairs(idCol: String, textCol: String,
        threshold: Double = 0.8, n: Int = 3): DataFrame =
      Dedup.jaccardPairs(Dedup.shingleHashes(df, idCol, textCol, n), idCol)
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))

    /** Asymmetric containment near-dup pairs (idA < idB) at or above
      * `threshold` on Broder containment C = shared/min(|A|,|B|) —
      * catches subset/quote duplication (a short doc embedded in a long
      * one has C = 1 while Jaccard → 0 as the length ratio grows).
      * Same bounded join as nearDupPairs; q178. */
    def containmentPairs(idCol: String, textCol: String,
        threshold: Double = 0.8, n: Int = 3): DataFrame =
      Dedup.containmentPairs(
          Dedup.shingleHashes(df, idCol, textCol, n), idCol)
        .filter(col("containment") >= threshold)
        .select(col("id_a"), col("id_b"), col("containment"), col("jaccard"))

    /** Per-group boilerplate shingles: word-{n}-gram hashes present in
      * at least `minPermille`/1000 of a group's documents AND at least
      * `minDf` documents absolutely — site templates, headers/footers.
      * Delegates to operators.Dedup.boilerplateShingles (uncapped
      * staged stream, distinct-document counts, integer ratio floor);
      * `groupCol` is carried through the explode, so nothing re-joins
      * on the document id. Returns (groupCol, h, df, n_docs,
      * df_ratio); q180. Long-lived sessions release the staged blocks
      * via `Graft.sweep`. */
    def boilerplateShingles(idCol: String, textCol: String,
        groupCol: String, minPermille: Long = 100, minDf: Long = 3,
        n: Int = 3): DataFrame =
      Dedup.boilerplateShingles(
        Dedup.shingleHashes(df, idCol, textCol, n, carry = Seq(groupCol)),
        idCol, groupCol, minPermille, minDf)

    /** MinHash+LSH candidate pairs (see operators.Dedup). */
    def minhashCandidates(idCol: String, textCol: String,
        k: Int = 16, bands: Int = 4): DataFrame = {
      require(bands > 0 && k % bands == 0,
        s"k ($k) must be a positive multiple of bands ($bands)")
      val sig = Dedup.minhashSignatures(
        Dedup.shingleHashes(df, idCol, textCol), idCol, "h", k)
      Dedup.lshCandidatePairs(sig, idCol, bands, k / bands)
    }

    /** Character-n-gram (pg_trgm-style) Jaccard pairs at or above
      * `threshold` — for identifier-like strings whose word shingles
      * are degenerate. df-capped shared-gram equi-join, never
      * all-pairs (see operators.Dedup.charNGramHashes). */
    def charNGramPairs(idCol: String, strCol: String,
        threshold: Double = 0.5, n: Int = 3,
        dfCap: Int = 16): DataFrame =
      Dedup.jaccardPairs(Dedup.charNGramHashes(df, idCol, strCol, n),
          idCol, dfCap)
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))

    /** Duplicate clusters over the near-dup pair graph: (id, component)
      * with component = min reachable id — the form a dedup pipeline
      * materializes to keep one representative per cluster (see
      * operators.ConnectedComponents; q74/q122). Long-lived sessions
      * release the returned frame's staged blocks via `Graft.sweep`. */
    def dupClusters(idCol: String, textCol: String,
        threshold: Double = 0.8, n: Int = 3): DataFrame =
      ConnectedComponents.minLabel(
        df.nearDupPairs(idCol, textCol, threshold, n), "id_a", "id_b")

    /** Materialize this frame once and truncate lineage (see
      * operators.Staging: executor-local by default, reliable under
      * `spark.graft.checkpointDir` for cluster failure-safety). For
      * frames consumed by several downstream stages or loops. */
    def staged(eager: Boolean = false): DataFrame = Staging.stage(df, eager)

    /** Edit-distance fuzzy-match pairs (lev <= maxDist) via SymSpell
      * deletion-variant blocking (see operators.Dedup). */
    def fuzzyMatchPairs(idCol: String, strCol: String,
        maxDist: Int = 2): DataFrame =
      Dedup.editDistancePairs(df, idCol, strCol, maxDist)

    /** Embedding-cosine near-duplicate pairs via banded SRP-LSH
      * candidates + exact cosine (see operators.Dedup). `vecCol` must be
      * array<double> (use Vectors.toDouble for float embeddings). */
    def embedNearDupPairs(idCol: String, vecCol: String,
        threshold: Double, bands: Int = 4,
        planesPerBand: Int = 8): DataFrame =
      Dedup.cosineNearDupPairs(df, idCol, vecCol, bands, planesPerBand,
        threshold)

    /** Per-group OLS fit from decimal-exact moments (see operators.Stats).
      * Returns keys + `n`, `slope`, `intercept`, `r2`. */
    def linearFit(x: Column, y: Column, keys: Column*): DataFrame =
      Stats.linearFit(df, x, y, keys)

    /** Rows deviating > `threshold` population σ from their group mean,
      * with `z` appended (see operators.Stats). */
    def zscoreOutliers(keyCol: String, valueCol: String,
        threshold: Double = 3.0): DataFrame =
      Stats.zscoreOutliers(df, keyCol, valueCol, threshold)

    /** Finite-kernel EWMA appended as `ewma` (see operators.Stats). */
    def ewma(keys: Seq[Column], order: Seq[Column], valueCol: String,
        alpha: Double = 0.5, taps: Int = 5): DataFrame =
      Stats.ewma(df, keys, order, valueCol, alpha, taps)

    /** BPE-style pre-token count appended as column `bpe_tokens`. */
    def withBpeTokenCount(textCol: String): DataFrame =
      df.withColumn("bpe_tokens", TextOps.bpeTokenCount(col(textCol)))

    /** One row per non-overlapping n-token chunk of `textCol` (C4-style
      * chunk grain; see TextOps.strideChunks): (idCol, chunk). */
    def tokenChunks(idCol: String, textCol: String, n: Int = 8): DataFrame =
      df.select(col(idCol),
        explode(TextOps.strideChunks(TextOps.tokens(col(textCol)), n))
          .as("chunk"))

    /** Training-set rows sharing at least one n-token chunk with
      * `heldOut` (both on `textCol`) — the decontamination sweep as a
      * hashed-chunk semi-join (see q107). Returns this DataFrame's rows
      * that ARE contaminated. */
    def contaminatedBy(heldOut: DataFrame, idCol: String, textCol: String,
        n: Int = 8): DataFrame = {
      val mine = df.tokenChunks(idCol, textCol, n)
        .select(col(idCol), TextOps.hashMod(col("chunk")).as("__h"))
        .distinct()
      val theirs = heldOut.tokenChunks(idCol, textCol, n)
        .select(TextOps.hashMod(col("chunk")).as("__h")).distinct()
      df.join(mine.join(theirs, Seq("__h"), "left_semi")
          .select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    }

    /** Exact cosine top-k: for each row of `queries`, the k nearest rows
      * of this DataFrame by cosine over `vecCol` (both must share the id
      * and vector column names). Queries are broadcast. */
    def cosineTopK(queries: DataFrame, idCol: String, vecCol: String,
        k: Int): DataFrame = {
      val n = df.select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
        .withColumn("__nr", Vectors.norm(col("__v")))
      val q = queries
        .select(col(idCol).as("query_id"),
          Vectors.toDouble(col(vecCol)).as("__qv"))
        .withColumn("__qnr", Vectors.norm(col("__qv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      n.crossJoin(broadcast(q))
        .filter(col(idCol) =!= col("query_id"))
        .select(col("query_id"), col(idCol).as("neighbor_id"),
          Vectors.cosine(Vectors.dot(col("__qv"), col("__v")),
            col("__qnr"), col("__nr")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }

    /** Scrub email/phone/IPv4 PII from `textCol` in place (see
      * operators.Pii for the patterns and replacement order). */
    def piiRedacted(textCol: String): DataFrame =
      df.withColumn(textCol, Pii.redact(col(textCol)))

    /** Remove rows whose `vecCol` embedding is within cosine `tau` of ANY
      * row of `benchmark` — semantic decontamination against an eval set
      * (q153). The benchmark is broadcast: it is small by definition; if
      * it ever isn't, generate candidates with SRP-LSH (embedNearDupPairs)
      * instead. `vecCol` may be array<float> (widened internally). */
    def semanticDecontaminated(benchmark: DataFrame, idCol: String,
        vecCol: String, tau: Double): DataFrame = {
      val b = benchmark.select(Vectors.toDouble(col(vecCol)).as("__bv"))
        .withColumn("__bnr", Vectors.norm(col("__bv")))
      val hits = df
        .select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
        .withColumn("__nr", Vectors.norm(col("__v")))
        .crossJoin(broadcast(b))
        .filter(Vectors.cosine(Vectors.dot(col("__v"), col("__bv")),
          col("__nr"), col("__bnr")) >= tau)
        .select(col(idCol)).distinct()
      df.join(hits, Seq(idCol), "left_anti")
    }

    /** Deterministic 80/10/10-style split assignment: appends `split`
      * ('train'/'val'/'test') as a pure function of the content hash
      * (q150). Identical text → identical split, across runs, engines,
      * and partitionings. */
    def splitAssigned(textCol: String, trainPct: Int = 80,
        valPct: Int = 10): DataFrame = {
      require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
        s"invalid split percentages ($trainPct/$valPct)")
      val h = TextOps.hashMod(col(textCol))
      val tB = TextOps.P * trainPct / 100
      val vB = TextOps.P * (trainPct + valPct) / 100
      df.withColumn("split",
        when(h < tB, "train").when(h < vB, "val").otherwise("test"))
    }

    /** Materialize a training mix from per-source epoch weights (q155):
      * each row is replicated floor(w) times plus one more with
      * probability frac(w), decided by a deterministic content-hash
      * Bernoulli draw. Appends `copy_idx` (1..n) and `n_copies`; rows
      * drawn to zero copies (w < 1) are dropped. Map-side only. */
    def epochUpsampled(weights: Map[String, Double], sourceCol: String,
        textCol: String): DataFrame = {
      require(weights.values.forall(w => w >= 0 && w < 9000),
        "epoch weights must be in [0, 9000)")
      // map(lit…) rather than typedLit: value classes cannot host the
      // anonymous TypeTag class typedLit materializes
      val entries = weights.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(lit(k), lit(math.round(v * 1000))) }
      val wm = coalesce(
        element_at(map(entries: _*), col(sourceCol)), lit(1000L))
      df.withColumn("__wm", wm)
        .withColumn("__rep",
          (col("__wm") / 1000).cast("long") +
            when(TextOps.hashMod(col(textCol)) % 1000 < col("__wm") % 1000,
              1L).otherwise(0L))
        .withColumn("copy_idx",
          explode(when(col("__rep") >= 1, sequence(lit(1L), col("__rep")))))
        .withColumn("n_copies", col("__rep"))
        .drop("__wm", "__rep")
    }

    /** Incremental (delta) dedup (q156): drop rows of THIS frame whose
      * text is a MinHash near-duplicate of any row in `corpus`. The
      * corpus contributes only its band index and is never self-joined
      * — at production scale pass the stored band table via
      * `corpusBands`-shaped precomputation instead of raw text. */
    def deltaDedupedAgainst(corpus: DataFrame, idCol: String,
        textCol: String, k: Int = 16, bands: Int = 4): DataFrame = {
      val rows = k / bands
      def bandsOf(d: DataFrame) = Dedup.lshBands(
        Dedup.minhashSignatures(
          Dedup.shingleHashes(d, idCol, textCol), idCol, "h", k),
        idCol, bands, rows)
      val corpB = bandsOf(corpus)
        .select(col("band_idx").as("__ci"), col("band_key").as("__ck"))
      val dupIds = bandsOf(df)
        .join(corpB, col("band_idx") === col("__ci") &&
          col("band_key") === col("__ck"), "left_semi")
        .select(col(idCol)).distinct()
      df.join(dupIds, Seq(idCol), "left_anti")
    }

    /** Near-dup hits of `df` against a static `corpus` band index —
      * `df` may be a STREAMING frame (q194): bands come from
      * [[Dedup.lshBandsStateless]] (row-local, no stateful
      * aggregation), the corpus index broadcasts through a semi join,
      * and each arrival of an id surfaces up to `bands` rows (one per
      * band whose key matched — the semi join dedups corpus rows, not
      * the probe side's bands). The recommended composition collapses
      * both that band fan-out AND at-least-once redelivery to one
      * verdict per id: `dropDuplicatesWithinWatermark` on `idCol` for
      * streams, `.dropDuplicates(idCol)` for batch callers. `carry`
      * columns ride the band rows to the output. */
    def nearDupHitsAgainst(corpus: DataFrame, idCol: String,
        textCol: String, k: Int = 16, bands: Int = 4,
        carry: Seq[String] = Nil): DataFrame = {
      val rows = k / bands
      val corpB = Dedup.lshBands(
        Dedup.minhashSignatures(
          Dedup.shingleHashes(corpus, idCol, textCol), idCol, "h", k),
        idCol, bands, rows)
        .select(col("band_idx").as("__ci"), col("band_key").as("__ck"))
      Dedup.lshBandsStateless(df, idCol, textCol, k, bands, rows,
          carry = carry)
        .join(broadcast(corpB), col("band_idx") === col("__ci") &&
          col("band_key") === col("__ck"), "left_semi")
        .select((col(idCol) +: carry.map(col)): _*)
    }

    /** Embedding-space delta decontamination (q196): keep only `df`
      * rows (`idCol`, `vecCol` array<double>) whose SRP band buckets
      * find NO corpus candidate above `tau` exact cosine. `df` is the
      * small incoming batch — its bands broadcast against the corpus
      * band index; the corpus never self-joins and exact cosine runs
      * on candidates only. */
    def embedDeltaDecontaminated(corpus: DataFrame, idCol: String,
        vecCol: String, tau: Double, bands: Int = 4,
        planesPerBand: Int = 8): DataFrame = {
      def withNorm(d: DataFrame) =
        d.withColumn("__nr", Vectors.norm(col(vecCol)))
      def banded(d: DataFrame, idAs: String) = d.select(
        col(idCol).as(idAs),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("b"),
            Vectors.srpBandBucket(col(vecCol), b, planesPerBand)
              .as("bk"))
        }: _*)).as("__band"))
        .select(col(idAs), col("__band.b"), col("__band.bk"))
      val cn = withNorm(corpus)
      val dn = withNorm(df)
      val corpB = banded(corpus, "__ci")
        .withColumnRenamed("b", "__cb").withColumnRenamed("bk", "__cbk")
      val cand = corpB.join(broadcast(banded(df, "__di")),
          col("__cb") === col("b") && col("__cbk") === col("bk"))
        .select(col("__di"), col("__ci")).distinct()
      val hit = cand
        .join(dn.select(col(idCol).as("__di2"), col(vecCol).as("__dv"),
          col("__nr").as("__dnr")), col("__di") === col("__di2"))
        .join(cn.select(col(idCol).as("__ci2"), col(vecCol).as("__cv"),
          col("__nr").as("__cnr")), col("__ci") === col("__ci2"))
        .filter(Vectors.cosine(Vectors.dot(col("__dv"), col("__cv")),
          col("__dnr"), col("__cnr")) > tau)
        .select(col("__di")).distinct()
      df.join(broadcast(hit), col(idCol) === col("__di"), "left_anti")
    }

    /** Deterministic weighted sample (q160): top-`k` rows per stratum
      * with inclusion probability ∝ `weightCol`, drawn by the
      * Efraimidis–Spirakis key ln(u)/w with the content hash as u —
      * reproducible across runs, partitionings, and engines. */
    def weightedSampled(strataCol: String, weightCol: Column,
        textCol: String, k: Int): DataFrame = {
      val key = log((TextOps.hashMod(col(textCol)) + lit(1.0)) /
        TextOps.P) / weightCol
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(strataCol)).orderBy(key.desc, col(textCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
    }

    /** CCNet-style LM quality score (q158): appends `n_tri` and
      * `avg_nll` — mean negative log-likelihood of this frame's text
      * under a char-trigram model with add-one smoothing fit on
      * `train`'s `textCol`. High avg_nll = unlike the training
      * distribution. The model is bounded by alphabet³ → broadcast. */
    def trigramLmScoredAgainst(train: DataFrame, idCol: String,
        textCol: String): DataFrame = {
      def tri(d: DataFrame, cols: Seq[Column]) = d.select(
        cols :+ explode(when(length(col(textCol)) >= 3, expr(
          s"transform(sequence(1, length($textCol) - 2)," +
            s" i -> substring($textCol, i, 3))"))).as("__g"): _*)
      val tc = tri(train, Nil).groupBy(col("__g"))
        .agg(count(lit(1)).as("__c"))
      val pc = tc.groupBy(substring(col("__g"), 1, 2).as("__p"))
        .agg(sum(col("__c")).as("__pc"))
      val v = tc.agg(
        countDistinct(substring(col("__g"), 3, 1)).as("__v"))
      val scored = tri(df, Seq(col(idCol)))
        .join(broadcast(tc), Seq("__g"), "left_outer")
        .join(broadcast(pc), substring(col("__g"), 1, 2) === col("__p"),
          "left_outer")
        .crossJoin(broadcast(v))
        .select(col(idCol),
          (-log((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
            (coalesce(col("__pc"), lit(0L)) + col("__v")))).as("__nll"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tri"),
          (graft.Exact.dsum(col("__nll")) / count(lit(1))).as("avg_nll"))
      df.join(scored, Seq(idCol), "left_outer")
    }

    /** Weighted PageRank to convergence over this frame's (src, dst, w)
      * edges, in exact fixed-point ppm arithmetic
      * (see operators.PageRank; q159 pins one step). */
    def pagerank(srcCol: String, dstCol: String, wCol: String,
        maxIterations: Int = 30): DataFrame =
      PageRank.run(df, srcCol, dstCol, wCol,
        maxIterations = maxIterations)

    /** SCD2 (type-2 slowly-changing-dimension) history: collapse this
      * frame to per-key change points of `attrCol` with [valid_from,
      * valid_to) validity in `timeCol` units (valid_to NULL for the open
      * current version). Both window passes share one key exchange+sort
      * (q167 pins the plan). `tieCol` breaks order ties deterministically. */
    def scd2History(keys: Seq[String], attrCol: String, timeCol: String,
        tieCol: String): DataFrame = {
      val keyCols = keys.map(col)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols: _*).orderBy(col(timeCol), col(tieCol))
      df.withColumn("__prev", lag(col(attrCol), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
        .select(keyCols :+ row_number().over(w).as("version") :+
          col(attrCol) :+ col(timeCol).as("valid_from") :+
          lead(col(timeCol), 1).over(w).as("valid_to"): _*)
    }

    /** CUSUM path per key: running decimal-exact sum of deviations from
      * the key's mean of `valueCol`, ordered by `orderCols` — the
      * change-point monitor (q170 pins extremes + locations). Returns
      * the input plus a `cusum` column; extremes are one aggregate away. */
    def withCusum(keyCol: String, valueCol: String,
        orderCols: Column*): DataFrame = {
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol))
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol)).orderBy(orderCols: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      df.withColumn("__mean",
          sum(col(valueCol).cast(Exact.Money)).over(wAll).cast("double")
            / count(col(valueCol)).over(wAll))
        .withColumn("cusum",
          sum((col(valueCol) - col("__mean")).cast(Exact.Money))
            .over(wRun).cast("double"))
        .drop("__mean")
    }

    /** Exact rolling lower-median of `valueCol` over a trailing ROWS
      * window per key (q175): collect+sort+index — an ELEMENT of the
      * window, not an interpolation, so doubles stay cross-engine
      * exact. Adds a `roll_med` column. */
    def withRollingMedian(keyCol: String, valueCol: String, window: Int,
        orderCols: Column*): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol)).orderBy(orderCols: _*)
        .rowsBetween(-(window - 1),
          org.apache.spark.sql.expressions.Window.currentRow)
      df.withColumn("__win", array_sort(collect_list(col(valueCol)).over(w)))
        .withColumn("roll_med",
          expr("__win[((size(__win) + 1) DIV 2) - 1]"))
        .drop("__win")
    }

    /** Benford first-digit audit of a positive numeric column: observed
      * vs expected distribution in BIGINT ppm (q164; expectations are
      * precomputed literals — in-engine log10 is not cross-engine
      * bit-stable). */
    def benfordDigits(valueCol: String): DataFrame = {
      val ben = (1 to 9).map(d =>
        d.toLong -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)
      val benCol = ben.tail.foldLeft(
        when(col("digit") === ben.head._1, ben.head._2)) {
        case (acc, (d, p)) => acc.when(col("digit") === d, p)
      }
      // guard: Benford is defined on values with a first significant
      // digit in 1..9 — values in (0,1) would yield digit 0 and
      // negatives a NULL digit without this filter
      df.filter(floor(col(valueCol)) >= 1)
        .select(substring(floor(col(valueCol)).cast("bigint")
          .cast("string"), 1, 1).cast("bigint").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        .withColumn("n", sum(col("n_obs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("digit"), col("n_obs"),
          expr("(1000000 * n_obs) DIV n").as("obs_ppm"),
          benCol.as("benford_ppm"),
          (expr("(1000000 * n_obs) DIV n") - benCol).as("excess_ppm"))
    }

    /** Per-group novel-content contribution: the fraction (BIGINT ppm)
      * of each group's distinct text shingles found in NO other group —
      * the buy-or-drop source diagnostic (q168). One staged distinct
      * (group, shingle) frame feeds both aggregates. */
    def groupNovelty(idCol: String, textCol: String,
        groupCol: String): DataFrame = {
      val sp = Staging.stage(
        Dedup.shingleHashes(df, idCol, textCol, 3)
          .join(df.select(col(idCol), col(groupCol)), idCol)
          .select(col(groupCol), col("h")).distinct(),
        eager = false)
      val hs = sp.groupBy(col("h")).agg(count(lit(1)).as("__nsrc"))
      sp.join(hs, "h")
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("__nsrc") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col(groupCol), col("n_sh"), col("n_unique"),
          expr("(1000000 * n_unique) DIV n_sh").as("novelty_ppm"))
    }

    /** Pairwise cosine between per-label centroids of an embedding
      * column (q166): decimal-exact per-dimension means, staged
      * |labels|-row centroid table, row-local cosine. */
    def centroidCosineMatrix(labelCol: String, vecCol: String): DataFrame = {
      val cv = Staging.stage(
        df.select(col(labelCol),
            posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
          .groupBy(col(labelCol), col("i"))
          .agg(Exact.davg(col("x")).as("c"))
          .groupBy(col(labelCol))
          .agg(expr("transform(array_sort(collect_list(struct(i, c)))," +
            " p -> p.c)").as("__cv")),
        eager = false)
      val a = cv.select(col(labelCol).as("label_a"), col("__cv").as("__va"))
      val b = cv.select(col(labelCol).as("label_b"), col("__cv").as("__vb"))
      a.join(b, col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          (Vectors.dot(col("__va"), col("__vb"))
            / (Vectors.norm(col("__va")) * Vectors.norm(col("__vb"))))
            .as("cosine"))
    }

    /** Per-row int8 scalar-quantization reconstruction error (mse,
      * max_err) for an embedding column — the compression-QA pass a
      * pipeline runs before shipping a quantized ANN index (q165).
      * Scales = per-dimension corpus max|x|, broadcast back; floor(x+.5)
      * for the cross-engine-stable round. */
    def int8QuantError(vecCol: String, dim: Int = 64): DataFrame = {
      val sv = df
        .select(posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("i", "x")))
        .groupBy(col("i")).agg(greatest(max(abs(col("x"))), lit(1e-12))
          .as("s"))
        .agg(expr("transform(array_sort(collect_list(struct(i, s)))," +
          " p -> p.s)").as("__sv"))
      df.withColumn("__v", col(vecCol).cast("array<double>"))
        .crossJoin(broadcast(sv))
        .withColumn("__errs", expr(
          s"""transform(sequence(0, ${dim - 1}), i ->
             |  __v[i] - floor(__v[i] * 127D / __sv[i] + 0.5D)
             |    * __sv[i] / 127D)""".stripMargin))
        .withColumn("mse",
          expr("aggregate(transform(__errs, x -> x * x)," +
            " cast(0.0 as double), (acc, x) -> acc + x)") / dim)
        .withColumn("max_err",
          expr("aggregate(transform(__errs, x -> abs(x))," +
            " cast(0.0 as double), (acc, x) -> greatest(acc, x))"))
        .drop("__v", "__sv", "__errs")
    }

    /** Top-k BPE merge candidates: adjacent character pairs over the
      * word-frequency vocabulary, weighted by corpus frequency (q162 —
      * one corpus-sized pass, then vocabulary-bounded). */
    def bpeTopMerges(textCol: String, k: Int = 20): DataFrame =
      df.select(explode(TextOps.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
        .filter(length(col("w")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("f")).as("n_occ"), count(lit(1)).as("n_word_types"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n_occ").desc, col("pair"))))
        .filter(col("rn") <= k)
        .select(col("rn"), col("pair"), col("n_occ"), col("n_word_types"))

    /** Iterated BPE training: `n` merges under the fixed-point loop
      * discipline (one vocabulary-bounded job per round; the corpus is
      * read once). Returns the learned merge table — the `merges.txt`
      * a tokenizer ships. See [[operators.Bpe.trainMerges]]. */
    def bpeTrainMerges(textCol: String, n: Int): Seq[operators.Bpe.Merge] =
      operators.Bpe.trainMerges(df, textCol, n)

    /** ENCODE a corpus with a trained merge artifact (rank-ordered
      * application, the tokenizers-BPE shape): per-document token
      * counts before/after plus chars-per-token compression — the
      * corpus-in-tokens price check before a training run. The exact
      * greedy fold runs once per DISTINCT word (vocabulary collapse,
      * broadcast back), never per occurrence; q182. Pass
      * `bpeTrainMerges(...).map(m => m.left -> m.right)` or a shipped
      * merges.txt. Returns (idCol, n_words, n_chars, n_bpe,
      * compression); documents that tokenize to NOTHING are omitted
      * (left-join back for explicit zeros). Long-lived sessions
      * release the staged token stream via `Graft.sweep`. */
    def bpeEncodedCounts(idCol: String, textCol: String,
        merges: Seq[(String, String)]): DataFrame =
      operators.Bpe.encodedCounts(df, idCol, textCol, merges)

    /** Z-order the frame for a multi-column-prunable write: scale both
      * dimension columns to 16 bits from one broadcast min/max pass,
      * Morton-interleave them (operators.ZOrder), and range-partition +
      * sort by the z-value. `df.zOrderedBy("a", "b", 64).write.parquet(p)`
      * is the OPTIMIZE ZORDER analog; ZOrderSpec measures the payoff. */
    def zOrderedBy(xCol: String, yCol: String, files: Int): DataFrame = {
      val s = df.agg(min(col(xCol)).as("__xmn"), max(col(xCol)).as("__xmx"),
        min(col(yCol)).as("__ymn"), max(col(yCol)).as("__ymx"))
      df.crossJoin(broadcast(s))
        .withColumn("__zv", ZOrder.interleave16(
          ZOrder.scale16(col(xCol), col("__xmn"), col("__xmx")),
          ZOrder.scale16(col(yCol), col("__ymn"), col("__ymx"))))
        .drop("__xmn", "__xmx", "__ymn", "__ymx")
        .repartitionByRange(files, col("__zv"))
        .sortWithinPartitions("__zv")
        .drop("__zv")
    }

    /** Sniff + normalize a heterogeneous media column: adds `fmt`
      * ('bmp'/'png'/'gif'/'jpeg'/'webp'/'tiff'/'wav'/'mp3'/'flac'/
      * 'mp4'/'corrupt'),
      * `width`/`height` (images), `rate` (audio) and `duration_ms`
      * (video). Detection IS the decoders' never-throw NULL contract —
      * a magic mismatch is the sniffer, so there is no separate
      * detection code to disagree with the parser, and an undecodable
      * payload lands in 'corrupt' instead of failing the job. All
      * parses are codegen'd Catalyst expressions
      * (functions/MediaHeader.scala): one per-row map, no UDF, no
      * shuffle. */
    def mediaSniffed(blobCol: String): DataFrame = {
      graft.functions.GraftFunctions.register(df.sparkSession)
      val b = blobCol
      df.withColumn("fmt",
          when(expr(s"bmp_bpp($b)").isNotNull, "bmp")
            .when(expr(s"png_width($b)").isNotNull, "png")
            .when(expr(s"gif_width($b)").isNotNull, "gif")
            .when(expr(s"jpeg_width($b)").isNotNull, "jpeg")
            .when(expr(s"webp_width($b)").isNotNull, "webp")
            .when(expr(s"tiff_width($b)").isNotNull, "tiff")
            .when(expr(s"wav_sample_rate($b)").isNotNull, "wav")
            .when(expr(s"mp3_sample_rate($b)").isNotNull, "mp3")
            .when(expr(s"flac_sample_rate($b)").isNotNull, "flac")
            // the 64-bit reader, not mp4_timescale: it accepts BOTH mvhd
            // versions, so a spec-legal version-1 MP4 (64-bit times — what
            // real muxers emit for long content) classifies as 'mp4'
            // instead of falling through to 'corrupt' (advisor r8)
            .when(expr(s"mp4_timescale64($b)").isNotNull, "mp4")
            .otherwise("corrupt"))
        .withColumn("width", coalesce(expr(s"bmp_width($b)"),
          expr(s"png_width($b)"), expr(s"gif_width($b)"),
          expr(s"jpeg_width($b)"), expr(s"webp_width($b)"),
          expr(s"CAST(tiff_width($b) AS INT)")))
        .withColumn("height", coalesce(expr(s"bmp_height($b)"),
          expr(s"png_height($b)"), expr(s"gif_height($b)"),
          expr(s"jpeg_height($b)"), expr(s"webp_height($b)"),
          expr(s"CAST(tiff_height($b) AS INT)")))
        .withColumn("rate", coalesce(expr(s"wav_sample_rate($b)"),
          expr(s"mp3_sample_rate($b)"),
          expr(s"CAST(flac_sample_rate($b) AS INT)")))
        // nullif, not a bare DIV: under ANSI mode a corrupt-but-
        // magic-valid MP4 declaring timescale 0 would throw
        // DIVIDE_BY_ZERO and fail the whole job — the exact opposite
        // of the never-fail contract documented above (advisor r7).
        // A zero timescale yields duration_ms NULL; fmt stays 'mp4'
        // (the header parsed — only the derived rate is undefined).
        // 64-bit readers throughout (both already BIGINT, so the
        // guard carries over): version-1 durations and u32 values
        // past Int range survive instead of NULLing (advisor r8).
        .withColumn("duration_ms", expr(s"mp4_duration64($b)" +
          s" * 1000 DIV nullif(mp4_timescale64($b), 0)"))
    }

    /** Sniff the TRANSPORT codec of a heterogeneous blob column
      * (q210/q235): adds `codec` ('gzip'/'zstd'/'tfrecord'/'ogg'/
      * 'tar'/'zip'/'corrupt') and `declared_size` (the payload size
      * the header CLAIMS — zstd's frame content size, TFRecord's
      * CRC-gated length, tar/zip archive payload sums; gzip and Ogg
      * declare none in their headers, so NULL by contract).
      * Classification is the decoders' never-throw NULL contract,
      * same as [[mediaSniffed]]: no separate sniffer to drift from
      * the parsers, and the codec question costs zero decompression
      * cycles. */
    def codecSniffed(blobCol: String): DataFrame = {
      graft.functions.GraftFunctions.register(df.sparkSession)
      val b = blobCol
      df.withColumn("codec",
          when(expr(s"gzip_os($b)").isNotNull, "gzip")
            .when(expr(s"zstd_content_size($b)").isNotNull ||
              expr(s"zstd_window_size($b)").isNotNull, "zstd")
            .when(expr(s"tfrecord_length($b)").isNotNull, "tfrecord")
            // an Opus-led BOS page identifies the Ogg transport (the
            // speech-corpus arrival format, q207); like gzip it
            // declares no payload size in its header
            .when(expr(s"opus_channels($b)").isNotNull, "ogg")
            // >= 1, not isNotNull: both archive walks legally return 0
            // for a valid EMPTY archive, and zero-led junk (tar) or a
            // bare EOCD (zip) must stay in the corrupt bucket rather
            // than claim a format
            .when(expr(s"tar_members($b) >= 1"), "tar")
            .when(expr(s"zip_entries($b) >= 1"), "zip")
            .otherwise("corrupt"))
        .withColumn("declared_size", coalesce(
          expr(s"zstd_content_size($b)"), expr(s"tfrecord_length($b)"),
          expr(s"tar_payload_bytes($b)"), expr(s"zip_comp_bytes($b)")))
    }

    /** Per-format manifest of a heterogeneous media corpus (q192):
      * [[mediaSniffed]] rolled up per detected format — doc count plus
      * width/height/rate/duration sums (NULL for formats without the
      * dimension). The curation pre-flight before a multimodal
      * training run: what's in the bucket, how much of it is corrupt. */
    def mediaManifest(blobCol: String): DataFrame =
      df.mediaSniffed(blobCol)
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          sum(col("width")).as("sum_w"),
          sum(col("height")).as("sum_h"),
          sum(col("rate")).as("sum_rate"),
          sum(col("duration_ms")).as("sum_dur_ms"))
  }
}
