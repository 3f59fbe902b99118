package graft

/** Physical-plan regression tests for the catalog's scale-critical plan
  * shapes. PLANS.md records these properties as prose audits of explain
  * dumps; this spec pins the load-bearing ones as assertions so a future
  * refactor that silently loses a pushdown, a broadcast, or a partial
  * aggregate fails `sbt test` instead of only showing up as a bench
  * regression three rounds later.
  *
  * All queries run against the sf0.001 fixture. Each Dataset is
  * materialized FIRST (collect on the same Dataset, not a count() clone)
  * so the string read afterwards is the ADAPTIVE final plan — the plan
  * that actually executed, not the pre-AQE guess.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Run the named catalog query to completion, return its final plan.
    * Scan metadata (PushedFilters, ReadSchema) is truncated at 100 chars
    * by default, which would silently weaken the substring assertions. */
  private def finalPlan(name: String): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("q2: filters reach the parquet scan and the schema is pruned") {
    val plan = finalPlan("q2_filter_project")
    // all three predicates push down (the driver-visible PushedFilters list)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(l_discount") &&
      plan.contains("LessThan(l_quantity") &&
      plan.contains("EqualTo(l_returnflag,R)"),
      s"expected all three predicates in PushedFilters:\n$plan")
    // the scan reads only the 7 referenced columns, not all 16
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"expected a pruned ReadSchema (no l_comment/l_tax):\n$readSchema")
  }

  test("q3: the small dimension side is broadcast, not shuffled") {
    val plan = finalPlan("q3_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"expected no SortMergeJoin for a dim-sized build side:\n$plan")
  }

  test("q7: rank-filter windows use WindowGroupLimit (partial top-k before the exchange)") {
    val plan = finalPlan("q7_topk_per_group")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit below the window exchange:\n$plan")
  }

  test("q8: global sort+limit plans as TakeOrderedAndProject, not a full sort") {
    val plan = finalPlan("q8_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }

  test("q1: aggregation is partial+final (map-side combine before the shuffle)") {
    val plan = finalPlan("q1_pricing_summary")
    assert(plan.contains("partial_"),
      s"expected partial aggregate functions:\n$plan")
  }

  test("q132: co-bucketed join shuffles neither join input") {
    val plan = finalPlan("q132_bucketed_join")
    // the post-join groupBy(c_mktsegment) legitimately shuffles; the bucket
    // win is that the JOIN KEYS never do — both sides scan pre-bucketed
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"expected no shuffle exchange on the join keys:\n$plan")
    assert(plan.contains("SortMergeJoin") &&
      plan.contains("SelectedBucketsCount"),
      s"expected the hinted sort-merge join over bucketed scans:\n$plan")
  }

  test("q129: the native as-of join strategy plans AsOfJoinExec") {
    val plan = finalPlan("q129_asof_native")
    assert(plan.contains("AsOfJoin"),
      s"expected the native AsOfJoinExec operator:\n$plan")
  }

  test("q150: corpus split computes heads via partial WindowGroupLimit + broadcast counts") {
    val plan = finalPlan("q150_corpus_split")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit for the per-split heads:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"expected the 3-row count table to broadcast:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"expected no global sort of the corpus:\n$plan")
  }

  test("q41: brute-force cosine top-k broadcasts the probe side") {
    val plan = finalPlan("q41_cosine_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join for the probe side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"expected no unpartitioned cartesian product:\n$plan")
  }

  test("q155: upsampling is map-side only — one scan, no Filter, no shuffle but the fixture exchange") {
    val plan = finalPlan("q155_epoch_upsample")
    // the rep>=1 guard lives inside the explode; a Filter node would mean
    // the md5-based rep expression is evaluated twice (the pushdown tax)
    assert(!plan.contains("+- Filter"),
      s"expected no Filter node (guard belongs inside the explode):\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no hash shuffle in a map-side pass:\n$plan")
  }

  test("q158: the LM model tables broadcast to the scoring side") {
    val plan = finalPlan("q158_trigram_lm_score")
    // two count tables + the alphabet scalar: three broadcast exchanges
    val n = "BroadcastExchange".r.findAllIn(plan).size
    assert(n >= 3,
      s"expected >=3 BroadcastExchange (model tables + alphabet), got $n:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"expected no sort-merge join against the bounded model tables:\n$plan")
  }

  test("q160: weighted sampling rides the rank-limit pushdown, never a global sort") {
    val plan = finalPlan("q160_weighted_sample")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit (partial top-k before the exchange):\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"expected no global sort of the corpus:\n$plan")
  }

  test("q163: all KL passes read ONE staged vocab RDD — the corpus explode runs once") {
    val plan = finalPlan("q163_unigram_kl")
    // four consumers (totals, contributions, total-KL, top-k) must scan
    // the SAME MapPartitionsRDD; a Generate node would mean a consumer
    // re-planned the corpus-sized token explode
    assert("Scan ExistingRDD".r.findAllIn(plan).size >= 3,
      s"expected >=3 ExistingRDD scans of the staged vocab table:\n$plan")
    assert(!plan.contains("Generate"),
      s"expected no token explode above the staged vocab table:\n$plan")
  }

  test("q164: the Benford total comes from a window, not a second scan") {
    // AdaptiveSparkPlan.toString prints Final AND Initial plan sections —
    // count scans only in the final (executed) one
    val plan = finalPlan("q164_benford_digits")
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"expected exactly one lineitem scan, got $scans:\n$plan")
  }

  test("q171: the MV merge keeps the sum DECIMAL through the union of partials") {
    val plan = finalPlan("q171_incremental_mv")
    assert(plan.contains("Union"),
      s"expected a Union of base+delta partial states:\n$plan")
    // the merge aggregate must re-sum the DECIMAL partial, not a double
    assert(plan.contains("sum(s#") || plan.contains("sum(s)"),
      s"expected the decimal partial column summed in the merge:\n$plan")
  }

  test("q172: bottom-k per label is a WindowGroupLimit over a broadcast centroid join") {
    val plan = finalPlan("q172_label_outliers")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit (partial bottom-k per partition):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the staged centroid table broadcast onto the corpus:\n$plan")
  }

  test("q166: the pair self-join reads the STAGED centroid table, not two corpus explodes") {
    val plan = finalPlan("q166_centroid_sim")
    assert("Scan ExistingRDD".r.findAllIn(plan).size >= 2,
      s"expected both join sides on the staged centroid RDD:\n$plan")
    // the posexplode+aggregate lives BEHIND the staged leaf; seeing it in
    // the executed plan means a side re-planned the corpus pipeline
    assert(!plan.contains("Generate"),
      s"expected no re-planned corpus explode above the join:\n$plan")
  }

  test("q174: seed selection pre-limits below the rank window; no forced corpus broadcast") {
    // the global top-Seeds rank window must not sort the whole degree
    // table: either WindowGroupLimit (partial per partition) or the even
    // stronger TakeOrderedAndProject global top-k rewrite qualifies
    val plan = finalPlan("q174_two_hop_reach")
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject(limit=10"),
      s"expected a rank-limit rewrite under the seed window:\n$plan")
    // with size-based broadcasting OFF, the supplier-keyed hop join must
    // fall back to a shuffled SortMergeJoin — proving nothing in the
    // query FORCES a broadcast of the corpus-sized edge list (at sf0.001
    // AQE legitimately broadcasts it by size; at 100 TB it could not)
    Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .foreach(k => spark.conf.set(k, "-1"))
    try {
      val p2 = finalPlan("q174_two_hop_reach")
      assert("SortMergeJoin \\[s#\\d+".r.findFirstIn(p2).isDefined,
        s"expected the hop join supplier-keyed (SMJ on s):\n$p2")
      assert(!p2.contains("BroadcastHashJoin"),
        s"expected no broadcast anywhere with the threshold off:\n$p2")
    } finally Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .foreach(spark.conf.unset)
  }

  test("q36: the shingle pipeline carries no redundant global Deduplicate") {
    // round-6 win: the outer .distinct() over (id, h) — a full extra
    // shuffle under 12 dedup-family queries — is gone because per-doc
    // string-level array_distinct already guarantees the set semantics.
    // Pin the OPTIMIZED LOGICAL plan: a reintroduced .distinct() would
    // surface as a Deduplicate node (physical HashAggregates are
    // ambiguous — legit aggregates look identical).
    val df = SparkEntry.queries("q36_ngram_jaccard")(spark, sf)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("Deduplicate"),
      s"expected no Deduplicate in the shingle pipeline:\n$logical")
    // the exchange-count half (r6 verdict ask #7): the A/B-measured
    // shape is 7 SHUFFLE exchanges (hash/range partitioning; broadcast
    // exchanges excluded — small-side broadcasts are free to come and
    // go with stats). A silently re-added global distinct/repartition
    // would raise this even while the Deduplicate check above stays
    // quiet (e.g. a groupBy-based dedup).
    val physical = df.queryExecution.executedPlan.toString
    val shuffles =
      "Exchange (hash|range)partitioning".r.findAllIn(physical).size
    assert(shuffles <= 7,
      s"q36 grew to $shuffles shuffle exchanges (pinned ceiling 7) — " +
        s"a refactor re-added a shuffle:\n$physical")
  }

  test("q177: the BMP parse runs inside whole-stage codegen, no UDF") {
    val plan = finalPlan("q177_media_header_decode")
    // the parse projection must carry the `*(n)` whole-stage-codegen
    // marker: the expressions are codegen'd Catalyst nodes, not UDF
    // calls that break the pipeline
    assert("""\*\(\d+\) Project .*bmp_width""".r.findFirstIn(plan).isDefined,
      s"expected bmp_width inside a codegen'd (*) projection:\n$plan")
    assert(plan.contains("bmp_height") && plan.contains("bmp_bpp"),
      s"expected all header-field expressions in the plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"expected no UDF in the decode path:\n$plan")
  }

  test("q189/q191: the JPEG marker walk and MP4 box walk stay codegen'd") {
    // the bounded walks (loops in generated Java) must still live inside
    // a whole-stage-codegen projection — a fallback to interpreted eval
    // or a UDF would be the silent per-row regression at scan scale
    val jp = finalPlan("q189_jpeg_header")
    assert("""\*\(\d+\) Project .*jpeg_width""".r.findFirstIn(jp).isDefined,
      s"expected jpeg_width inside a codegen'd (*) projection:\n$jp")
    val mp = finalPlan("q191_mp4_header")
    assert("""\*\(\d+\) Project .*mp4_timescale""".r.findFirstIn(mp)
      .isDefined,
      s"expected mp4_timescale inside a codegen'd (*) projection:\n$mp")
    // q192's sniff stacks all six decoders in ONE projection — the
    // composition must not break the codegen span either
    val mf = finalPlan("q192_media_manifest")
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(mf).isDefined,
      s"expected the manifest rollup inside whole-stage codegen:\n$mf")
    Seq(jp, mp, mf).foreach(p =>
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython")))
  }

  test("q181: the PNG big-endian parse runs inside whole-stage codegen, no UDF") {
    val plan = finalPlan("q181_png_header")
    assert("""\*\(\d+\) Project .*png_width""".r.findFirstIn(plan).isDefined,
      s"expected png_width inside a codegen'd (*) projection:\n$plan")
    assert(plan.contains("png_height") && plan.contains("png_bit_depth") &&
      plan.contains("png_color_type"),
      s"expected all IHDR-field expressions in the plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"expected no UDF in the decode path:\n$plan")
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact scan at runtime") {
    // The star-join shape DPP exists for at 100 TB: the fact side is
    // partitioned on the join key, the dim filter is only known at plan
    // time on the DIM side, and Spark injects a runtime subquery filter
    // into the fact scan's PartitionFilters so unselected partitions are
    // never listed or read. Two measured preconditions pinned here:
    // both sides are real parquet reads (a LocalRelation dim would have
    // its filter constant-folded away), and the dim predicate must be
    // LIKELY-SELECTIVE in PartitionPruning's sense — a literal
    // comparison/IN/LIKE. A bare boolean column (`filter($"keep")`) is
    // NOT on that list and silently disables DPP; the string-equality
    // form below is the shape that prunes.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum, when}
    val base = java.nio.file.Files.createTempDirectory("graft_dpp_")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try {
      val ev = graft.sources.Tables(spark, sf).events
        .select($"event_type", $"value")
      ev.write.mode("overwrite").partitionBy("event_type")
        .parquet(s"$base/fact")
      ev.select($"event_type").distinct()
        .withColumn("cat",
          when(col("event_type").isin("click", "purchase"), lit("keep"))
            .otherwise(lit("drop")))
        .write.mode("overwrite").parquet(s"$base/dim")
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter($"cat" === "keep")
      val q = fact.join(dim, Seq("event_type"))
        .groupBy($"event_type").agg(sum($"value").as("v"))
      val rows = q.collect()
      assert(rows.map(_.getString(0)).sorted.toSeq ==
        Seq("click", "purchase"), "join result should be the kept slice")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"expected a runtime dynamicpruningexpression PartitionFilter " +
          s"on the fact scan:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.maxMetadataStringLength")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base.toFile)
    }
  }

  test("q185: the WAV little-endian parse runs inside whole-stage codegen, no UDF") {
    val plan = finalPlan("q185_wav_header")
    assert("""\*\(\d+\) Project .*wav_sample_rate""".r.findFirstIn(plan).isDefined,
      s"expected wav_sample_rate inside a codegen'd (*) projection:\n$plan")
    assert(plan.contains("wav_channels") && plan.contains("wav_byte_rate") &&
      plan.contains("wav_bits_per_sample") &&
      plan.contains("wav_audio_format"),
      s"expected all fmt-chunk-field expressions in the plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"expected no UDF in the decode path:\n$plan")
  }

  test("q182: the encode fold runs on the broadcast vocabulary, never per occurrence") {
    // the corpus-side join must be a broadcast of the vocab→length
    // table; a SortMergeJoin here means the vocabulary collapse was
    // lost and the per-word fold would run per corpus occurrence
    val plan = finalPlan("q182_bpe_encode")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the encoded vocabulary to broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"expected no shuffle join in the encode path:\n$plan")
  }

  test("q180: source rides the explode — the only join is the broadcast of per-source totals") {
    // the carry-column design exists so boilerplate detection never
    // re-attaches `source` with a corpus-sized doc_id join; the one
    // remaining join (per-source totals, one row per source) must
    // broadcast. A SortMergeJoin here means either the carry was lost
    // (doc_id re-join) or the tiny totals table stopped broadcasting.
    val plan = finalPlan("q180_boilerplate")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the per-source totals to broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("hashpartitioning(doc_id"),
      s"expected no corpus-keyed join in the boilerplate path:\n$plan")
  }

  test("q196: the delta's bands broadcast against the corpus index; " +
      "candidates stay batch x bands-bounded") {
    // The decontamination asymmetry is the whole point: the corpus
    // band index STREAMS through the probe join exactly once while the
    // small delta side broadcasts, and the exact-cosine verify joins
    // candidate ids back to the two vector tables — also broadcasts at
    // any realistic delta size. A SortMergeJoin anywhere in this plan
    // means a corpus-sized shuffle crept into the daily-ingest path; a
    // missing LeftOuter broadcast means the per-row verdict stopped
    // riding the tiny hit set.
    val plan = finalPlan("q196_embed_delta_decontam")
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBhj >= 3,
      s"expected probe + verify + verdict broadcasts, got $nBhj:\n$plan")
    assert("BroadcastHashJoin \\[.*\\], LeftOuter, BuildRight".r
      .findFirstIn(plan).isDefined,
      s"expected the verdict join to broadcast the hit set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"expected no corpus-sized shuffle join in the delta path:\n$plan")
  }

  /** AQE's executedPlan toString carries BOTH the final and the initial
    * plan; counts over the raw string double-count every node. Pin
    * against the final section only. */
  private def aqeFinalSection(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("q218: the Bloom bitset rides ONE broadcast nested-loop row, " +
      "never a shuffle") {
    // the whole point of the dense one-row array: the benchmark set
    // reaches every probe task as a broadcast, so the only non-equi
    // join in the plan is that single one-row cross
    val plan = aqeFinalSection("q218_bloom_decontam")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1,
      s"expected exactly one bitset broadcast NLJ, got $bnlj:\n$plan")
  }

  test("q219: the lossless simjoin stays inside a bounded shuffle budget") {
    // staged shingle leaf + df/size aggregates + prefix window +
    // candidate self-join + verify joins; a refactor that re-tokenizes
    // or re-shuffles the corpus shows up here first
    val plan = aqeFinalSection("q219_prefix_simjoin")
    val shuffles =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles <= 12,
      s"q219 grew to $shuffles shuffle exchanges (pinned ceiling 12):\n$plan")
  }

  test("q223: the packer's prefix sum never sorts a corpus slice in one task") {
    // two-pass shape (r8 judge): the corpus-sized window must partition
    // by (source, bkt) — a Window partitioned by `source` alone and
    // ordered by doc_id is the low-cardinality serialization the rework
    // removed (the only per-source window left runs over the tiny
    // per-bucket subtotal table, ordered by bkt)
    val plan = aqeFinalSection("q223_packing_assignment")
    assert(!"""\[source#\d+\], \[doc_id#\d+L?""".r.findFirstIn(plan).isDefined,
      s"expected no corpus window partitioned by source alone:\n$plan")
    assert("""\[source#\d+, bkt#\d+L?\], \[doc_id#\d+L?""".r
      .findFirstIn(plan).isDefined,
      s"expected the bucket-local window on (source, bkt):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the per-bucket offsets to broadcast back:\n$plan")
  }

  test("q257: the nprobe knob joins as broadcast NLJ grids, and adding " +
      "it costs no corpus-sized shuffle beyond the single-probe audit") {
    // the 3-row nprobe grid joins candidates on crank <= nprobe — a
    // non-equi join whose acceptable physical form is a broadcast NLJ
    // of the provably tiny side (the q247/q218 pattern). Six such tiny
    // crosses exist by design: centroid assignment, the per-query
    // centroid ranking, the truth ranking's query-set cross, the two
    // grid joins (ivf + scan-cost), and the final probes cross; a 7th
    // means a corpus-sized side slipped into a non-equi join
    val plan = aqeFinalSection("q257_ivf_multiprobe")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj >= 1 && bnlj <= 6,
      s"expected the six tiny broadcast NLJs at most, got $bnlj:\n$plan")
    val shuffles =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles <= 8,
      s"q257 grew to $shuffles shuffle exchanges (pinned ceiling 8):\n$plan")
  }

  test("q233: resharding analysis is one map + one aggregate exchange") {
    // both assignments (mod and the 20-way HRW argmax) are pure
    // per-row hashing: anything beyond the single rollup shuffle means
    // someone turned a map stage into a join
    val plan = aqeFinalSection("q233_shard_rebalance")
    val shuffles =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"expected exactly the rollup exchange, got $shuffles:\n$plan")
    assert(!plan.contains("Join"), s"expected no joins at all:\n$plan")
  }
}
