package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // a duplicate qN prefix would produce duplicate-keyed JSON below and
    // one timing would silently shadow the other — fail loudly BEFORE the
    // (long) measurement loop, not after it has burned the full run
    require(SparkEntry.queries.keys
      .map(_.takeWhile(_ != '_')).toSeq.distinct.size ==
      SparkEntry.queries.size,
      "duplicate query number prefix in SparkEntry.queries")
    // absorb JVM/codegen/session warmup so per-query numbers are
    // steady-state; run in sorted order so rounds are comparable.
    // The parquet read + noop write warms the Hadoop FS / parquet-reader
    // / datasource-writer init paths that the alphabetically-first
    // catalog query was otherwise billed for (~2 s on its own).
    spark.range(2000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // JMH-style warmup ITERATION: run the whole catalog once against the
    // smallest fixture before timing anything. Whole-stage-codegen JIT for
    // each pipeline family otherwise lands on its lexicographically FIRST
    // member at the target SF (measured: q103 carries the tokenize→shingle
    // chain's ~3-5 s, q122 the CC loop's — both read 2-3x their
    // steady-state cost in rounds 3-4 benches). Codegen caches key on the
    // generated source, not the input path, so a tiny-SF pass warms the
    // exact code the timed loop runs. Failures are ignored (the timed
    // loop, not warmup, is the record of what runs); staged blocks are
    // swept per query exactly as in the timed loop. Skippable for local
    // iteration via SPARK_GRAFT_WARM=0; the driver keeps the default ON.
    if (sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0") {
      val warmDir = new java.io.File(sfDir).getParentFile match {
        case null => None
        case p =>
          val d = new java.io.File(p, "sf0.001")
          if (d.isDirectory && d.getPath != new java.io.File(sfDir).getPath)
            Some(d.getPath)
          else None
      }
      warmDir.foreach { wd =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
          try fn(spark, wd).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          graft.operators.Staging.sweep(spark)
        }
      }
      // Target-SF fixture warm: one full scan pass per table. The tiny-SF
      // catalog pass above warms CODE (codegen caches); it cannot warm the
      // target fixtures' page cache or the reader's large-batch paths, so
      // the first heavy query at the target SF paid a measured ~1.5-2 s
      // one-time cost (round-6 A/B: q122 alone-FIRST 4.9-5.8 vs 4.0-4.3
      // at position ~30). A noop pass over every table (~17 MB at sf0.1)
      // moves that cost out of the first timed query.
      graft.sources.Tables.names.foreach { n =>
        try spark.read.parquet(s"$sfDir/$n.parquet")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    // dev-only subset filter (comma-separated qN prefixes): lets a single
    // query be measured under EXACT bench methodology — fresh session,
    // sorted order, per-query sweep — which the Explain harness cannot do
    // (it never sweeps, and its rows= count re-executes the pipeline, so
    // staged blocks pile up and "warm" runs read slower). Unset = full
    // catalog; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (name, _) =>
        only.forall(_.contains(name.takeWhile(_ != '_')))
    }
    val results = selected.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune the very
        // expressions being measured (projections, windows, string
        // functions all fold away when only the row count is consumed)
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // release the query's staged blocks (dedup/CC intermediates):
        // left pinned, dozens of staged RDDs accumulate in the block
        // manager over the 146-query session and every later query pays
        // for them (round-3 judge measured a broad ~1.6x inflation)
        graft.operators.Staging.sweep(spark)
        // failures are recorded as -1, not as a bogus time-to-failure
        name -> (if (ok) dt else -1.0)
    }
    // Keep the JSON line COMPACT: the driver's log capture keeps only the
    // tail of stdout (~2 KB), and sbt appends a [success] line after us —
    // a 5 KB line gets truncated mid-JSON and the driver records
    // parsed:null (observed in rounds 1, 2 AND 4). Query keys are the
    // catalog number in BASE-36 lowercase ("a"=q10, "2s"=q100, "55"=q185
    // — round-5 verdict's proposed compression: 3-digit decimal keys cost
    // the line ~1 B/query once the catalog passed 100, and the 185-query
    // decimal line had outgrown the window's headroom). Base-36 keys can
    // be digits-only ("10" = q36), so the encoding is declared explicitly
    // by the "kb":36 field rather than sniffed from key shape —
    // tools/bench_compare.py normalizes both generations off that flag.
    // 1-dp per-query times with trailing ".0" stripped, as before.
    def b36(name: String): String = java.lang.Long.toString(
      name.takeWhile(_ != '_').stripPrefix("q").toLong, 36)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def f1(v: Double): String = {
      val r = math.rint(v * 10) / 10
      if (r == math.rint(r)) r.toLong.toString else r.toString
    }
    val qs = results.map { case (k, v) =>
      "\"" + b36(k) + "\":" + (if (v < 0) "-1" else f1(v))
    }.mkString("{", ",", "}")
    // failures (-1 sentinels) are excluded — summing them would make a
    // failing round report a BETTER total than a clean one
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    // streaming ingest throughput (the reference's headline metric:
    // msgs/sec through the buffer — here rows/sec through a full
    // file-stream -> keyed-aggregation -> sink micro-batch pipeline).
    // THREE runs, emitted [min, median, max]: the r3→r5 driver artifacts
    // showed a monotone slide (135k→105k→70k) that builder-side A/Bs
    // called environmental — a single-run number can't distinguish
    // variance from regression, a spread makes the claim self-evidencing.
    def ingestOnce(): Double = {
      val src = graft.streaming.Streams.fileStream(spark, sfDir, "events")
      val t0 = System.nanoTime()
      val agg = src.groupBy(org.apache.spark.sql.functions.col("event_type"))
        .count()
      val n = graft.streaming.Streams.runToMemory(agg, "complete")
        .agg(org.apache.spark.sql.functions.sum("count")).head().getLong(0)
      n / ((System.nanoTime() - t0) / 1e9)
    }
    val ingestRuns = (1 to 3).map { _ =>
      try ingestOnce()
      catch { case t: Throwable =>
        System.err.println(s"[bench] ingest probe failed: $t"); -1.0 }
    }.sorted
    // per-batch ingest latency percentiles — the reference's headline
    // metric is write/read micro-latency P50–P99.99
    // (/root/reference/src/tests/integration_test.rs:541-551, :565-720).
    // The Spark analog of one buffer "operation" is one micro-batch
    // trigger: split the events fixture into many files, admit one per
    // trigger, and read triggerExecution durations from query progress.
    val latJson = try {
      import org.apache.spark.sql.functions.col
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match runToMemory's state-store sizing (8 partitions) so the
      // latency probe measures the same configuration the streaming
      // queries run under
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val tmp = java.nio.file.Files.createTempDirectory("graft_lat_")
      tmp.toFile.deleteOnExit()
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      ev.repartition(48).write.mode("overwrite").parquet(tmp.toString)
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp.toString)
      val agg = src.groupBy(col("event_type")).count()
      val q = agg.writeStream.outputMode("complete")
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
      val lat = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toDouble)
        .sorted
      def pct(p: Double): Long =
        if (lat.isEmpty) -1L
        else math.rint(lat(
          math.min(lat.length - 1, math.ceil(p * lat.length).toInt - 1)
            .max(0))).toLong
      // b50 = per-BATCH trigger p50; the continuous per-record
      // percentiles join it in one "lat" block below (the two-block
      // round-5 form cost ~90 B of the ~2 KB stdout-tail window; the
      // merged block costs ~32, buying the ingest spread + z95 room).
      // b99/mb50/mb99 and the full percentile sets remain available
      // locally (recentProgress / LatencyProbe).
      s""""b50":${pct(0.50)}"""
    } catch { case t: Throwable =>
      System.err.println(s"[bench] latency probe failed: $t"); "" }
    // Low-latency envelope experiment (the reference's µs-ms headline
    // target): per-RECORD latency of one map-only pipeline over the rate
    // source — an unbounded non-file source — under the two ends of
    // Spark's latency spectrum: default micro-batch vs continuous
    // processing. See streaming/LatencyProbe.scala and README
    // "Latency envelope". ~16 s of fixed sleeps, so skippable for local
    // iteration via SPARK_GRAFT_LATEXP=0 (driver runs keep the default
    // ON); a failure logs to stderr instead of vanishing silently, so a
    // broken run is distinguishable from a skipped one.
    val expJson =
      if (sys.env.getOrElse("SPARK_GRAFT_LATEXP", "1") == "0") ""
      else try {
        import org.apache.spark.sql.streaming.Trigger
        def measure(trigger: Trigger): (Long, Long) = {
          val src = spark.readStream.format("rate")
            .option("rowsPerSecond", "2000").load()
            .selectExpr("timestamp", "value % 97 AS v")
          val q = src.writeStream.trigger(trigger)
            .foreach(new graft.streaming.LatencyProbe).start()
          try {
            Thread.sleep(3000) // warmup: codegen + first epochs
            graft.streaming.LatencyProbe.arm()
            Thread.sleep(5000)
            graft.streaming.LatencyProbe.disarm()
          } finally q.stop()
          val s = graft.streaming.LatencyProbe.snapshot()
          (graft.streaming.LatencyProbe.percentile(s, 0.5),
            graft.streaming.LatencyProbe.percentile(s, 0.99))
        }
        // mb50/mb99 (per-record micro-batch percentiles) dropped from the
        // emitted line in round 6: they track b50/b99 (the scheduler
        // floor dominates both) and the freed ~25 B pays for the ingest
        // spread. Still measured locally via LatencyProbe.
        val (_, _) = measure(Trigger.ProcessingTime(0L))
        val (c50, c99) = measure(Trigger.Continuous("1 second"))
        s""""c50":$c50,"c99":$c99"""
      } catch { case t: Throwable =>
        System.err.println(s"[bench] latency envelope failed: $t"); "" }
    // The latency probe narrowed shuffle.partitions to its state-store
    // sizing (8); the z95/rem re-measures below exist to be COMPARABLE
    // to the timed loop's at-position numbers, so restore the session's
    // parallelism first — an 8-partition re-measure of a 32-partition
    // reading would fold a config delta into the session-age signal.
    spark.conf.set("spark.sql.shuffle.partitions", GraftSession.cpus)
    // End-of-session re-measure of q95 (the round-5 judge's flagged
    // driver-only climber): the timed loop measured it at its usual
    // position (~170th); this second sample lands AFTER the full catalog
    // + all streaming probes, the oldest possible session. One artifact
    // then carries q95 at two session ages — if a driver round shows
    // q95 high at position AND at z95, the cost is uniform (VM-level)
    // rather than session aging; a z95 >> position gap names aging.
    // Local evidence (PLANS.md round-6): no gap on the builder machine.
    val z95 = try {
      SparkEntry.queries.get("q95_dup_degree_hist").map { fn =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.operators.Staging.sweep(spark)
        (System.nanoTime() - t0) / 1e9
      }
    } catch { case t: Throwable =>
      System.err.println(s"[bench] z95 re-measure failed: $t"); None }
    val z95Json = z95.map(v => s""","z95":${f1(v)}""").getOrElse("")
    // End-of-session re-measure of the TWO SLOWEST timed queries ("rem").
    // Round-6 on-machine evidence: four same-code full-bench runs showed
    // one-shot 8-25 s spikes on a DIFFERENT query each run (q122 27.5 →
    // 4.1 s ten minutes later; then q178/q179; then q103 25.6 → 4.3; then
    // none), with a heap A/B ruling out GC and /proc/stat showing steady
    // hypervisor steal bursts — transient machine stalls, not plans. A
    // single-shot per-query time can't distinguish a real regression from
    // one such stall; re-measuring the run's own outliers inside the same
    // artifact makes the distinction self-evidencing: spike at position
    // but rem ≈ family steady state → stall; rem confirms the cost → real.
    val rem = {
      val worst = results.filter(_._2 >= 0).sortBy(-_._2).take(2)
      // per-query fault isolation: one failed re-run records -1 for that
      // entry instead of voiding the whole diagnostic block
      val again = worst.flatMap { case (name, _) =>
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          graft.operators.Staging.sweep(spark)
          Some(s""""${b36(name)}":${f1((System.nanoTime() - t0) / 1e9)}""")
        } catch { case t: Throwable =>
          System.err.println(s"[bench] rem re-measure of $name failed: $t")
          Some(s""""${b36(name)}":-1""")
        }
      }
      if (again.isEmpty) "" else s""","rem":{${again.mkString(",")}}"""
    }
    val latBlock = Seq(latJson, expJson).filter(_.nonEmpty) match {
      case Nil => ""
      case ps  => s""","lat":{${ps.mkString(",")}}"""
    }
    // "sf" is the fixture BASENAME (the full path cost 18 B of the ~2 KB
    // stdout-tail window; the driver's own artifact carries the sf value)
    val sfName = new java.io.File(sfDir).getName
    // ingest spread in K-ROWS/S (rounded): full rows/s cost 6 digits per
    // sample; the spread's job is naming variance, not ±500 rows/s
    val ing = ingestRuns.map(r => math.rint(r / 1000).toLong)
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${f1(total)},"unit":"sec","kb":36,"queries":$qs,"ingest_k":$ing$latBlock$z95Json$rem,"sf":"$sfName"}"""
    // The JSON line is the LAST stdout the JVM emits: rounds 1/2/4 lost
    // the artifact because async executor logs (continuous-trigger
    // TaskKilled WARNs) landed AFTER the println and pushed the head of
    // the line out of the driver's ~2 KB stdout-tail window. Logs OFF +
    // stop() first means nothing can print after us but sbt's one
    // [success] line.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
  }
}
