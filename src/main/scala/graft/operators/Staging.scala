package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncating staging for iterative / self-joined pipelines, plus
  * the matching release primitive.
  *
  * Why staging exists at all: Catalyst does not recognize a self-join's
  * two sides as one subtree (no ReusedExchange), so an expensive upstream
  * pipeline referenced twice runs twice, and an iterative loop re-plans
  * and re-executes its whole history every round. Staging materializes
  * the frame once and hands downstream plans a leaf.
  *
  * Two modes, selected by `spark.graft.checkpointDir`:
  *
  *   - UNSET (default, local/bench): `localCheckpoint` — blocks live in
  *     executor storage (MEMORY_AND_DISK). Fast, no distributed-FS
  *     round-trip, but NOT failure-safe: lineage is discarded, so losing
  *     an executor loses blocks that can no longer be recomputed and the
  *     job dies. Acceptable on local[n] where executor == driver.
  *   - SET to a (distributed-FS) path: reliable `Dataset.checkpoint` —
  *     blocks are written as files under the dir, so executor loss
  *     degrades to a re-read, not job death. This is the required mode
  *     for the multi-hour 100 TB dedup/clustering jobs these operators
  *     exist for; the cost is one FS write + read per staged frame (and
  *     for lazy staging one extra compute of the staged plan, inherent
  *     to RDD checkpointing).
  *
  * Neither mode registers the plan in the session `CacheManager`
  * (`persist()` does, and every later query then pays plan
  * canonicalization against the cache during lookup — measured seconds
  * of driver time on wide-expression queries).
  *
  * Lifecycle: staged blocks are PINNED until released. A session running
  * many queries (Bench, Verify) must call `sweep` between queries, or
  * staged blocks accumulate for the session lifetime (measured as a
  * broad ~1.6x slowdown across 143 bench queries by round 3's judge).
  */
object Staging {

  /** Session conf key: when set, staging uses reliable checkpoints under
    * this directory (cluster mode); when unset, executor-local
    * checkpoints (local mode). */
  val ConfKey = "spark.graft.checkpointDir"

  // RDD ids this module itself staged — the ONLY ids sweep may release.
  // Unpersisting every persistent RDD in the session (the pre-round-5
  // behavior) silently degraded user cache()d frames and could break a
  // still-live lazily-staged frame (lineage truncated, blocks gone).
  private val stagedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Materialize `df` (now if `eager`, at first use otherwise) and
    * truncate its lineage. See the object doc for mode selection. */
  def stage(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    val out = spark.conf.getOption(ConfKey) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // first caller wins: setCheckpointDir mints a fresh UUID subdir
        // per call, so re-setting it per stage would scatter files
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
    out.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        stagedIds.add(l.rdd.id)
      case _ => ()
    }
    out
  }

  /** Conf key: target bytes per shuffle partition inside an iterated
    * loop's narrowed scope (default 64 MB — AQE's own advisory
    * partition size). Production tuning knob; the LOCAL default keeps
    * sf-fixture loops at the floor width, so bench numbers stay
    * comparable across rounds. */
  val LoopTargetBytesKey = "spark.graft.loop.targetPartitionBytes"

  /** Floor for [[loopShufflePartitions]]: sliver loops never narrow
    * below this (the r4-era measured sweet spot for label/rank tables
    * on the local fixtures — task-scheduling overhead dominates below
    * the floor's data volume anyway). */
  val LoopMinPartitions = 8

  /** DATA-PROPORTIONAL shuffle width for an iterated loop (guide
    * §2.1/§2.2): the loops narrow `spark.sql.shuffle.partitions` for
    * their per-round sliver exchanges, but a CONSTANT width is a
    * local-mode assumption — the same loop's per-round edge-sized
    * aggregates (PageRank's contribution groupBy, SCC/CC's neighbor
    * joins) would fan into that constant number of reducers at 100 TB.
    * Instead, size the width from the MEASURED bytes of the loop's
    * staged data-heavy frames: the frames are already eagerly
    * localCheckpointed, so their materialized block sizes are read
    * driver-side from the block manager (no extra Spark job), divided
    * by [[LoopTargetBytesKey]] and clamped to
    * [[[LoopMinPartitions]], 65536]. At fixture scale every loop frame
    * is far below one target block and the width sits at the floor
    * (bit-identical bench behavior); at 100x/100 TB the width grows
    * linearly with the staged bytes. AQE's partition coalescing still
    * applies BELOW the chosen width, so overshooting costs nothing
    * durable. Frames that are not staged leaves (or not yet
    * materialized) contribute 0 bytes — callers pass the eagerly
    * staged frames the loop actually re-joins every round. */
  def loopShufflePartitions(spark: SparkSession,
      staged: DataFrame*): Int = loopShuffleConf(spark, staged: _*)._1

  /** (width, sliverMode) for an iterated loop's narrowed scope.
    * sliverMode is true when the loop's staged data-heavy frames all
    * fit inside ONE target block: per-round jobs there are dominated
    * by fixed driver cost (planning + per-stage scheduling), and
    * AQE's stage-by-stage re-optimization is pure added latency — a
    * sliver shuffle has nothing to coalesce and nothing to skew-split.
    * Callers scope-disable AQE in sliver mode and restore it on exit;
    * past one target block (any real data volume, and always at
    * cluster scale) sliverMode is false and AQE stays on. */
  def loopShuffleConf(spark: SparkSession,
      staged: DataFrame*): (Int, Boolean) = {
    val target = spark.conf.getOption(LoopTargetBytesKey)
      .map(_.toLong).getOrElse(64L * 1024 * 1024).max(1L)
    // collect every staged leaf under the plan (projections/filters
    // over a staged frame still see their leaf's bytes); dedup by RDD
    // id so a self-joined leaf counts once
    val ids = staged.flatMap(_.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }).toSet
    val bytes = spark.sparkContext.getRDDStorageInfo
      .filter(i => ids.contains(i.id))
      .map(i => i.memSize + i.diskSize).sum
    val parts = math.ceil(bytes.toDouble / target).toLong
    (math.min(math.max(parts, LoopMinPartitions.toLong), 65536L).toInt,
      bytes < target)
  }

  /** Run `body` under the loop-scope shuffle configuration derived
    * from the staged frames ([[loopShuffleConf]]): data-proportional
    * `spark.sql.shuffle.partitions`, and AQE scope-disabled in sliver
    * mode (see above). Both settings are restored on exit, so the
    * caller's downstream plan keeps the session defaults. */
  def withLoopShuffle[T](spark: SparkSession, staged: DataFrame*)(
      body: => T): T = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val (parts, sliver) = loopShuffleConf(spark, staged: _*)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      if (sliver) spark.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** [[stage]] + attach a KNOWN row count as LogicalRDD statistics
    * (via `GraftSqlBridge.withKnownStats`), so downstream joins against
    * the staged frame get a real size estimate and Catalyst makes the
    * broadcast decision itself — no hand-placed `broadcast()` hint, and
    * the decision flips to shuffle automatically when the frame
    * outgrows `autoBroadcastJoinThreshold` at scale. Use in iterated
    * loops where the per-round sliver's cardinality is already known
    * (graph label/rank tables: one row per node). `release`/`sweep`
    * work unchanged — the stats wrapper shares the staged RDD. */
  def stageWithStats(df: DataFrame, rowCount: Long,
      eager: Boolean): DataFrame =
    org.apache.spark.sql.GraftSqlBridge.withKnownStats(
      stage(df, eager), rowCount)

  /** Release ONE staged frame's blocks (non-blocking). Matches only when
    * `staged` is directly the frame `stage` returned (its analyzed plan
    * is the checkpoint's LogicalRDD leaf itself) — derived frames are
    * deliberately not matched, so a caller can never release an upstream
    * staged frame it does not own. Dataset.unpersist is NOT equivalent:
    * it talks to the CacheManager, which never held checkpoint blocks.
    * No-op for reliable checkpoints (files, not executor blocks). */
  def release(staged: DataFrame): Unit =
    staged.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        stagedIds.remove(l.rdd.id)
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Release every RDD that THIS module staged (non-blocking). Call
    * between queries in long-lived sessions; safe because staged frames
    * are private to the query that built them — nothing holds a
    * reference across queries. RDDs persisted by anyone else (user
    * `cache()`, Spark internals) are untouched — sweeping them would
    * silently degrade frames this module does not own. Reliable-
    * checkpoint FILES are not deleted (they are the recovery story for
    * running jobs); the checkpoint dir is temp-scoped by its owner.
    *
    * Caveat (unchanged from the per-frame `release`): a LAZILY staged
    * frame that was never materialized before a sweep loses its blocks
    * AND its lineage — do not hold lazily-staged frames across sweeps. */
  def sweep(spark: SparkSession): Unit = {
    val persistent = spark.sparkContext.getPersistentRDDs
    val it = stagedIds.iterator()
    while (it.hasNext) {
      persistent.get(it.next()).foreach(_.unpersist(blocking = false))
      it.remove()
    }
  }
}
