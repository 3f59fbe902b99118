package graft

import org.apache.spark.sql.functions._

/** Pins the two runtime scale mechanisms the engine's 100 TB design
  * leans on but that no oracle query can surface at fixture scale:
  *
  *  - AQE skew-join splitting: the no-code-change answer to key skew
  *    (README "salting for skew, AQE for runtime re-plan"; q55 is the
  *    manual-salting alternative when AQE is off). Thresholds are
  *    shrunk so fixture-sized partitions qualify as "skewed" — on a
  *    real cluster the defaults (256 MB) do the same job.
  *  - Bloom-filter runtime filters: a selective dimension predicate is
  *    turned into a bloom filter applied on the fact side BEFORE the
  *    join shuffle — at 100 TB this is the difference between
  *    shuffling the full fact table and shuffling the matching sliver.
  *
  * Both assertions read the ADAPTIVE final plan, so they pin behavior,
  * not configuration intent.
  */
class ScaleRuntimeSpec extends SparkTestBase {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one pathological key owning ~90% of the left side
      val left = spark.range(0, 60000)
        .select(when($"id" < 54000, 0L).otherwise($"id" % 2000).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pad"))
      val right = spark.range(0, 2000).select($"id".as("k"),
        ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // materialize THIS Dataset (count() would plan a separate query
      // execution and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-split join in final plan:\n$finalPlan")
    }
  }

  test("a selective dim predicate becomes a bloom runtime filter on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dir = java.nio.file.Files.createTempDirectory("graft_bloom_")
      spark.range(0, 50000)
        .select($"id".as("k"), ($"id" % 97).as("v"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(0, 5000)
        .select($"id".as("k"), ($"id" % 13).as("cat"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 3)
      val joined = fact.join(dim, "k")
      assert(joined.count() > 0)
      // the injected filter renders as might_contain(subquery) over the
      // fact side, fed by a bloom_filter_agg subquery on the dim side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"expected a bloom runtime filter on the fact scan:\n$plan")
    }
  }
}
