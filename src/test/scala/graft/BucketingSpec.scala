package graft

import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffling both join sides into the same bucket
  * layout removes the exchange from the join entirely — the core
  * co-location technique for repeated fact-fact joins at 100 TB. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join plans without shuffle exchanges and matches results") {
    val n = 10000
    val facts = spark.range(n).select($"id".as("k"),
      ($"id" % 97).cast("double").as("v"))
    val dims = spark.range(n / 10).select($"id".as("k2"),
      concat(lit("name_"), $"id").as("name"))

    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k2").sortBy("k2")
      .saveAsTable("graft_dims_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-join path; with broadcast on, the planner ignores
    // bucketing entirely (the point of the test is the exchange-free SMJ)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), $"k" === $"k2")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")

      val expected = facts.join(dims, $"k" === $"k2").count()
      assert(joined.count() == expected && expected == (n / 10).toLong)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("salted join equals plain join on skewed data") {
    // 90% of probe rows carry one hot key
    val probe = spark.range(20000).select(
      when($"id" % 10 === 0, $"id" % 5).otherwise(lit(3L)).as("k"),
      ($"id" * 2).as("payload"))
    val build = spark.range(5).select($"id".as("bk"),
      concat(lit("dim_"), $"id").as("dname"))
    val salted = graft.operators.SkewJoin
      .saltedJoin(probe, build, "k", "bk", salts = 16)
      .groupBy($"dname").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val plain = probe.join(build, $"k" === $"bk")
      .groupBy($"dname").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    assert(salted.collect().toSet == plain.collect().toSet)
  }
}
