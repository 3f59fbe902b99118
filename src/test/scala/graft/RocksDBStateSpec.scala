package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming state on the RocksDB state store provider.
  *
  * The default (HDFS-backed in-memory) provider keeps every key's state
  * on the executor heap — at 100 TB a high-cardinality stateful query
  * (per-document dedup state, per-user sessions) OOMs. RocksDB spills
  * state to local disk with incremental checkpointing, making state size
  * disk-bounded instead of heap-bounded; this spec pins the provider
  * wiring so the scale path is known-good, not just documented. */
class RocksDBStateSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful aggregation carries state across batches on RocksDB") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Double)]
      val agg = input.toDS().toDF("k", "v")
        .groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName("rocks_agg").start()
      try {
        input.addData((1L, 1.0), (2L, 2.0), (1L, 3.0))
        q.processAllAvailable()
        input.addData((1L, 4.0), (3L, 5.0))
        q.processAllAvailable()
        // batch-2 result must merge batch-1 state (n=3 for key 1), which
        // only happens if the RocksDB store round-tripped it
        val rows = spark.table("rocks_agg").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(rows == Map(1L -> ((3L, 8.0)), 2L -> ((1L, 2.0)),
          3L -> ((1L, 5.0))))
        // and the run really used RocksDB, not a silent fallback: the
        // provider publishes rocksdb* custom metrics in query progress
        val metrics = q.lastProgress.stateOperators
          .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb state metrics reported (got ${metrics.toSeq})")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
