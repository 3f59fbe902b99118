package graft

import org.apache.spark.sql.SparkSession

/** Session factory: one place for the engine's recommended configuration.
  *
  * Local runs parameterize parallelism via SPARK_GRAFT_CPUS; on a real
  * cluster the same settings apply minus `master` (spark-submit provides
  * it) — AQE re-plans shuffles at runtime (coalescing + skew-join
  * splitting), shuffle partitions start at the core count and AQE adjusts,
  * and the graft SQL functions ride in via extensions so every session
  * (including pure-SQL ones) sees them.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
