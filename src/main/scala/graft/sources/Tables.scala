package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loaders over the driver-generated parquet directories
  * (see /root/repo/TESTDATA.md, /root/repo/FIXTURES.md §2).
  *
  * Design notes for scale (100 TB discipline):
  *   - Loaders return the raw `spark.read.parquet` DataFrame with no eager
  *     action; Catalyst prunes columns and pushes predicates into the scan,
  *     so callers `select`/`filter` freely without re-reading.
  *   - No caching here: at cluster scale the fact tables do not fit in
  *     memory; callers that genuinely reuse a small dim may cache it
  *     themselves (or rely on broadcast).
  */
final class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). We read nanos as a raw LONG
    * (`legacy.parquet.nanosAsLong`) and derive the µs TimestampType column
    * the rest of the engine uses, keeping the exact nanos in `ts_ns`
    * (SURVEY.md §7.4 "nanosecond timestamps"). Integer `DIV` — a double
    * division would lose precision above 2^53 ns. DuckDB's matching
    * conversion is `CAST(ts AS TIMESTAMP)` (ns → µs truncation).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load("events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns DIV 1000")))
  }

  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** Register every fixture as a temp view (for spark.sql entry points). */
  def registerAll(): Unit = {
    Tables.names.filterNot(_ == "events")
      .foreach(n => load(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
