package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Keeping
  * the pair in one value prevents the two sides from drifting apart —
  * the driver hash-compares column-by-column after sorting columns by
  * name, so aliases must match exactly (see the builder contract).
  */
final case class Qry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Qry {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Qry =
    Qry(name, fn, Some(oracle))

  /** Non-SQL-expressible operator: driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Qry =
    Qry(name, fn, None)
}
