package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one key carries a disproportionate share of the probe side, a
  * plain shuffle join sends that key's entire volume to one task. Salting
  * splits every probe key into `salts` sub-keys (deterministic hash of
  * the probe row, so routing is stable run-to-run) and replicates the
  * build side once per salt, so the hot key fans out over `salts` tasks.
  * Join RESULTS are identical to the unsalted join — each probe row
  * matches exactly the one build copy carrying its salt.
  *
  * Complements AQE's skew-join splitting (which handles sort-merge joins
  * post-shuffle); explicit salting also covers aggregations-after-join
  * and engines/plans AQE can't rewrite. Build-side replication cost is
  * `salts ×` the small side — keep the small side genuinely small.
  */
object SkewJoin {

  /** Inner equi-join `large.largeKey = small.smallKey` with salting.
    * Returns all columns of both sides (key columns from the large side).
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltCol = "__salt"
    // deterministic salt: hash of the whole probe row, stable across runs
    val saltedLarge = large.withColumn(saltCol,
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts)))
    val replicatedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
          saltedLarge(saltCol) === replicatedSmall(saltCol))
      .drop(saltCol)
  }
}
