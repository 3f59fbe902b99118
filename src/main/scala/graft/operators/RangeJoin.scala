package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (range) join on an equi-key plus a time-range predicate —
  * absent from the reference (SURVEY.md §2.4 "joins": ABSENT).
  *
  * Pairs every left row with the right rows of the same key whose time
  * falls in [leftTime - beforeMs, leftTime + afterMs).
  *
  * Scale design (100 TB): a raw `l.key = r.key AND r.t BETWEEN ...` join
  * gives Catalyst only the equi-key to shuffle on, so one hot key degrades
  * to a per-key nested loop. We bucket both sides into fixed `bucketMs`
  * epoch buckets and explode ONLY the left side over the (bounded, known
  * at plan time) range of buckets its interval covers, turning the whole
  * predicate into an equi-join on (key, bucket) + a residual filter.
  * Amplification factor = (beforeMs+afterMs)/bucketMs + 2, chosen by the
  * caller to trade shuffle volume against join fan-in — the standard
  * bucketed interval-join plan (cf. Flink interval joins / range-join
  * hints). AQE sees plain shuffle-hash/sort-merge exchanges.
  */
object RangeJoin {

  /** Epoch-ms bucketed interval join; returns left columns + right columns
    * (right time/key renamed by the caller beforehand to avoid clashes).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTimeMs: String,
      rightTimeMs: String,
      beforeMs: Long,
      afterMs: Long,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0 && beforeMs >= 0 && afterMs >= 0)
    val lb = "__rj_bucket"; val rb = "__rj_rbucket"
    // integral DIV, not double `/`: double division rounds above 2^53,
    // which would mis-bucket ns-magnitude epochs and silently drop
    // matches at bucket edges (positive epochs → DIV == floor)
    val lExp = left.withColumn(lb,
      explode(sequence(
        expr(s"(`$leftTimeMs` - ${beforeMs}L) DIV ${bucketMs}L"),
        expr(s"(`$leftTimeMs` + ${afterMs}L) DIV ${bucketMs}L"))))
    val rBkt = right.withColumn(rb,
      expr(s"`$rightTimeMs` DIV ${bucketMs}L"))

    lExp.join(rBkt,
        col(lb) === col(rb) &&
          col(leftKey) === col(rightKey) &&
          col(rightTimeMs) >= col(leftTimeMs) - beforeMs &&
          col(rightTimeMs) < col(leftTimeMs) + afterMs)
      .drop(lb, rb)
  }
}
