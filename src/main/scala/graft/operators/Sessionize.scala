package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign a session id per key, starting a new
  * session whenever the time since the previous event reaches `gapMs`
  * (inclusive: a session window is the half-open [t, t+gap), so an event
  * exactly `gapMs` after its predecessor falls outside it and opens a new
  * session). The batch analog of Structured Streaming's `session_window`
  * with identical gap semantics; the
  * reference has no windowing at all (SURVEY.md §2.4 "streaming: windows").
  *
  * Scale: one shuffle on the key, one in-partition sort; session ids come
  * from a running sum over session-start flags (no state beyond the sort).
  * Sessions cannot span keys, so partition-parallelism is perfect.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, ordered by time) to `df`.
    *
    * @param tieBreak extra ordering columns making the sort total when
    *                 timestamps can collide (determinism contract)
    */
  def byGap(
      df: DataFrame,
      keys: Seq[String],
      timeMs: String,
      gapMs: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(timeMs) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_t", lag(col(timeMs), 1).over(w))
      .withColumn("__new_s",
        when(col("__prev_t").isNull ||
          col(timeMs) - col("__prev_t") >= gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_s")).over(run))
      .drop("__prev_t", "__new_s")
  }
}
