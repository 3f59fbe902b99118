package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the canonical time-series enrichment the reference
  * lacks entirely (SURVEY.md §2.4 "joins": ABSENT; the closest it gets is
  * consumer-side event-time lag, `/root/reference/src/tests/integration_test.rs:257-270`).
  *
  * For every left row, attach the latest right row whose time is <= the
  * left row's time, per key.
  *
  * Scale design (100 TB): the naive formulation (theta-join + row_number)
  * explodes to |L|x|R| pairs per key before pruning. Instead we tag and
  * UNION the two sides, shuffle ONCE on the key, sort each key's rows by
  * (time, side, tiebreak) inside the partition, and carry the most recent
  * right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding running frame. Cost: one shuffle + one sort of
  * |L|+|R| rows, zero row amplification — the same plan shape a dedicated
  * ASOF JOIN physical operator would produce. Skewed keys behave like any
  * window over a hot key (AQE-visible, saltable by time-chunking).
  */
object AsOfJoin {

  /** @param keys      (leftKeyCol, rightKeyCol) equi-key pairs
    * @param leftTime  left event-time column name (orderable; same type as right)
    * @param rightTime right event-time column name
    * @param carry     (rightCol, outputName) right-side payload to attach
    * @param rightTieBreak right columns ordering the winner among right rows
    *                      with identical (key, time) — last in ascending
    *                      order wins, making the result deterministic
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {

    val lCols = left.columns.toSeq
    val keyL = keys.map(_._1)
    val tCol = "__asof_t"; val sideCol = "__asof_side"; val rCol = "__asof_r"
    val rtField = "__asof_rt"
    val tieCols = rightTieBreak.indices.map(i => s"__asof_tie$i")

    // the matched right time rides inside the payload so a tolerance can
    // null out matches that are too far in the past
    val payload = struct(
      (carry.map { case (c, out) => col(c).as(out) } :+
        col(rightTime).as(rtField)): _*)
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    // Equi/ordering semantics: right rows with NULL keys OR a NULL time
    // can never match (SQL: NULL = x and NULL <= x are both unknown), so
    // drop them up front — Window.partitionBy groups NULL keys together
    // and NULLS-FIRST ordering would otherwise carry a NULL-time row's
    // payload onto left rows that have no real match.
    val rightNonNull = (keys.map { case (_, rk) => col(rk).isNotNull } :+
      col(rightTime).isNotNull).reduce(_ && _)
    // Right rows are re-keyed to the left's column names so one window
    // partitioning covers both sides; non-key left columns become typed
    // nulls (never read back — right rows are filtered out at the end).
    val rPart = right.filter(rightNonNull).select(
      keys.map { case (lk, rk) => col(rk).as(lk) } ++
        lCols.filterNot(keyL.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as(tCol), lit(0).as(sideCol), payload.as(rCol)) ++
        rightTieBreak.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__asof_tie$i") }: _*)

    val rTieTypes = rightTieBreak.map(right.schema(_).dataType)
    val lPart = left.select(
      lCols.map(col) ++
        Seq(col(leftTime).as(tCol), lit(1).as(sideCol),
          lit(null).cast(rPart.schema(rCol).dataType).as(rCol)) ++
        rTieTypes.zipWithIndex.map { case (t, i) =>
          lit(null).cast(t).as(s"__asof_tie$i") }: _*)

    // side asc: at equal times the right row sorts before the left row, so
    // a right row stamped exactly at the left time qualifies (<= semantics).
    val w = Window
      .partitionBy(keyL.map(col): _*)
      .orderBy((Seq(col(tCol).asc, col(sideCol).asc) ++
        tieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lPart.unionByName(rPart)
      .withColumn(rCol, last(col(rCol), ignoreNulls = true).over(w))
      .filter(col(sideCol) === 1)
    // tolerance: a match older than `tolerance` time units is no match
    // (numeric time columns only — epoch ms/ns/µs)
    val inRange = tolerance match {
      case Some(tol) =>
        col(rCol).isNotNull &&
          col(tCol) - col(rCol).getField(rtField) <= tol
      case None => col(rCol).isNotNull
    }
    carried.select(lCols.map(col) ++
      carry.map { case (_, out) =>
        when(inRange, col(rCol).getField(out)).otherwise(lit(null))
          .as(out) }: _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * time >= the left time, per key. Implemented by running `backward`
    * over negated time axes (numeric time columns only); among right rows
    * at the same (key, time), the largest tiebreak wins, matching
    * `backward`'s convention. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    val nl = "__asof_negl"; val nr = "__asof_negr"
    backward(
        left.withColumn(nl, -col(leftTime)),
        right.withColumn(nr, -col(rightTime)),
        keys, nl, nr, carry, rightTieBreak, tolerance)
      .drop(nl)
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): for
    * every left row, the right row closest in time on EITHER side, per
    * key; equidistant candidates resolve to the backward (past) match —
    * the causality-friendly tie. Composed as backward ∘ forward (two
    * single-shuffle passes, still zero row amplification); the per-row
    * side choice is a null-safe CASE on the two matched times (numeric
    * time columns only). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val bt = "__asof_bt"; val ft = "__asof_ft"
    val bCarry = carry.map { case (c, out) => c -> s"__asof_b_$out" }
    val fCarry = carry.map { case (c, out) => c -> s"__asof_f_$out" }
    val withB = backward(left, right, keys, leftTime, rightTime,
      bCarry :+ (rightTime -> bt), rightTieBreak)
    val withBF = forward(withB, right, keys, leftTime, rightTime,
      fCarry :+ (rightTime -> ft), rightTieBreak)
    // backward wins when forward is absent, or when both exist and the
    // past match is at least as close as the future one
    val useB = col(ft).isNull || (col(bt).isNotNull &&
      col(leftTime) - col(bt) <= col(ft) - col(leftTime))
    withBF.select(left.columns.map(col).toSeq ++
      carry.map { case (_, out) =>
        when(useB, col(s"__asof_b_$out")).otherwise(col(s"__asof_f_$out"))
          .as(out) } :+
      when(useB, col(leftTime) - col(bt))
        .otherwise(col(ft) - col(leftTime)).as("asof_gap"): _*)
  }
}
