package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._

/** Moment-based statistics operators: linear regression, z-score outlier
  * detection, and EWMA smoothing — the analytics a monitoring/curation
  * pipeline runs over a metric stream (the reference's per-consumer
  * analytics generalized; its own surface stops at min/max/mean,
  * `/root/reference/src/tests/integration_test.rs:250-266`).
  *
  * Scale + determinism design (100 TB discipline):
  *   - All second-order moments (Σx, Σy, Σx², Σy², Σxy) accumulate in
  *     DECIMAL(28,6) (`Exact.dsum`): order-independent, partial-aggregable
  *     map-side, codegen'd — ONE pass over the fact table, no per-group
  *     state beyond six accumulators.
  *   - The closed-form fit/σ arithmetic happens on the tiny per-group
  *     result (row-local double math, identical IEEE-754 in any engine) —
  *     never on the fact stream. Built-in `regr_slope`/`corr`/`stddev`
  *     would accumulate doubles in partition order and cannot be
  *     reproduced bit-for-bit by an oracle.
  *   - Join-back of group stats onto the fact scan is an explicit
  *     broadcast: group cardinality is assumed dim-sized.
  */
object Stats {

  /** Per-group OLS fit of `y` on `x`: one decimal-exact moment pass, then
    * closed-form `slope`, `intercept`, `r2` (all unrounded doubles —
    * callers emitting gate-checked output round at a fixed precision).
    * Groups where x (or y, for r2) is constant yield null fits. */
  def linearFit(df: DataFrame, x: Column, y: Column,
      keys: Seq[Column]): DataFrame = {
    val m = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"),
        dsum(x * y).as("sxy"))
    // expression trees below are mirrored verbatim in the q81 oracle SQL —
    // keep the parenthesization identical on any change. Degenerate
    // groups (constant x, constant y) are guarded: ANSI mode (Spark 4
    // default) turns the 0-denominator division into a runtime error,
    // so the guard yields SQL-null fits instead of failing the job.
    val sxxDen = col("n") * col("sxx") - col("sx") * col("sx")
    val syyDen = col("n") * col("syy") - col("sy") * col("sy")
    m.withColumn("slope",
        when(sxxDen =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / sxxDen))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .withColumn("r2",
        when(sxxDen * syyDen =!= 0,
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            (sxxDen * syyDen)))
      .drop("sx", "sy", "sxx", "syy", "sxy")
  }

  /** Rows whose `valueCol` deviates more than `threshold` population
    * standard deviations from their group's mean, with the z-score
    * appended as `z` (unrounded). Group stats are one moment pass,
    * broadcast back onto the scan — the fact table is read exactly twice
    * and never shuffled. */
  def zscoreOutliers(df: DataFrame, keyCol: String, valueCol: String,
      threshold: Double): DataFrame = {
    val v = col(valueCol)
    val st = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__n"), dsum(v).as("__sx"),
        dsum(v * v).as("__sxx"))
      .select(col("__k"), (col("__sx") / col("__n")).as("__mu"),
        sqrt(col("__sxx") / col("__n") -
          (col("__sx") / col("__n")) * (col("__sx") / col("__n")))
          .as("__sigma"))
    // σ = 0 (constant group) must yield zero outliers, not a
    // DIVIDE_BY_ZERO job failure under ANSI mode — the when() guard
    // evaluates the division only when σ > 0, and a null z fails the
    // threshold filter
    df.join(broadcast(st), col(keyCol) === col("__k"))
      .withColumn("z",
        when(col("__sigma") > 0, (v - col("__mu")) / col("__sigma")))
      .filter(abs(col("z")) > threshold)
      .drop("__k", "__mu", "__sigma")
  }

  /** Finite-kernel EWMA: weighted average of the last `taps` values with
    * geometric weights `alpha^i`, appended as `ewma`. Only rows with a
    * complete kernel (the `taps`-th and later per key) are returned, so
    * the result is well-defined without partial-kernel renormalization.
    * One window pass; weights are plain literals and the summation order
    * is fixed by the fold, so the double result is deterministic. */
  def ewma(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      valueCol: String, alpha: Double, taps: Int): DataFrame = {
    require(taps >= 1 && alpha > 0,
      s"need taps >= 1 (got $taps) and alpha > 0 (got $alpha)")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val v = col(valueCol)
    val weighted = (1 until taps).foldLeft(v) { (acc, i) =>
      acc + lit(math.pow(alpha, i)) * lag(v, i).over(w)
    }
    val norm = (0 until taps).map(math.pow(alpha, _)).sum
    // ewma must be computed BEFORE the kernel-completeness filter: lag()
    // over the filtered frame would shift past the removed warm-up rows
    df.withColumn("__rn", row_number().over(w))
      .withColumn("ewma", weighted / lit(norm))
      .filter(col("__rn") >= taps)
      .drop("__rn")
  }
}
