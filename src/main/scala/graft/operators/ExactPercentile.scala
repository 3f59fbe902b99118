package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact linear-interpolated percentile (the semantics of
  * SQL `percentile_cont` / Spark's built-in `percentile`), implemented
  * as an `Aggregator[Double, Seq[Double], Double]`.
  *
  * This is the reference's latency-percentile computation
  * (`/root/reference/src/tests/integration_test.rs:359-364`: sort the
  * samples, index at p) done as a distributed aggregate: partial buffers
  * accumulate per partition, merge concatenates, and one final
  * sort-and-interpolate runs per group.
  *
  * Scale caveat (by design, documented): the buffer holds the group's
  * values, so memory is O(group size) — correct for bounded groups
  * (per-key latency samples); for unbounded groups use
  * `approx_percentile` (t-digest) instead. The reference has the same
  * shape (it keeps every sample in RAM, `:337-357`).
  */
class ExactPercentile(p: Double)
    extends Aggregator[Double, Seq[Double], Double] with Serializable {
  require(p >= 0 && p <= 1)

  override def zero: Seq[Double] = Nil
  override def reduce(b: Seq[Double], a: Double): Seq[Double] = a +: b
  override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] = b1 ++ b2

  override def finish(buf: Seq[Double]): Double = {
    if (buf.isEmpty) return Double.NaN
    val s = buf.toArray
    java.util.Arrays.sort(s)
    val idx = p * (s.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) s(lo) else s(lo) + (idx - lo) * (s(hi) - s(lo))
  }

  override def bufferEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
