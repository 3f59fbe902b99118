package graft

import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** The codegen'd vector kernels (functions.VecDot / VecDistSq) must be
  * drop-in replacements for the `aggregate(zip_with(...))` folds they
  * replaced: same ascending accumulation order (bit-identical doubles),
  * same null semantics (length mismatch → NULL, null element → NULL,
  * empty → 0.0), and genuinely codegen-capable (no CodegenFallback —
  * the entire point of the swap).
  */
class VecOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)

  test("kernel == fold, bit-identical, on awkward values") {
    // values chosen to make float addition order matter: if the kernel
    // accumulated in any other order the doubles would differ
    val df = Seq((
      Seq(1e16, 1.0, -1e16, 3.7, 0.1),
      Seq(2.0, 1e-9, 2.0, 1.0, 7.7))).toDF("a", "b")
    val r = df.select(
      Vectors.dot($"a", $"b").as("k"),
      foldDot($"a", $"b").as("f")).head()
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
      s"kernel ${r.getDouble(0)} != fold ${r.getDouble(1)}")
  }

  test("null semantics: length mismatch and null element → NULL; empty → 0") {
    val df = Seq(
      (1, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0))),           // length mismatch
      (2, Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(3.0), Some(4.0))), // null element
      (3, Seq.empty[Option[Double]], Seq.empty[Option[Double]])) // empty
      .toDF("id", "a", "b")
    val out = df.select($"id", Vectors.dot($"a", $"b").as("d"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1).isEmpty, "length mismatch must be NULL")
    assert(out(2).isEmpty, "null element must be NULL")
    assert(out(3).contains(0.0), "empty arrays must dot to 0.0")
  }

  test("kernels are not CodegenFallback and run inside WholeStageCodegen") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(
      classOf[graft.functions.VecDot]), "VecDot fell back")
    assert(!classOf[CodegenFallback].isAssignableFrom(
      classOf[graft.functions.VecDistSq]), "VecDistSq fell back")
    // a range source (not a pre-evaluated local relation, which would
    // constant-fold the whole projection into a LocalTableScan)
    val df = spark.range(1, 2)
      .select(expr("array(CAST(id AS DOUBLE), 2.0)").as("a"),
        expr("array(3.0, 4.0)").as("b"))
      .select(Vectors.dot($"a", $"b").as("d"),
        Vectors.distSq($"a", $"b").as("s"))
    // `*(n)` is the whole-stage-codegen marker in the executed plan's
    // string form; the vecdot projection must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vecdot") && l.trim.startsWith("*(")),
      s"vecdot projection left whole-stage codegen:\n$plan")
    val r = df.head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
  }
}
