package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Whole-stage-codegen'd vector kernels for `array<double>` columns.
  *
  * Why these exist: Spark's higher-order functions (`zip_with` +
  * `aggregate`, what [[graft.operators.Vectors]] used through round 10)
  * are `CodegenFallback` — the lambda fold evaluates INTERPRETED over
  * InternalRow inside the generated stage, boxing an accumulator per
  * element. These expressions generate a tight primitive loop instead,
  * keeping the ANN hot path (brute-force cosine, IVF assignment, PQ
  * encode/LUT) inside whole-stage codegen.
  *
  * Determinism contract (the reason the fold order is pinned): the loop
  * accumulates ASCENDING, `acc + x(i)*y(i)` — exactly the evaluation
  * order of `aggregate(zip_with(x, y, (a,b) => a*b), 0.0, _+_)` and of
  * DuckDB's `list_reduce(list_prepend(0.0, list_transform(...)))`, so
  * swapping the kernels in changed NO query result (the 277-query gate
  * re-verified bit-identical after the swap).
  *
  * Null semantics mirror the fold they replace: arrays of different
  * lengths → NULL (zip_with pads with null, the fold poisons), any null
  * element → NULL, both empty → 0.0 (the fold's init).
  */
abstract class VecFold extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {
  // no explicit Seq[AbstractDataType] ascription: the type is
  // private[sql]; the inferred Seq[ArrayType] conforms covariantly
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one accumulation term given element exprs. */
  protected def termJava(x: String, y: String): String
  /** Scala accumulation term. */
  protected def termEval(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += termEval(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc = $acc + (${termJava(s"$a.getDouble($i)",
                s"$b.getDouble($i)")});
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Sequential-fold dot product: Σ x(i)·y(i). */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecDot = copy(left = l, right = r)
}

/** Sequential-fold squared Euclidean distance: Σ (x(i)−y(i))². */
case class VecDistSq(left: Expression, right: Expression) extends VecFold {
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecDistSq = copy(left = l, right = r)
}
