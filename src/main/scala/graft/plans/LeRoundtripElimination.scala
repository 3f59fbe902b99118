package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions._

/** Optimizer rule: eliminate wire-format roundtrips.
  *
  * `le_f64(le_encode_f64(x), 0)` is `x` — pipelines that pack fields into
  * the reference's record layout and immediately decode them (common when
  * a generic ingest stage feeds a typed analytic stage) otherwise pay two
  * codegen'd byte-buffer passes per field per row. The rewrite is exact:
  * decode-at-offset-0 of a single-field encoding returns precisely the
  * encoded value (same width, same endianness), including NaN bit
  * patterns for f64 (both sides move raw bits, not float semantics).
  *
  * u32 is the one asymmetric case: encode takes IntegerType, decode
  * returns unsigned LongType, so the rewrite must re-express the cast —
  * handled below with an explicit unsigned widening.
  *
  * Injected via `graft.functions.GraftExtensions` (injectOptimizerRule),
  * so any session using the extensions gets it for free.
  */
object LeRoundtripElimination extends Rule[LogicalPlan] {

  private val zero = Literal(0)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LeDecodeF64(LeEncodeF64(x), `zero`) => x
      case LeDecodeU64(LeEncodeU64(x), `zero`) => x
      case LeDecodeU32(LeEncodeU32(x), `zero`) =>
        // decode returns the value as an UNSIGNED long
        org.apache.spark.sql.catalyst.expressions.BitwiseAnd(
          org.apache.spark.sql.catalyst.expressions.Cast(x,
            org.apache.spark.sql.types.LongType),
          Literal(0xFFFFFFFFL))
      case LeDecodeU8(LeEncodeU8(x), `zero`) =>
        org.apache.spark.sql.catalyst.expressions.BitwiseAnd(
          x, Literal(0xFF))
    }
}
