package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * operator a 100 TB columnar store runs at write time so later scans
  * can skip files/row-groups on MORE THAN ONE column.
  *
  * A single-column sort gives perfect min/max pruning on that column and
  * none on any other; interleaving the bits of two normalized dimensions
  * gives every contiguous z-range a bounded rectangle in BOTH, so
  * per-file statistics stay tight on both and a predicate on either
  * column prunes. This is the same layout step Delta/Iceberg expose as
  * OPTIMIZE ZORDER; here it composes from public Spark primitives:
  * compute z as a native column expression, then
  * `repartitionByRange(z).sortWithinPartitions(z)` at write.
  *
  * The interleave is a STATICALLY UNROLLED expression tree (32 shift-and
  * terms OR-folded at plan-build time) — no UDF, no loop at runtime, the
  * whole thing lives inside WholeStageCodegen. `zOrderSql` emits the
  * same arithmetic as DuckDB SQL so the layout key is oracle-checkable
  * bit for bit.
  */
object ZOrder {

  val Bits = 16
  val MaxScaled: Long = (1L << Bits) - 1 // 65535

  /** Morton-interleave two pre-scaled [0, 65535] columns into a 32-bit
    * z-value: bit i of x lands at 2i, bit i of y at 2i+1. */
  def interleave16(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale a column into [0, 65535] given its global min and max
    * (single-row aggregate, broadcast back by the caller). `v - mn` is
    * non-negative by construction (mn IS the min), so truncating
    * division == floor. Domain: the column's span must stay below
    * 2^47 — (v-mn)*65535 must fit a long. Integer arithmetic throughout
    * so the DuckDB twin (scaleSql, `//`) lands on identical buckets;
    * a double-ratio formulation would be overflow-free but could
    * disagree with the oracle on bucket boundaries. */
  def scale16(v: Column, mn: Column, mx: Column): Column =
    ((v - mn) * MaxScaled / greatest(mx - mn, lit(1L))).cast("long")

  /** DuckDB twin of scale16 (`//` = integer floor division). */
  def scaleSql(v: String, mn: String, mx: String): String =
    s"((($v - $mn) * $MaxScaled) // greatest($mx - $mn, 1))"

  /** DuckDB twin of interleave16 over two pre-scaled expressions. */
  def interleaveSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
