package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic ("oracle-exact") aggregate helpers.
  *
  * Floating-point SUM/AVG are order-dependent, and Spark's partial
  * aggregation order differs run-to-run and engine-to-engine, so a raw
  * `sum(double)` can never hash-match a DuckDB oracle bit-for-bit. The fix:
  * route every money-valued aggregate through an exact DECIMAL(28,6)
  * accumulator (order-independent; see `Money` below for the chosen
  * scale), then cast the final value back to
  * DOUBLE (a single deterministic rounding). Any *row-local* double
  * arithmetic before the cast (e.g. `price * (1 - discount)`) is identical
  * IEEE-754 in every engine, so the cast-to-decimal sees the same input on
  * both sides.
  *
  * This also scales: decimal hash-aggregation is codegen'd and
  * partial-aggregated map-side exactly like double sums; at 100 TB a
  * DECIMAL(28,6) sum promoted to DECIMAL(38,6) holds ~1e32 before
  * overflow.
  */
object Exact {
  // Scale 6, not 4: money values in the fixtures have ≤2 true decimals, so
  // products of three of them (price·(1−disc)·(1+tax)) have ≤6 — at scale 6
  // every such product is exactly representable and the double→decimal cast
  // never lands on a rounding midpoint (where Spark's HALF_UP-on-shortest-
  // repr and DuckDB's binary-scaled rounding disagree).
  // Precision 28 (not 18): the double→decimal cast NULLs on overflow in
  // non-ANSI Spark, which would silently drop any |value| ≥ 1e12 from a
  // sum; precision 28 raises the per-value bound to 1e22 while keeping
  // the same scale-6 rounding behavior on both engines.
  val Money: DecimalType = DecimalType(28, 6)

  /** Exact order-independent sum of a double expression, as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact average: decimal-sum / non-null count, one deterministic
    * double division at the end. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Money-rounded exact sum: round to 2 dp IN DECIMAL SPACE, then cast.
    * Needed once a scaled sum can exceed 2^53 (≈9e9 money units): the
    * 6-dp decimal→double cast is correctly-rounded in Spark but
    * double-rounded (int128→double→/1e6) in DuckDB, one ulp apart. The
    * decimal round is exact in both engines (HALF_UP == half-away-from-
    * zero on exact decimals; DuckDB's decimal CAST would TRUNCATE — use
    * round()), and the 2-dp numerator stays below 2^53 until ~9e13. */
  def dsum2(c: Column): Column =
    round(sum(c.cast(Money)), 2).cast(DoubleType)

  /** The matching DuckDB-side SQL fragments (kept next to the Scala so the
    * two can never drift). */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"
  def dsum2Sql(expr: String): String =
    s"CAST(round(SUM(CAST($expr AS DECIMAL(28,6))), 2) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"
}
