package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Hundred-twenty-fourth coverage wave: Benford's-law conformity audit
  * — the fraud/synthetic-data screen on monetary amounts.
  *
  *  - q327: first-significant-digit distribution of order totals vs
  *    Benford's expectation P(d) = log₁₀(1+1/d). The nine expected
  *    frequencies are FIXED constants, so they enter both engines as
  *    identical integer-ppm literals (301030 … 45757, summing to
  *    exactly 10⁶) — no transcendental evaluated anywhere at query
  *    time. Per digit: observed count, observed ppm, expected ppm,
  *    and the chi-square-style deviation contribution
  *    (obs−exp)² DIV exp in ppm, plus the total deviation on a
  *    9-row window. Digits that never occur still appear (a 1–9
  *    spine left-joins the counts) — their full expected mass counts
  *    toward the deviation, as in q313's empty-cell rule. The
  *    fixture's totals span ~2 decades, so the audit reads a real
  *    (non-conforming — TPC-H prices are uniform-ish, one of
  *    Benford's own counterexamples) distribution, and the gate pins
  *    both engines computing that nonconformity identically.
  *
  * Scale shape: one corpus-sized first-digit groupBy (map-side
  * partial agg); the spine join and deviation run on 9 rows.
  */
object Extras124 {

  /** round(10⁶·log₁₀(1+1/d)) for d = 1..9; sums to exactly 10⁶. */
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  /** Oracle shared VERBATIM with the streaming twin q348. */
  private[queries] val BenfordOracle =
      s"""WITH d AS (SELECT CAST(substring(CAST(CAST(round(
         |      o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS BIGINT) AS digit FROM orders),
         |o AS (SELECT digit, COUNT(*) AS obs FROM d GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM d),
         |exp AS (${BenfordPpm.zipWithIndex.map { case (p, i) =>
             s"SELECT ${i + 1} AS digit, CAST($p AS BIGINT) AS exp_ppm"
           }.mkString(" UNION ALL ")}),
         |cell AS (SELECT exp.digit, COALESCE(o.obs, 0) AS obs,
         |    (1000000 * COALESCE(o.obs, 0)) // n.n AS obs_ppm,
         |    exp.exp_ppm
         |  FROM exp LEFT JOIN o ON o.digit = exp.digit CROSS JOIN n)
         |SELECT digit, CAST(obs AS BIGINT) AS obs,
         |  CAST(obs_ppm AS BIGINT) AS obs_ppm, exp_ppm,
         |  CAST(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) // exp_ppm
         |    AS BIGINT) AS dev_ppm,
         |  CAST(SUM(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm))
         |    // exp_ppm) OVER () AS BIGINT) AS total_dev_ppm
         |FROM cell""".stripMargin

  /** First significant digit of an order's total, as a column. */
  private[queries] def firstDigit = expr(
    "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) " +
      "AS STRING), 1, 1) AS BIGINT)")

  /** Benford tail over a (digit, obs) count table — shared verbatim
    * by q327 and the streaming twin q348. */
  private[queries] def benfordTail(o: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import o.sparkSession.implicits._
    val n = o.agg(sum($"obs").cast(LongType).as("n"))
    val exp = BenfordPpm.zipWithIndex
        .map { case (p, i) => ((i + 1).toLong, p) }
        .toDF("digit", "exp_ppm")
      exp.join(o, Seq("digit"), "left_outer")
        .crossJoin(broadcast(n))
        .select($"digit",
          coalesce($"obs", lit(0L)).cast(LongType).as("obs"),
          expr("(1000000 * COALESCE(obs, 0)) DIV n").as("obs_ppm"),
          $"exp_ppm")
        .withColumn("dev_ppm",
          expr("CAST(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) " +
            "DIV exp_ppm AS BIGINT)"))
        .withColumn("total_dev_ppm",
          expr("CAST(SUM(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) " +
            "DIV exp_ppm) OVER () AS BIGINT)"))
  }

  val all: Seq[Qry] = Seq(

    Qry("q327_benford_audit", BenfordOracle) { (spark, dir) =>
      import spark.implicits._
      benfordTail(Tables(spark, dir).orders
        .select(firstDigit.as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("obs")))
    }
  )
}
