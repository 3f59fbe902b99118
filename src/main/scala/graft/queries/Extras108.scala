package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Hundred-eighth coverage wave: the privacy-release tier — the audit
  * a dataset clears before rows about PEOPLE leave the warehouse
  * (beside q151's PII scrub, which redacts values; these measure
  * re-identification risk from the values that remain).
  *
  *  - q302: k-anonymity / l-diversity audit. Quasi-identifier =
  *    (nation, account-balance band); sensitive attribute = market
  *    segment. For k ∈ {2, 5, 10}: how many QI groups fall below k,
  *    how many ROWS they expose (re-identification risk is carried by
  *    rows, not groups), in ppm of the corpus — plus the
  *    attribute-disclosure column pair: groups where every member
  *    shares one sensitive value (l = 1), which k-anonymity alone
  *    never flags. All exact integers; the balance band shifts cents
  *    positive before dividing so Spark's truncating DIV and DuckDB's
  *    flooring // agree on negative balances by construction.
  *  - q303: the generalization ladder — the Mondrian-style decision
  *    table: three release candidates (fine bands, coarse bands,
  *    nation suppressed) scored by remaining utility (distinct QI
  *    groups) against residual risk (rows in groups below k=5). The
  *    table IS the choice a release owner makes: each rung trades
  *    groups for exposed rows, measured, not asserted.
  *
  *    Scale shape (both): one partial-aggregated groupBy per QI
  *    choice collapses the corpus to the QI-group table (bounded by
  *    QI cardinality — nations × bands); every k/level computation
  *    runs over that table. No window over corpus rows, no join of
  *    the corpus to itself.
  */
object Extras108 {

  private val one = lit(1)

  /** Balance band width in cents (1000 currency units). */
  private val BandW = 100000L
  /** Shift making every TPC-H balance-cents value positive (min is
    * -999.99 => -99999 cents). */
  private val Shift = 100000L
  private val Ks = Seq(2, 5, 10)
  /** q303 risk threshold. */
  private val K = 5

  val all: Seq[Qry] = Seq(

    // ---- k-anonymity / l-diversity audit -----------------------------------
    Qry(
      "q302_k_anonymity", {
        val kRows = Ks.map(k => s"($k)").mkString(", ")
        s"""WITH q AS (SELECT c_nationkey AS nat,
           |    (CAST(round(c_acctbal * 100) AS BIGINT) + $Shift)
           |      // $BandW AS band,
           |    c_mktsegment AS sens
           |  FROM customer),
           |g AS (SELECT nat, band, CAST(COUNT(*) AS BIGINT) AS sz,
           |    CAST(COUNT(DISTINCT sens) AS BIGINT) AS l
           |  FROM q GROUP BY 1, 2),
           |tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_groups,
           |    CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS homog_groups,
           |    CAST(SUM(CASE WHEN l = 1 THEN sz ELSE 0 END) AS BIGINT)
           |      AS homog_rows
           |  FROM g),
           |ks(k) AS (VALUES $kRows)
           |SELECT CAST(k AS BIGINT) AS k, tot.n_rows, tot.n_groups,
           |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
           |    AS groups_below,
           |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
           |    AS rows_below,
           |  CAST(1000000 * SUM(CASE WHEN sz < k THEN sz ELSE 0 END)
           |    // tot.n_rows AS BIGINT) AS rows_below_ppm,
           |  tot.homog_groups, tot.homog_rows
           |FROM g, ks, tot
           |GROUP BY 1, 2, 3, 7, 8""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val q = Tables(spark, dir).customer.select(
        $"c_nationkey".as("nat"),
        expr(s"(CAST(round(c_acctbal * 100) AS BIGINT) + $Shift)" +
          s" DIV $BandW").as("band"),
        $"c_mktsegment".as("sens"))
      val g = q.groupBy($"nat", $"band")
        .agg(count(one).as("sz"), countDistinct($"sens").as("l"))
      val tot = g.agg(sum($"sz").as("n_rows"), count(one).as("n_groups"),
        sum(when($"l" === 1, 1L).otherwise(0L)).as("homog_groups"),
        sum(when($"l" === 1, $"sz").otherwise(0L)).as("homog_rows"))
      g.crossJoin(broadcast(Ks.toDF("k")))
        .crossJoin(broadcast(tot))
        .groupBy($"k".cast(LongType).as("k"), $"n_rows", $"n_groups",
          $"homog_groups", $"homog_rows")
        .agg(sum(when($"sz" < $"k", 1L).otherwise(0L)).as("groups_below"),
          sum(when($"sz" < $"k", $"sz").otherwise(0L)).as("rows_below"))
        .select($"k", $"n_rows", $"n_groups", $"groups_below",
          $"rows_below",
          expr("1000000 * rows_below DIV n_rows").as("rows_below_ppm"),
          $"homog_groups", $"homog_rows")
    },

    // ---- generalization ladder ---------------------------------------------
    Qry(
      "q303_generalization_ladder",
      s"""WITH c AS (SELECT c_nationkey AS nat,
         |    CAST(round(c_acctbal * 100) AS BIGINT) + $Shift AS cshift
         |  FROM customer),
         |lv AS (
         |  SELECT 0 AS level, 'nation+band1k' AS qi,
         |      nat, cshift // $BandW AS band FROM c
         |  UNION ALL
         |  SELECT 1, 'nation+band10k', nat, cshift // ${BandW * 10}
         |    FROM c
         |  UNION ALL
         |  SELECT 2, 'band10k-only', CAST(-1 AS INTEGER),
         |      cshift // ${BandW * 10} FROM c),
         |g AS (SELECT level, qi, nat, band,
         |    CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM lv GROUP BY 1, 2, 3, 4),
         |tot AS (SELECT level, CAST(SUM(sz) AS BIGINT) AS n_rows
         |        FROM g GROUP BY 1)
         |SELECT g.level AS level, qi,
         |  CAST(COUNT(*) AS BIGINT) AS n_groups,
         |  CAST(SUM(CASE WHEN sz < $K THEN 1 ELSE 0 END) AS BIGINT)
         |    AS groups_below,
         |  CAST(SUM(CASE WHEN sz < $K THEN sz ELSE 0 END) AS BIGINT)
         |    AS rows_below,
         |  CAST(1000000 * SUM(CASE WHEN sz < $K THEN sz ELSE 0 END)
         |    // MAX(tot.n_rows) AS BIGINT) AS rows_below_ppm
         |FROM g JOIN tot ON g.level = tot.level
         |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val c = Tables(spark, dir).customer.select(
        $"c_nationkey".as("nat"),
        (round($"c_acctbal" * 100).cast(LongType) + Shift).as("cshift"))
      val lv = c.select(lit(0).as("level"), lit("nation+band1k").as("qi"),
          $"nat", expr(s"cshift DIV $BandW").as("band"))
        .unionByName(c.select(lit(1).as("level"),
          lit("nation+band10k").as("qi"), $"nat",
          expr(s"cshift DIV ${BandW * 10}").as("band")))
        .unionByName(c.select(lit(2).as("level"),
          lit("band10k-only").as("qi"), lit(-1).as("nat"),
          expr(s"cshift DIV ${BandW * 10}").as("band")))
      val g = lv.groupBy($"level", $"qi", $"nat", $"band")
        .agg(count(one).as("sz"))
      val tot = g.groupBy($"level".as("tlevel"))
        .agg(sum($"sz").as("n_rows"))
      g.join(broadcast(tot), $"level" === $"tlevel")
        .groupBy($"level".cast(LongType).as("level"), $"qi")
        .agg(count(one).as("n_groups"),
          sum(when($"sz" < K, 1L).otherwise(0L)).as("groups_below"),
          sum(when($"sz" < K, $"sz").otherwise(0L)).as("rows_below"),
          expr(s"1000000 * sum(CASE WHEN sz < $K THEN sz ELSE 0 END)" +
            " DIV max(n_rows)").as("rows_below_ppm"))
    }
  )
}
