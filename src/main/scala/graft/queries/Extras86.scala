package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Eighty-sixth coverage wave: classical seasonal decomposition and the
  * Pareto-frontier (skyline) operator.
  *
  *  - q264: additive seasonal decomposition of the hourly event-value
  *    series per event type — trend (centered 24-slot moving average),
  *    seasonal (per hour-of-day mean of the detrended series),
  *    remainder. Everything is INTEGER: hourly sums become exact cents
  *    via the decimal cast (values carry <= 2 true decimals, the Exact
  *    contract), the moving average and the seasonal mean are
  *    sum*1000 DIV count in a declared flooring order — so the whole
  *    decomposition hash-matches cross-engine with no float anywhere.
  *    Scale shape: one corpus-sized partial aggregate to hourly rows;
  *    both window passes run over the bounded (type x hour) series,
  *    never corpus rows.
  *  - q265: 2-D Pareto frontier per group (nation): customers not
  *    dominated in (acctbal, open-order count). Skyline membership is
  *    decided by two window statistics — max count over STRICTLY
  *    higher-acctbal rows (dense_rank + RANGE frame, so acctbal ties
  *    stay out of "strictly higher") and max count within the equal-
  *    acctbal group — no pair join, no NOT EXISTS at scale: one sort
  *    per nation decides every row. Identical-(acctbal, count)
  *    duplicates survive together (neither dominates, the textbook
  *    skyline contract). Oracle spells the same thing as the
  *    dominance anti-join to prove the window form EQUALS the
  *    definitional form.
  */
object Extras86 {

  private val one = lit(1)
  /** Centered moving-average span: 12 preceding + current + 11
    * following = 24 hourly slots. */
  private val Before = 12
  private val After = 11

  /** q264's oracle text — shared verbatim by the q267 streaming twin
    * (the q192/q193 pattern). */
  val SeasonalOracle: String =
    s"""WITH h AS (SELECT event_type,
       |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
       |    CAST(SUM(CAST(value AS DECIMAL(28,6)) * 100) AS BIGINT)
       |      AS vsum_c
       |  FROM events GROUP BY 1, 2),
       |tr AS (SELECT event_type, hr, vsum_c,
       |    CAST(SUM(vsum_c) OVER w * 1000 // COUNT(*) OVER w AS BIGINT)
       |      AS trend_milli
       |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr
       |    ROWS BETWEEN $Before PRECEDING AND $After FOLLOWING)),
       |dt AS (SELECT event_type, hr,
       |    CAST(hour(hr) AS BIGINT) AS hod, vsum_c, trend_milli,
       |    vsum_c * 1000 - trend_milli AS detr_milli FROM tr),
       |se AS (SELECT event_type, hod,
       |    CAST(SUM(detr_milli) // COUNT(*) AS BIGINT) AS seasonal_milli
       |  FROM dt GROUP BY 1, 2)
       |SELECT dt.event_type, hr, vsum_c, trend_milli, seasonal_milli,
       |  detr_milli - seasonal_milli AS remainder_milli
       |FROM dt JOIN se ON dt.event_type = se.event_type
       |  AND dt.hod = se.hod""".stripMargin

  /** Decomposition tail over the hourly (event_type, hr, vsum_c)
    * frame — bounded (types x hours), shared by batch q264 and the
    * streaming q267. */
  def seasonalTail(h: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import h.sparkSession.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"hr")
      .rowsBetween(-Before, After)
    // two-step so the DIV flooring order is declared: sum*1000 first,
    // floor-divide by the frame count second (the oracle's spelling)
    val tr = h
      .withColumn("sw", sum($"vsum_c").over(w))
      .withColumn("cw", count(one).over(w))
      .select($"event_type", $"hr", $"vsum_c",
        expr("sw * 1000 DIV cw").as("trend_milli"))
      .withColumn("hod", hour($"hr").cast(LongType))
      .withColumn("detr_milli", $"vsum_c" * 1000 - $"trend_milli")
    val se = tr.groupBy($"event_type".as("et2"), $"hod".as("hod2"))
      .agg(expr("SUM(detr_milli) DIV COUNT(*)").as("seasonal_milli"))
    tr.join(se, $"event_type" === $"et2" && $"hod" === $"hod2")
      .select($"event_type", $"hr", $"vsum_c", $"trend_milli",
        $"seasonal_milli",
        ($"detr_milli" - $"seasonal_milli").as("remainder_milli"))
  }

  val all: Seq[Qry] = Seq(

    // ---- additive seasonal decomposition ---------------------------------
    Qry(
      "q264_seasonal_decompose",
      SeasonalOracle) { (spark, dir) =>
      import spark.implicits._
      seasonalTail(Tables(spark, dir).events
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vsum_c")))
    },

    // ---- per-group 2-D Pareto frontier (skyline) --------------------------
    Qry(
      "q265_pareto_skyline",
      s"""WITH cnt AS (SELECT c_custkey, c_nationkey, c_acctbal,
         |    CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
         |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         |  GROUP BY 1, 2, 3)
         |SELECT c_nationkey, c_custkey, c_acctbal, n_orders
         |FROM cnt r
         |WHERE NOT EXISTS (SELECT 1 FROM cnt s
         |  WHERE s.c_nationkey = r.c_nationkey
         |    AND s.c_acctbal >= r.c_acctbal AND s.n_orders >= r.n_orders
         |    AND (s.c_acctbal > r.c_acctbal OR s.n_orders > r.n_orders))"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val cnt = tt.customer
        .join(tt.orders, $"o_custkey" === $"c_custkey", "left")
        .groupBy($"c_custkey", $"c_nationkey", $"c_acctbal")
        .agg(count($"o_orderkey").as("n_orders"))
      // strictly-higher-acctbal rows via dense_rank + RANGE frame: the
      // frame sees every row whose rank is <= grp-1, i.e. acctbal
      // strictly greater; equal-acctbal rivals are m2
      val wr = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc)
      val wg = Window.partitionBy($"c_nationkey").orderBy($"grp")
        .rangeBetween(Window.unboundedPreceding, -1)
      val we = Window.partitionBy($"c_nationkey", $"c_acctbal")
      cnt.withColumn("grp", dense_rank().over(wr))
        .withColumn("m1", max($"n_orders").over(wg))
        .withColumn("m2", max($"n_orders").over(we))
        .filter(($"m1".isNull || $"n_orders" > $"m1") &&
          $"n_orders" === $"m2")
        .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"n_orders")
    }
  )
}
