package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-twenty-seventh coverage wave: seasonality-adjusted robust
  * anomaly detection — the monitoring rung plain MAD (q295) and CUSUM
  * (q170) lack: a Saturday-night lull is only anomalous against the
  * Saturday-night baseline.
  *
  *  - q331: hourly event volumes judged against their OWN
  *    (day-of-week, hour) cell: baseline = the exact LOW MEDIAN of
  *    that cell's daily counts across the corpus's days, spread = the
  *    low median of absolute deviations (MAD), flag when
  *    10⁴·|n−med| > 44478·mad — the q295 trick folding the 3×1.4826
  *    normal-consistency threshold into ONE integer comparison. All
  *    order statistics are exact (row_number with (value, date)
  *    tie-breaks picks the identical element in both engines); zero
  *    floating point.
  *
  *  - q332: the same monitor as a STREAM — the (date, dow, hour)
  *    daily cell counts are a complete-mode streaming aggregation;
  *    baseline, MAD and flags run post-sink over the
  *    calendar-bounded cell table through the same tail function and
  *    oracle text. The deployment shape: the seasonal profile
  *    re-derives continuously from bounded state.
  *
  * Scale shape: ONE corpus-sized count groupBy; medians/MAD/flags run
  * over the calendar-bounded cell table (days × 24 rows per key
  * population), windows partitioned by (dow, hour).
  */
object Extras127 {

  /** Oracle shared VERBATIM by q331 (batch) and q332 (stream). */
  private val SeasonalOracle =
    """WITH c AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
      |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |r AS (SELECT d, dow, hr, n,
      |    row_number() OVER (PARTITION BY dow, hr ORDER BY n, d) AS rn,
      |    COUNT(*) OVER (PARTITION BY dow, hr) AS cnt FROM c),
      |med AS (SELECT dow, hr, n AS med FROM r WHERE rn = (cnt + 1) // 2),
      |dev AS (SELECT r.d, r.dow, r.hr, r.n, med.med,
      |    abs(r.n - med.med) AS ad FROM r JOIN med
      |    ON med.dow = r.dow AND med.hr = r.hr),
      |dr AS (SELECT d, dow, hr, n, med, ad,
      |    row_number() OVER (PARTITION BY dow, hr ORDER BY ad, d) AS rn,
      |    COUNT(*) OVER (PARTITION BY dow, hr) AS cnt FROM dev),
      |mad AS (SELECT dow, hr, ad AS mad FROM dr
      |        WHERE rn = (cnt + 1) // 2)
      |SELECT dev.d, dev.dow, dev.hr, CAST(dev.n AS BIGINT) AS n,
      |  CAST(dev.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
      |  CASE WHEN 10000 * dev.ad > 44478 * mad.mad THEN 1 ELSE 0 END
      |    AS anom
      |FROM dev JOIN mad ON mad.dow = dev.dow AND mad.hr = dev.hr"""
      .stripMargin

  /** Baseline/MAD/flag tail over (d, dow, hr, n) daily cell counts —
    * shared verbatim by q331 and the streaming twin q332. */
  private[graft] def seasonalTail(cells: DataFrame): DataFrame = {
    val byCell = Window.partitionBy(col("dow"), col("hr"))
    val r = cells
      .withColumn("rn", row_number().over(byCell.orderBy(col("n"),
        col("d"))))
      .withColumn("cnt", count(lit(1)).over(byCell))
    val med = r.filter(expr("rn = (cnt + 1) DIV 2"))
      .select(col("dow").as("mdow"), col("hr").as("mhr"),
        col("n").as("med"))
    val dev = r.select(col("d"), col("dow"), col("hr"), col("n"))
      .join(med, col("dow") === col("mdow") && col("hr") === col("mhr"))
      .withColumn("ad", abs(col("n") - col("med")))
    val dr = dev
      .withColumn("rn", row_number().over(byCell.orderBy(col("ad"),
        col("d"))))
      .withColumn("cnt", count(lit(1)).over(byCell))
    val mad = dr.filter(expr("rn = (cnt + 1) DIV 2"))
      .select(col("dow").as("xdow"), col("hr").as("xhr"),
        col("ad").as("mad"))
    dev.join(mad, col("dow") === col("xdow") && col("hr") === col("xhr"))
      .select(col("d"), col("dow"), col("hr"),
        col("n").cast(LongType).as("n"),
        col("med").cast(LongType).as("med"),
        col("mad").cast(LongType).as("mad"),
        when(lit(10000) * col("ad") > lit(44478) * col("mad"), 1)
          .otherwise(0).as("anom"))
  }

  /** Daily (date, iso-dow, hour) cell counts — the 1=Monday mapping
    * matching DuckDB's isodow (q142's convention). */
  private def dailyCells(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("d"),
        (((dayofweek(col("ts")) + 5) % 7) + 1).cast(LongType).as("dow"),
        hour(col("ts")).cast(LongType).as("hr"))
      .agg(count(lit(1)).as("n"))

  val all: Seq[Qry] = Seq(

    Qry("q331_seasonal_anomaly", SeasonalOracle) { (spark, dir) =>
      seasonalTail(dailyCells(Tables(spark, dir).events))
    },

    Qry("q332_stream_seasonal_anomaly", SeasonalOracle) { (spark, dir) =>
      val cells = dailyCells(Streams.fileStream(spark, dir, "events"))
      seasonalTail(Streams.runToMemory(cells, "complete"))
    }
  )
}
