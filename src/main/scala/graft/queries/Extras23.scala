package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Twenty-third coverage wave: rolling window statistics — trailing
  * correlation and log-return volatility per price series. */
object Extras23 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  // shared TOTAL order within a supplier's price series. The price is a
  // required tiebreak: the fixtures contain one (suppkey, shipdate,
  // orderkey, linenumber) collision with two different prices, and
  // (shipdate, orderkey, linenumber, extendedprice) is verified unique —
  // without it lag/frames pick engine-dependent neighbors.
  private val SeriesOrder =
    "l_shipdate, l_orderkey, l_linenumber, l_extendedprice"

  val all: Seq[Qry] = Seq(

    // ---- trailing 50-row rolling correlation ---------------------------
    // corr(quantity, price) over the last 50 observations per series —
    // the rolling-statistics family on one shuffle + one sorted window.
    // The inputs are 2-dp money, so both axes are quantized to an exact
    // BIGINT cent grid FIRST (q134's pattern) and all five moments are
    // plain long sums inside the frame: correlation is scale-invariant,
    // the integer moments are exact and bounded (|Σy²| ≤ 50·(1.1e7)² ≈
    // 6e15 ≪ 2^63; closed-form cross terms ≤ ~3e17 ≪ 2^63), and both
    // engines derive identical doubles from identical integers. This
    // replaced five DECIMAL(28,6) frame sums — decimal window
    // aggregation is interpreted (not codegen'd) and was 4x the cost of
    // the whole rest of the query (round-3 VERDICT: 20.8 s → the long
    // path benches ~3 s). Emitted rows are a deterministic 1-in-100
    // systematic sample of the series (full output would be
    // row-per-input; the sample keeps the gate artifact bounded without
    // changing what is computed).
    Qry(
      "q133_rolling_corr",
      s"""WITH g AS (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         |    l_extendedprice,
         |    CAST(round(l_quantity * 100) AS BIGINT) AS ix,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS iy
         |  FROM lineitem),
         |r AS (SELECT l_suppkey,
         |    row_number() OVER w AS rn,
         |    COUNT(*) OVER wf AS n,
         |    CAST(SUM(ix) OVER wf AS BIGINT) AS sx,
         |    CAST(SUM(iy) OVER wf AS BIGINT) AS sy,
         |    CAST(SUM(ix * ix) OVER wf AS BIGINT) AS sxx,
         |    CAST(SUM(iy * iy) OVER wf AS BIGINT) AS syy,
         |    CAST(SUM(ix * iy) OVER wf AS BIGINT) AS sxy
         |  FROM g
         |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY $SeriesOrder),
         |    wf AS (PARTITION BY l_suppkey ORDER BY $SeriesOrder
         |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
         |SELECT l_suppkey, rn, CAST(n AS BIGINT) AS n_obs,
         |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
         |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |    END, 6) AS roll_corr
         |FROM r WHERE rn % 100 = 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wOrd = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      val wf = wOrd.rowsBetween(-49, Window.currentRow)
      val r = t(spark, dir).lineitem
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_extendedprice",
          round($"l_quantity" * 100).cast("long").as("ix"),
          round($"l_extendedprice" * 100).cast("long").as("iy"))
        .select($"l_suppkey",
          row_number().over(wOrd).as("rn"),
          count(one).over(wf).as("n"),
          sum($"ix").over(wf).as("sx"),
          sum($"iy").over(wf).as("sy"),
          sum($"ix" * $"ix").over(wf).as("sxx"),
          sum($"iy" * $"iy").over(wf).as("syy"),
          sum($"ix" * $"iy").over(wf).as("sxy"))
      val denx = $"n" * $"sxx" - $"sx" * $"sx"
      val deny = $"n" * $"syy" - $"sy" * $"sy"
      r.filter($"rn" % 100 === 0)
        .select($"l_suppkey", $"rn", $"n".as("n_obs"),
          round(when(denx > 0 && deny > 0,
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              (sqrt(denx.cast("double")) * sqrt(deny.cast("double")))), 6)
            .as("roll_corr"))
    },

    // ---- log-return volatility per price series ------------------------
    // Population stddev of ln(p_t / p_{t-1}) per supplier — the
    // reference-domain risk metric. ln outputs are ARBITRARY doubles, and
    // casting those to DECIMAL diverges across engines (Spark rounds the
    // shortest decimal repr HALF_UP, DuckDB rounds the binary value —
    // observed one hit in 600k rows at sf0.1), so the returns are
    // quantized to an exact micro-grid first: ri = round(r·1e6) as
    // BIGINT. Integer comparisons against the exactly-representable .5
    // boundary agree bit-for-bit in both engines, the moments are exact
    // BIGINT sums, and the closed form is row-local double math.
    Qry(
      "q134_volatility",
      s"""WITH p AS (SELECT l_suppkey, l_extendedprice,
         |    lag(l_extendedprice) OVER (PARTITION BY l_suppkey
         |      ORDER BY $SeriesOrder) AS prev
         |  FROM lineitem),
         |rts AS (SELECT l_suppkey,
         |    CAST(round(ln(l_extendedprice / prev) * 1e6) AS BIGINT) AS ri
         |  FROM p WHERE prev IS NOT NULL),
         |m AS (SELECT l_suppkey, COUNT(*) AS n,
         |    CAST(SUM(ri) AS BIGINT) AS sx,
         |    CAST(SUM(ri * ri) AS BIGINT) AS sxx
         |  FROM rts GROUP BY 1)
         |SELECT l_suppkey, n AS n_returns,
         |  round(CASE WHEN n > 0
         |      AND CAST(sxx AS DOUBLE) / n
         |        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) >= 0
         |    THEN sqrt(CAST(sxx AS DOUBLE) / n
         |      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / 1e6
         |    END, 6) AS volatility
         |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      val rts = t(spark, dir).lineitem
        .select($"l_suppkey", $"l_extendedprice",
          lag($"l_extendedprice", 1).over(w).as("prev"))
        .filter($"prev".isNotNull)
        .select($"l_suppkey",
          round(log($"l_extendedprice" / $"prev") * lit(1e6))
            .cast("long").as("ri"))
      val m = rts.groupBy($"l_suppkey")
        .agg(count(one).as("n"), sum($"ri").as("sx"),
          sum($"ri" * $"ri").as("sxx"))
      val variance = $"sxx".cast("double") / $"n" -
        ($"sx".cast("double") / $"n") * ($"sx".cast("double") / $"n")
      m.select($"l_suppkey", $"n".as("n_returns"),
        round(when($"n" > 0 && variance >= 0, sqrt(variance) / lit(1e6)), 6)
          .as("volatility"))
    }
  )
}
