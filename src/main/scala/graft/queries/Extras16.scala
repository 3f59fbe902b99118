package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.TextOps
import graft.sources.Tables

/** Sixteenth coverage wave: robust statistics (MAD), Zipf-law fit,
  * interval-union coverage, bitwise aggregates, and the LATERAL SQL
  * surface. */
object Extras16 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- median / MAD robust outlier detection -------------------------
    // Median absolute deviation per event type, then count values beyond
    // 3 MADs — the robust cousin of q82's z-score sweep. Both medians are
    // partition-only window aggregates (exact percentile; the two windows
    // share one shuffle). Both engines interpolate quantile_cont as
    // lo + (hi-lo)·frac on identical doubles, and emitted medians are
    // rounded to 6 dp per the playbook.
    Qry(
      "q112_mad_outliers",
      """WITH m AS (SELECT event_type, value,
        |    quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS med
        |  FROM events),
        |d AS (SELECT event_type, value, med, abs(value - med) AS dev,
        |    quantile_cont(abs(value - med), 0.5)
        |      OVER (PARTITION BY event_type) AS mad
        |  FROM m)
        |SELECT event_type, COUNT(*) AS n,
        |  round(MAX(med), 6) AS median, round(MAX(mad), 6) AS mad,
        |  CAST(SUM(CASE WHEN dev > mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wp = Window.partitionBy($"event_type")
      t(spark, dir).events
        .select($"event_type", $"value")
        .withColumn("med", percentile($"value", lit(0.5)).over(wp))
        .withColumn("dev", abs($"value" - $"med"))
        .withColumn("mad", percentile($"dev", lit(0.5)).over(wp))
        .groupBy($"event_type")
        .agg(count(one).as("n"), round(max($"med"), 6).as("median"),
          round(max($"mad"), 6).as("mad"),
          sum(when($"dev" > $"mad" * 3, 1L).otherwise(0L)).as("n_outliers"))
    },

    // ---- Zipf-law slope over the token frequency spectrum --------------
    // ln(count) ~ ln(rank) least squares over the top-200 tokens: the
    // corpus-health check (natural text ≈ −1). Top-k is a bounded
    // TakeOrdered (vocabulary ≪ corpus); the regression moments are
    // decimal-accumulated per q81's pattern so no FP-summation drift.
    Qry(
      "q113_zipf_slope",
      s"""WITH ${TextOps.oracleToksCte},
         |cnt AS (SELECT tok, COUNT(*) AS c
         |  FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
         |top AS (SELECT tok, c,
         |    row_number() OVER (ORDER BY c DESC, tok) AS rn
         |  FROM cnt QUALIFY rn <= 200),
         |m AS (SELECT COUNT(*) AS n,
         |    ${dsumSql("ln(CAST(rn AS DOUBLE))")} AS sx,
         |    ${dsumSql("ln(CAST(c AS DOUBLE))")} AS sy,
         |    ${dsumSql("ln(CAST(rn AS DOUBLE)) * ln(CAST(rn AS DOUBLE))")}
         |      AS sxx,
         |    ${dsumSql("ln(CAST(rn AS DOUBLE)) * ln(CAST(c AS DOUBLE))")}
         |      AS sxy
         |  FROM top)
         |SELECT n AS n_tokens,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
         |    6) AS intercept
         |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cnt = t(spark, dir).documents
        .select(explode(TextOps.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(one).as("c"))
      val top = cnt.orderBy($"c".desc, $"tok").limit(200)
        .withColumn("rn", row_number().over(
          Window.orderBy($"c".desc, $"tok")))
      val lx = log($"rn".cast("double"))
      val ly = log($"c".cast("double"))
      val m = top.agg(count(one).as("n"), dsum(lx).as("sx"),
        dsum(ly).as("sy"), dsum(lx * lx).as("sxx"), dsum(lx * ly).as("sxy"))
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")
      m.select($"n".as("n_tokens"), round(slope, 6).as("slope"),
        round(($"sy" - slope * $"sx") / $"n", 6).as("intercept"))
    },

    // ---- interval-union coverage (session overlap collapse) ------------
    // Total wall-clock each user was "active" under 30-minute activity
    // intervals, with overlaps collapsed — the island-detection pattern
    // (new island ⇔ start > max prior end). All integer millisecond
    // arithmetic; one shuffle on user_id, two windows sharing it.
    // Intervals are DISTINCT first: a union is a set operation, and
    // duplicate (s, e) rows would leave the window order non-total — the
    // flag window and the cumsum window may then pick DIFFERENT tie
    // orders (even within one engine they are separate sorts), splitting
    // islands nondeterministically (observed on the 10x stress replica
    // where every event has 10 identical copies).
    Qry(
      "q114_interval_union",
      """WITH iv AS (SELECT DISTINCT user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) + 1800000 AS e
        |  FROM events),
        |f AS (SELECT user_id, s, e,
        |    CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |    SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        |  FROM f),
        |g AS (SELECT user_id, iid, MIN(s) AS i_start, MAX(e) AS i_end
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(i_end - i_start) AS BIGINT) AS covered_ms
        |FROM g GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val gap = 1800000L
      val iv = t(spark, dir).events
        .select($"user_id", unix_millis($"ts").as("s"))
        .withColumn("e", $"s" + gap)
        .distinct()
      val wPrev = Window.partitionBy($"user_id").orderBy($"s", $"e")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy($"user_id").orderBy($"s", $"e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevMax = max($"e").over(wPrev)
      iv.withColumn("ni",
          when(prevMax.isNull || $"s" > prevMax, 1).otherwise(0))
        .withColumn("iid", sum($"ni").over(wRun))
        .groupBy($"user_id", $"iid")
        .agg(min($"s").as("i_start"), max($"e").as("i_end"))
        .groupBy($"user_id")
        .agg(count(one).as("n_islands"),
          sum($"i_end" - $"i_start").as("covered_ms"))
    },

    // ---- bitwise aggregates --------------------------------------------
    // bit_and / bit_or / bit_xor are order-independent by construction —
    // the rare aggregate family that needs NO determinism scaffolding.
    Qry(
      "q115_bit_aggs",
      """SELECT event_type, bit_and(user_id) AS id_and,
        |  bit_or(user_id) AS id_or, bit_xor(user_id) AS id_xor,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy($"event_type")
        .agg(bit_and($"user_id").as("id_and"),
          bit_or($"user_id").as("id_or"),
          bit_xor($"user_id").as("id_xor"),
          countDistinct($"user_id").as("n_users"))
    },

    // ---- LATERAL correlated subquery (SQL surface) ---------------------
    // Per-outer-row top-k via LATERAL — the SQL-standard spelling of
    // q7's top-k-per-group, exercised through spark.sql so Catalyst's
    // lateral-join decorrelation path is covered. Both engines run the
    // IDENTICAL query text.
    Qry(
      "q116_lateral_topk",
      """SELECT r_name, n_name
        |FROM region, LATERAL (SELECT n_name FROM nation
        |  WHERE n_regionkey = r_regionkey
        |  ORDER BY n_name LIMIT 2) top_nations""".stripMargin) {
      (spark, dir) =>
        val tb = t(spark, dir)
        tb.region.createOrReplaceTempView("region")
        tb.nation.createOrReplaceTempView("nation")
        spark.sql(
          """SELECT r_name, n_name
            |FROM region, LATERAL (SELECT n_name FROM nation
            |  WHERE n_regionkey = r_regionkey
            |  ORDER BY n_name LIMIT 2) top_nations""".stripMargin)
    }
  )
}
