package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.operators.TextOps
import graft.sources.Tables

/** Hundred-twenty-eighth coverage wave: NUMERIC two-sample drift tests
  * — the continuous-column complement to q313's categorical
  * chi-square, both exact.
  *
  *  - q333: the two-sample Kolmogorov–Smirnov statistic between two
  *    hash-assigned event snapshots: D = max over the merged value
  *    domain of |F₁(v) − F₂(v)|, kept EXACT by cross-multiplying the
  *    empirical CDFs — |c₁·n₂ − c₂·n₁|·10⁶ DIV (n₁·n₂) in
  *    DECIMAL(38,0) (c·n reaches n² — past int64 at cluster scale).
  *    Output is the argmax row (ties → smallest value) with both
  *    cumulative counts and sample sizes. The global value-ordered
  *    cumulative window is the exact-KS audit bound (one ordered pass
  *    over the DISTINCT-value table — same boundedness class as q20's
  *    exact percentile; a cluster deployment range-partitions the
  *    domain and two-passes the per-partition offsets).
  *
  *  - q334: the Mann–Whitney U / Wilcoxon rank-sum statistic for the
  *    same two snapshots — the rank-based location test (KS sees any
  *    shape change; U sees stochastic dominance). Tie-corrected
  *    midranks are rationals with denominator 2, so the query carries
  *    2·rank and 2·U (exact integers); the normalized
  *    U/(n₁·n₂) — reported in ppm — IS the probability-of-superiority
  *    AUC between the snapshots, tying the drift tier to the eval
  *    tier's AUC semantics (q281).
  *
  * Scale shape: one corpus-sized (snap, value) count groupBy each;
  * the CDF/rank algebra runs over the distinct-value table.
  */
object Extras128 {

  /** Hash-snapshot assignment shared by both tests (q245's proof
    * shape: deterministic split of one fixture into "two crawls"). */
  private def snapSql(e: String) =
    s"${TextOps.oracleHashSql(s"CAST($e AS VARCHAR)")} % 2"

  val all: Seq[Qry] = Seq(

    Qry(
      "q333_ks_drift",
      s"""WITH e AS (SELECT value, ${snapSql("event_id")} AS snap
         |  FROM events),
         |v AS (SELECT value,
         |    CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS b
         |  FROM e GROUP BY 1),
         |n AS (SELECT SUM(a) AS n0, SUM(b) AS n1 FROM v),
         |c AS (SELECT value,
         |    SUM(a) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         |    SUM(b) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
         |  FROM v),
         |g AS (SELECT value, ca, cb,
         |    (1000000 * abs(ca * n.n1 - cb * n.n0)) // (n.n0 * n.n1)
         |      AS d_ppm, n.n0, n.n1
         |  FROM c CROSS JOIN n)
         |SELECT value, CAST(ca AS BIGINT) AS cum0,
         |  CAST(cb AS BIGINT) AS cum1, CAST(d_ppm AS BIGINT) AS d_ppm,
         |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1
         |FROM (SELECT *, row_number() OVER (ORDER BY d_ppm DESC, value)
         |        AS rn FROM g)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val e = Tables(spark, dir).events
        .select($"value",
          (TextOps.hashMod($"event_id".cast("string")) % 2).as("snap"))
      val v = e.groupBy($"value")
        .agg(dec(sum(when($"snap" === 0, 1).otherwise(0))).as("a"),
          dec(sum(when($"snap" === 1, 1).otherwise(0))).as("b"))
      val n = v.agg(sum($"a").as("n0"), sum($"b").as("n1"))
      val wCum = Window.orderBy($"value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = v
        .withColumn("ca", sum($"a").over(wCum))
        .withColumn("cb", sum($"b").over(wCum))
        .crossJoin(broadcast(n))
        .select($"value", $"ca", $"cb",
          expr("(1000000 * abs(ca * n1 - cb * n0)) DIV (n0 * n1)")
            .as("d_ppm"), $"n0", $"n1")
      g.withColumn("rn",
          row_number().over(Window.orderBy($"d_ppm".desc, $"value")))
        .filter($"rn" === 1)
        .select($"value", $"ca".cast(LongType).as("cum0"),
          $"cb".cast(LongType).as("cum1"),
          $"d_ppm".cast(LongType).as("d_ppm"),
          $"n0".cast(LongType).as("n0"), $"n1".cast(LongType).as("n1"))
    },

    Qry(
      "q334_mannwhitney_u",
      s"""WITH e AS (SELECT value, ${snapSql("event_id")} AS snap
         |  FROM events),
         |v AS (SELECT value,
         |    CAST(COUNT(*) AS HUGEINT) AS cnt,
         |    CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS a
         |  FROM e GROUP BY 1),
         |r AS (SELECT value, cnt, a,
         |    SUM(cnt) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
         |  FROM v),
         |-- tie-corrected midrank of a value's block, DOUBLED to stay
         |-- integral: 2*mid = (lo + hi) = (hi - cnt + 1) + hi
         |s AS (SELECT SUM(a * (2 * hi - cnt + 1)) AS r2_0,
         |    SUM(a) AS n0, SUM(cnt) - SUM(a) AS n1 FROM r)
         |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
         |  CAST(r2_0 AS BIGINT) AS rank_sum_x2,
         |  CAST(r2_0 - n0 * (n0 + 1) AS BIGINT) AS u0_x2,
         |  CAST((1000000 * (r2_0 - n0 * (n0 + 1))) // (2 * n0 * n1)
         |    AS BIGINT) AS auc_ppm
         |FROM s""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val e = Tables(spark, dir).events
        .select($"value",
          (TextOps.hashMod($"event_id".cast("string")) % 2).as("snap"))
      val v = e.groupBy($"value")
        .agg(dec(count(lit(1))).as("cnt"),
          dec(sum(when($"snap" === 0, 1).otherwise(0))).as("a"))
      val wCum = Window.orderBy($"value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      v.withColumn("hi", sum($"cnt").over(wCum))
        .agg(sum(expr("a * (2 * hi - cnt + 1)")).as("r2_0"),
          sum($"a").as("n0"),
          (sum($"cnt") - sum($"a")).as("n1"))
        .select($"n0".cast(LongType).as("n0"),
          $"n1".cast(LongType).as("n1"),
          $"r2_0".cast(LongType).as("rank_sum_x2"),
          ($"r2_0" - $"n0" * ($"n0" + 1)).cast(LongType).as("u0_x2"),
          expr("CAST((1000000 * (r2_0 - n0 * (n0 + 1))) " +
            "DIV (2 * n0 * n1) AS BIGINT)").as("auc_ppm"))
    }
  )
}
