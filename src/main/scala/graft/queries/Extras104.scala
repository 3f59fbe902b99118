package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Hundred-fourth coverage wave: robust anomaly detection and k-fold
  * evaluation stability — two more eval/monitoring-tier members.
  *
  *  - q295: median/MAD anomaly flags over the hourly event-value
  *    series — the robust twin of z-score alerting (one wild hour
  *    cannot drag the threshold the way it drags a mean/stddev, which
  *    is why monitoring pipelines ship MAD). Everything is exact
  *    integer cents: per-type hourly sums, the exact median as the
  *    ceil(n/2) order statistic (rank picked by (value, hour) — ties
  *    in value cannot change the selected VALUE), the MAD as the same
  *    order statistic over absolute deviations, and the flag
  *    10000·|dev| > 44478·MAD — the classic 3σ cut with the 1.4826
  *    MAD-consistency constant folded into one integer threshold
  *    (3 × 1.4826 = 4.4478). Output = the anomalous hours only.
  *    Scale shape: one corpus-sized partial-aggregated hourly
  *    groupBy; both median windows run over the HOURS of each series
  *    (q275's time-bounded discipline), never corpus rows.
  *  - q296: k-fold stability of the q281 quality-score AUC — the eval
  *    number nobody should ship from ONE split. Documents fold by a
  *    deterministic hash (k=5), each fold computes the exact
  *    Mann-Whitney AUC over its own quantized score levels (q281's
  *    integer machinery, PARTITIONed by fold), and every row carries
  *    the min/max/spread across folds — the stability verdict. State
  *    and windows stay bounded: <= 5 × ~1001 level rows; the only
  *    corpus-sized stage is the (fold, level) partial-aggregated
  *    count.
  */
object Extras104 {

  private val one = lit(1)

  /** Folds for q296. */
  private val K = 5
  /** q295: flag when 10000·|dev| > Thresh·MAD (3 × 1.4826 in 1e4). */
  private val Thresh = 44478L

  /** q295's oracle text — shared verbatim by the q298 streaming twin
    * (the q281/q283 pattern). */
  val MadOracle: String =
    s"""WITH h AS (SELECT event_type,
         |    CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600
         |      AS BIGINT) AS hi,
         |    CAST(SUM(CAST(value AS DECIMAL(28,6)) * 100) AS BIGINT)
         |      AS vc
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, COUNT(*) AS n FROM h GROUP BY 1),
         |r AS (SELECT h.*, row_number() OVER (PARTITION BY event_type
         |    ORDER BY vc, hi) AS rn FROM h),
         |med AS (SELECT r.event_type, vc AS med FROM r
         |  JOIN st USING (event_type) WHERE rn = (n + 1) // 2),
         |dv AS (SELECT h.event_type, hi, vc, med,
         |    abs(vc - med) AS adev
         |  FROM h JOIN med USING (event_type)),
         |r2 AS (SELECT dv.*, row_number() OVER (PARTITION BY event_type
         |    ORDER BY adev, hi) AS rn FROM dv),
         |mad AS (SELECT r2.event_type, adev AS mad FROM r2
         |  JOIN st USING (event_type) WHERE rn = (n + 1) // 2)
         |SELECT d.event_type, d.hi, d.vc, d.med, d.adev, m.mad
         |FROM dv d JOIN mad m USING (event_type)
         |WHERE 10000 * d.adev > $Thresh * m.mad""".stripMargin

  /** Median/MAD flag tail over the hourly (event_type, hi, vc) series —
    * both median ranks and the flag scan run over HOURS per type, never
    * corpus rows. Shared by batch q295 and streaming q298. */
  def madTail(hourly: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import hourly.sparkSession.implicits._
    val h = hourly
    val st = h.groupBy($"event_type").agg(count(one).as("n"))
    val wMed = Window.partitionBy($"event_type").orderBy($"vc", $"hi")
    val med = h.withColumn("rn", row_number().over(wMed))
      .join(st, Seq("event_type"))
      .filter($"rn" === expr("(n + 1) DIV 2"))
      .select($"event_type", $"vc".as("med"))
    val dv = h.join(med, Seq("event_type"))
      .select($"event_type", $"hi", $"vc", $"med",
        abs($"vc" - $"med").as("adev"))
    val wMad = Window.partitionBy($"event_type").orderBy($"adev", $"hi")
    val mad = dv.withColumn("rn", row_number().over(wMad))
      .join(st, Seq("event_type"))
      .filter($"rn" === expr("(n + 1) DIV 2"))
      .select($"event_type", $"adev".as("mad"))
    dv.join(mad, Seq("event_type"))
      .filter(lit(10000L) * $"adev" > lit(Thresh) * $"mad")
      .select($"event_type", $"hi", $"vc", $"med", $"adev", $"mad")
  }

  val all: Seq[Qry] = Seq(

    // ---- median/MAD robust anomaly flags -----------------------------------
    Qry("q295_mad_anomaly", MadOracle) { (spark, dir) =>
      import spark.implicits._
      // staged: the hourly series feeds the median rank, the deviation
      // rank, and the final flag scan
      madTail(Staging.stage(Tables(spark, dir).events
        .groupBy($"event_type",
          (unix_timestamp(date_trunc("hour", $"ts")) / 3600)
            .cast(LongType).as("hi"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vc")),
        eager = false))
    },

    // ---- k-fold AUC stability ----------------------------------------------
    Qry(
      "q296_kfold_auc", {
        val stopRe = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
        val fold = TextOps.oracleHashSql(
          "'fold:' || CAST(doc_id AS VARCHAR)")
        s"""WITH ${TextOps.oracleToksCte},
           |q AS (SELECT ($fold) % $K AS fold, lang,
           |    CAST(floor(1000 * (
           |      0.5e0 * (CAST(len(regexp_extract_all(lower(text),
           |          '$stopRe')) AS DOUBLE) / greatest(len(tk), 1))
           |      + 0.3e0 * (CAST(length(array_to_string(tk, ''))
           |          AS DOUBLE) / greatest(length(text), 1))
           |      - 0.2e0 * (CAST(len(regexp_extract_all(text,
           |          '[.,!?;:]')) AS DOUBLE) / greatest(length(text), 1))
           |    )) AS BIGINT) AS sm
           |  FROM toks),
           |g AS (SELECT fold, sm,
           |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS pos,
           |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
           |      AS BIGINT) AS neg
           |  FROM q GROUP BY 1, 2),
           |c AS (SELECT fold, sm, pos, neg, COALESCE(SUM(neg) OVER (
           |    PARTITION BY fold ORDER BY sm
           |    ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND 1 PRECEDING), 0) AS cumneg FROM g),
           |a AS (SELECT fold, CAST(SUM(pos) AS BIGINT) AS n_pos,
           |    CAST(SUM(neg) AS BIGINT) AS n_neg,
           |    CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc2,
           |    CAST(1000000 * SUM(pos * (2 * cumneg + neg))
           |      // (2 * SUM(pos) * SUM(neg)) AS BIGINT) AS auc_ppm
           |  FROM c GROUP BY 1),
           |s AS (SELECT MIN(auc_ppm) AS auc_min_ppm,
           |    MAX(auc_ppm) AS auc_max_ppm FROM a)
           |SELECT a.fold, n_pos, n_neg, auc2, auc_ppm,
           |  s.auc_min_ppm, s.auc_max_ppm,
           |  s.auc_max_ppm - s.auc_min_ppm AS spread_ppm
           |FROM a, s""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val q = Tables(spark, dir).documents
        .select($"doc_id", $"lang", $"text",
          TextOps.tokens($"text").as("tk"))
        .select((TextOps.hashMod(concat(lit("fold:"),
          $"doc_id".cast("string"))) % K).as("fold"),
          $"lang", Extras94.scoreMilli.as("sm"))
      val g = q.groupBy($"fold", $"sm")
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
          sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
      val wS = Window.partitionBy($"fold").orderBy($"sm")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = g.withColumn("cumneg",
        coalesce(sum($"neg").over(wS), lit(0L)))
      val a = c.groupBy($"fold")
        .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
          sum($"pos" * (lit(2) * $"cumneg" + $"neg")).as("auc2"))
        .select($"fold", $"n_pos", $"n_neg", $"auc2",
          expr("1000000 * auc2 DIV (2 * n_pos * n_neg)").as("auc_ppm"))
      val s = a.agg(min($"auc_ppm").as("auc_min_ppm"),
        max($"auc_ppm").as("auc_max_ppm"))
      a.crossJoin(broadcast(s))
        .select($"fold", $"n_pos", $"n_neg", $"auc2", $"auc_ppm",
          $"auc_min_ppm", $"auc_max_ppm",
          ($"auc_max_ppm" - $"auc_min_ppm").as("spread_ppm"))
    }
  )
}
