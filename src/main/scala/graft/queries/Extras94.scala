package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Exact.Money
import graft.operators.TextOps
import graft.sources.Tables

/** Ninety-fourth coverage wave: distributed uncertainty quantification
  * and exact classifier evaluation.
  *
  *  - q280: Poisson bootstrap confidence intervals — THE distributed
  *    bootstrap (classical resampling needs n draws from one machine's
  *    full sample; the Poisson approximation gives every row an
  *    independent Poisson(1) multiplicity, so resampling becomes one
  *    map-side weight column and B replicas are one explode). Draws
  *    are deterministic (hash -> ppm -> inverse-CDF threshold
  *    cascade, thresholds precomputed as integer ppm), replica means
  *    are decimal-exact (dsum/weight, one double division — the
  *    Exact.davg shape), and the CI is rank-based over the B=32
  *    replica means (93.75% band: 2nd and 31st order statistics).
  *    Scale shape: corpus x B rows through one partial-aggregated
  *    shuffle; the CI window runs over B rows per group.
  *  - q281: exact AUC (Mann-Whitney) of q34's quality score as a
  *    predictor of the English slice — the ranking-quality number an
  *    eval pipeline ships. Scores quantize to integer milli-units
  *    (floor on double — declared), grouped counts cumulate negatives
  *    below each score level, ties contribute the standard half
  *    credit via the x2 integer form: auc2 = Σ pos·(2·cum_neg + neg);
  *    auc_ppm = 1e6·auc2 DIV (2·n_pos·n_neg) — pure integers, no
  *    corpus-sized window (the cumulation runs over the <= ~1001
  *    distinct quantized levels).
  */
object Extras94 {

  private val one = lit(1)

  /** Bootstrap replicas. */
  val B = 32
  /** Poisson(1) CDF thresholds in ppm: P(X <= k), k = 0..6; u >= last
    * threshold draws weight 7. */
  private val PoisCdfPpm =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L)
  /** CI order statistics over the B replica means. */
  private val LoRank = 2
  private val HiRank = B - 1

  private def weightCase(u: String): String = {
    val whens = PoisCdfPpm.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }.mkString(" ")
    s"(CASE $whens ELSE ${PoisCdfPpm.size} END)"
  }

  /** q34's quality score quantized to milli, as DuckDB SQL over a
    * toks-CTE row (doc_id, lang, text, tk) — the oracle twin of
    * [[scoreMilli]]; shared with q351's heuristic-baseline AUC. */
  val ScoreMilliSql: String = {
    val stopRe = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
    s"""CAST(floor(1000 * (
       |      0.5e0 * (CAST(len(regexp_extract_all(lower(text),
       |          '$stopRe')) AS DOUBLE) / greatest(len(tk), 1))
       |      + 0.3e0 * (CAST(length(array_to_string(tk, ''))
       |          AS DOUBLE) / greatest(length(text), 1))
       |      - 0.2e0 * (CAST(len(regexp_extract_all(text,
       |          '[.,!?;:]')) AS DOUBLE) / greatest(length(text), 1))
       |    )) AS BIGINT)""".stripMargin
  }

  /** q281's oracle text — shared verbatim by the q283 streaming twin
    * (the q192/q248 pattern). */
  val AucOracle: String = {
    s"""WITH ${TextOps.oracleToksCte},
       |q AS (SELECT doc_id, lang,
       |    $ScoreMilliSql AS sm
       |  FROM toks),
       |g AS (SELECT sm,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
       |      AS BIGINT) AS neg
       |  FROM q GROUP BY 1),
       |c AS (SELECT sm, pos, neg, COALESCE(SUM(neg) OVER (
       |    ORDER BY sm ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND 1 PRECEDING), 0) AS cumneg FROM g)
       |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc2,
       |  CAST(1000000 * SUM(pos * (2 * cumneg + neg))
       |    // (2 * SUM(pos) * SUM(neg)) AS BIGINT) AS auc_ppm
       |FROM c""".stripMargin
  }

  /** q34's quality score quantized to milli, as a Column over
    * (lang, text, tk). */
  def scoreMilli: org.apache.spark.sql.Column = {
    val stopRe = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
    floor(lit(1000) * (
      lit(0.5) * (size(regexp_extract_all(lower(col("text")),
        lit(stopRe), lit(0))).cast("double") /
        greatest(size(col("tk")), one)) +
      lit(0.3) * (length(concat_ws("", col("tk"))).cast("double") /
        greatest(length(col("text")), one)) -
      lit(0.2) * (size(regexp_extract_all(col("text"),
        lit("[.,!?;:]"), lit(0))).cast("double") /
        greatest(length(col("text")), one))))
      .cast(LongType)
  }

  /** AUC tail over the (sm, pos, neg) level-count table — bounded
    * (~1001 quantized levels), shared by batch q281 and streaming
    * q283. */
  def aucTail(g: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import g.sparkSession.implicits._
    val wS = Window.orderBy($"sm")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = g.withColumn("cumneg",
      coalesce(sum($"neg").over(wS), lit(0L)))
    c.agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * (lit(2) * $"cumneg" + $"neg")).as("auc2"))
      .select($"n_pos", $"n_neg", $"auc2",
        expr("1000000 * auc2 DIV (2 * n_pos * n_neg)").as("auc_ppm"))
  }

  /** q280's oracle text — shared verbatim by the q294 streaming twin
    * (the q281/q283 pattern). */
  val BootstrapOracle: String = {
    val u = TextOps.oracleHashSql(
      "CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR) || ':' || CAST(b AS VARCHAR)")
        s"""WITH li AS (SELECT l_returnflag AS flag, l_orderkey,
           |    l_linenumber, l_extendedprice AS px FROM lineitem),
           |full0 AS (SELECT flag,
           |    CAST(SUM(CAST(px AS DECIMAL(28,6))) AS DOUBLE)
           |      / COUNT(*) AS mean_full,
           |    CAST(COUNT(*) AS BIGINT) AS n_rows FROM li GROUP BY 1),
           |w AS (SELECT flag, b, ${weightCase(s"($u % 1000000)")} AS w,
           |    px
           |  FROM li, range($B) t(b)),
           |rm AS (SELECT flag, b,
           |    CAST(SUM(w * CAST(px AS DECIMAL(28,6))) AS DOUBLE)
           |      / SUM(w) AS m
           |  FROM w GROUP BY 1, 2 HAVING SUM(w) > 0),
           |rk AS (SELECT flag, m, row_number() OVER (PARTITION BY flag
           |    ORDER BY m, b) AS rn FROM rm)
           |SELECT f.flag, n_rows, mean_full,
           |  CAST($B AS BIGINT) AS n_replicas,
           |  lo.m AS ci_lo, hi.m AS ci_hi
           |FROM full0 f
           |  JOIN rk lo ON lo.flag = f.flag AND lo.rn = $LoRank
           |  JOIN rk hi ON hi.flag = f.flag AND hi.rn = $HiRank"""
      .stripMargin
  }

  /** Spark-side deterministic Poisson(1) weight over (l_orderkey,
    * l_linenumber, replica b) — the md5→ppm→threshold cascade, spelled
    * once for q280 and the q294 streaming twin. */
  val WeightSql: String = weightCase(
    "(CAST(conv(substring(md5(CAST(l_orderkey AS STRING) || ':' ||" +
      " CAST(l_linenumber AS STRING) || ':' ||" +
      " CAST(b AS STRING)), 1, 15), 16, 10) AS BIGINT)" +
      s" % ${TextOps.P} % 1000000)")

  /** CI tail over the per-(flag, replica) weighted sums — `sums` needs
    * (flag, b, s decimal, wt long); `full0` the batch audit (flag,
    * mean_full, n_rows). Bounded: B rows per flag. Shared by q280 and
    * the q294 streaming twin. */
  def bootstrapTail(sums: org.apache.spark.sql.DataFrame,
      full0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import sums.sparkSession.implicits._
    val rm = sums.filter($"wt" > 0)
      .select($"flag", $"b", ($"s".cast(DoubleType) / $"wt").as("m"))
    val rk = rm.withColumn("rn", row_number().over(
      Window.partitionBy($"flag").orderBy($"m", $"b")))
    full0
      .join(rk.filter($"rn" === LoRank)
        .select($"flag".as("f1"), $"m".as("ci_lo")), $"flag" === $"f1")
      .join(rk.filter($"rn" === HiRank)
        .select($"flag".as("f2"), $"m".as("ci_hi")), $"flag" === $"f2")
      .select($"flag", $"n_rows", $"mean_full",
        lit(B.toLong).as("n_replicas"), $"ci_lo", $"ci_hi")
  }

  /** The batch full-sample audit side (flag, mean_full, n_rows). */
  def bootstrapFull0(li: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import li.sparkSession.implicits._
    li.groupBy($"flag")
      .agg((sum($"px".cast(Money)).cast(DoubleType) / count(one))
        .as("mean_full"), count(one).as("n_rows"))
  }

  val all: Seq[Qry] = Seq(

    // ---- Poisson bootstrap CI ----------------------------------------------
    Qry("q280_poisson_bootstrap", BootstrapOracle) { (spark, dir) =>
      import spark.implicits._
      val li = Tables(spark, dir).lineitem
        .select($"l_returnflag".as("flag"), $"l_orderkey",
          $"l_linenumber", $"l_extendedprice".as("px"))
      // one explode to B replicas; the weight is a pure function of
      // (row identity, replica) — no RNG state anywhere
      val sums = li.crossJoin(broadcast((0 until B).toDF("b")))
        .select($"flag", $"b", $"px", expr(WeightSql).as("w"))
        .groupBy($"flag", $"b")
        .agg(sum($"w" * $"px".cast(Money)).as("s"), sum($"w").as("wt"))
      bootstrapTail(sums, bootstrapFull0(li))
    },

    // ---- exact AUC (Mann-Whitney with tie credit) ---------------------------
    Qry("q281_auc_exact", AucOracle) { (spark, dir) =>
      import spark.implicits._
      val g = Tables(spark, dir).documents
        .select($"lang", $"text", TextOps.tokens($"text").as("tk"))
        .select($"lang", scoreMilli.as("sm"))
        .groupBy($"sm")
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
          sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
      aucTail(g)
    }
  )
}
