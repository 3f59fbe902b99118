package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Forty-third coverage wave: bounded graph expansion, order-statistic
  * windows, and tokenizer capacity planning.
  *
  *  - Two-hop reach (q174): distinct customers reachable through a
  *    shared supplier, for a bounded seed set — the collaborative-
  *    filtering / influence-radius primitive. The expansion is the
  *    graph analog of the dedup family's candidate bounding: seeds
  *    broadcast, hops are equi-joins keyed on the intermediate node.
  *  - Rolling median (q175): exact trailing-window order statistic
  *    (lower median of the last 20 values per user) — the robust
  *    moving-center that q17's moving AVERAGE cannot provide under
  *    outliers; completes the percentile family (q20/q50/q88/q101/
  *    q112/q138 are all group-global) with the windowed form.
  *  - Vocabulary coverage curve (q176): cumulative corpus-occurrence
  *    share of the top-k tokens at fixed rank points — the curve a
  *    tokenizer design reads to pick vocab size (how much of the
  *    corpus the vocabulary explains).
  */
object Extras43 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  private val Seeds = 10
  private val MedWin = 20
  // the synthetic fixture's vocabulary is 31 tokens — curve points are
  // scaled to it (at a real corpus they'd be 100/1k/10k/100k)
  private val CovKs = Seq(5L, 10L, 25L)

  val all: Seq[Qry] = Seq(

    // ---- bounded two-hop reach over the purchase graph ----------------
    // Edges = distinct (custkey, suppkey); seeds = top-10 customers by
    // supplier degree (deterministic tie-break on key). reach2 counts
    // distinct OTHER customers sharing any supplier with the seed. The
    // staged edge list feeds degree ranking AND both hop sides — one
    // orders⋈lineitem build. Scale shape: seeds broadcast; the hop join
    // is supplier-keyed (bounded by supplier in-degree — at true hub
    // scale the df-cap discipline from Dedup applies verbatim); the
    // distinct-reach aggregate is partial-aggregable.
    Qry(
      "q174_two_hop_reach",
      s"""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |deg AS (SELECT c, COUNT(*) AS degree FROM e GROUP BY 1),
         |seeds AS (SELECT c, degree FROM (
         |    SELECT c, degree, row_number() OVER (ORDER BY degree DESC, c)
         |      AS rn FROM deg) WHERE rn <= $Seeds),
         |hop AS (SELECT sd.c, sd.degree, e2.c AS c2
         |        FROM seeds sd
         |          JOIN e e1 ON sd.c = e1.c
         |          JOIN e e2 ON e1.s = e2.s AND e2.c <> sd.c)
         |SELECT c AS custkey, CAST(degree AS BIGINT) AS degree,
         |  COUNT(DISTINCT c2) AS reach2
         |FROM hop GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = t(spark, dir)
      val e = Staging.stage(
        tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("s")).distinct(),
        eager = false)
      val seeds = e.groupBy($"c").agg(count(lit(1)).as("degree"))
        .withColumn("rn", row_number().over(
          Window.orderBy($"degree".desc, $"c")))
        .filter($"rn" <= Seeds).drop("rn")
      seeds
        .join(e.select($"c", $"s"), "c")
        .join(e.select($"c".as("c2"), $"s".as("s2")),
          $"s" === $"s2" && $"c2" =!= $"c")
        .groupBy($"c", $"degree")
        .agg(countDistinct($"c2").as("reach2"))
        .select($"c".as("custkey"), $"degree", $"reach2")
    },

    // ---- exact rolling (lower) median per user ------------------------
    // Order statistic over a trailing ROWS window: collect the window,
    // sort, take the ⌈n/2⌉-th smallest — EXACT (an element of the
    // window, no interpolation), so both engines agree bit-for-bit on
    // doubles. Scale shape: one user_id exchange + sorted window pass;
    // the per-row cost is WindowSize·log(WindowSize) with bounded
    // memory (ROWS frame of 20). The output is restricted to each
    // user's last event to keep the emitted surface one row per key
    // (the full path is the same frame unfiltered).
    Qry(
      "q175_rolling_median",
      s"""WITH e AS (SELECT user_id, event_id, value FROM events
         |      WHERE value IS NOT NULL),
         |w AS (SELECT user_id, event_id, value,
         |    list_sort(list(value) OVER (PARTITION BY user_id
         |      ORDER BY event_id
         |      ROWS BETWEEN ${MedWin - 1} PRECEDING AND CURRENT ROW))
         |      AS win,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rnd
         |  FROM e)
         |SELECT user_id, event_id, value,
         |  win[(len(win) + 1) // 2] AS roll_med,
         |  CAST(len(win) AS BIGINT) AS win_n
         |FROM w WHERE rnd = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val wMed = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(-(MedWin - 1), Window.currentRow)
      val wLast = Window.partitionBy($"user_id").orderBy($"event_id".desc)
      // NULL values are filtered BEFORE the window on both sides:
      // DuckDB list_sort puts NULLs first, Spark array_sort last, so a
      // NULL inside the window would shift the lower-median element
      t(spark, dir).events
        .select($"user_id", $"event_id", $"value")
        .filter($"value".isNotNull)
        .withColumn("win", array_sort(collect_list($"value").over(wMed)))
        .withColumn("rnd", row_number().over(wLast))
        .filter($"rnd" === 1)
        .select($"user_id", $"event_id", $"value",
          expr("win[((size(win) + 1) DIV 2) - 1]").as("roll_med"),
          size($"win").cast("bigint").as("win_n"))
    },

    // ---- vocabulary coverage curve ------------------------------------
    // Token frequencies ranked by (f desc, tok); cumulative occurrence
    // share at the CovKs rank points in BIGINT ppm. The corpus collapses
    // to its vocabulary in one explode+aggregate (the only corpus-sized
    // stage — q162's discipline); the ranked prefix sum runs over the
    // vocab table. Ranks beyond the vocabulary simply don't emit —
    // identical semantics in both engines.
    Qry(
      "q176_vocab_coverage",
      s"""WITH ${TextOps.oracleToksCte},
         |wc AS (SELECT unnest(tk) AS tok FROM toks),
         |f AS (SELECT tok, COUNT(*) AS cnt FROM wc GROUP BY 1),
         |r AS (SELECT tok, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
         |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER () AS BIGINT) AS total
         |  FROM f)
         |SELECT rk, tok, cnt, cum,
         |  (1000000 * cum) // total AS cov_ppm
         |FROM r WHERE rk IN (${CovKs.mkString(", ")})""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val f = t(spark, dir).documents
        .select(explode(TextOps.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      val wRank = Window.orderBy($"cnt".desc, $"tok")
      f.withColumn("rk", row_number().over(wRank))
        .withColumn("cum", sum($"cnt").over(
          wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum($"cnt").over(Window.partitionBy()))
        .filter($"rk".isin(CovKs: _*))
        .select($"rk", $"tok", $"cnt", $"cum",
          expr("(1000000 * cum) DIV total").as("cov_ppm"))
    }
  )
}
