package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Exact._
import graft.operators.{Stats, TextOps}
import graft.sources.Tables
import graft.streaming.Streams

/** Eighth coverage wave — the incremental-pipeline and data-quality
  * operations a training-data refinery runs on top of the core engine:
  * SCD-1 merge/upsert, single-pass regression moments, z-score outlier
  * detection, Gopher-style repetition quality, corpus top-k document
  * frequency, EWMA smoothing, sketch-vs-exact validation, and
  * stream-static enrichment.
  *
  * Determinism playbook (round-1 lesson, VERDICT.md §What's wrong): every
  * emitted double is either decimal-exact (`Exact.dsum`) or rounded to a
  * fixed precision with the SAME expression tree on both engines; all
  * threshold comparisons are on identically-derived values.
  */
object Extras8 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- SCD-1 merge / upsert ------------------------------------------
    // The incremental-refresh primitive (MERGE INTO before table formats
    // existed): full-outer join of the base snapshot with a changeset,
    // change wins. One shuffle on the merge key; at cluster scale the
    // base would be bucketed by key so only the (small) changeset moves.
    Qry(
      "q80_merge_upsert",
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price
        |    FROM orders WHERE o_orderkey % 3 <> 0),
        |upd AS (SELECT o_orderkey AS k, o_totalprice * 1.1e0 AS price
        |    FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(b.k, u.k) AS o_orderkey,
        |  COALESCE(u.price, b.price) AS price,
        |  CASE WHEN b.k IS NULL THEN 'insert'
        |       WHEN u.k IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM base b FULL JOIN upd u ON b.k = u.k""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val o = t(spark, dir).orders
        val base = o.filter($"o_orderkey" % 3 =!= 0)
          .select($"o_orderkey".as("k"), $"o_totalprice".as("price"))
        val upd = o.filter($"o_orderkey" % 2 === 0)
          .select($"o_orderkey".as("uk"),
            ($"o_totalprice" * 1.1).as("uprice"))
        base.join(upd, $"k" === $"uk", "full_outer")
          .select(coalesce($"k", $"uk").as("o_orderkey"),
            coalesce($"uprice", $"price").as("price"),
            when($"k".isNull, "insert").when($"uk".isNull, "keep")
              .otherwise("update").as("action"))
    },

    // ---- single-pass linear regression ---------------------------------
    // Slope/intercept/R² from the five order-independent decimal moments
    // (n, Σx, Σy, Σx², Σy², Σxy) — ONE partial-aggregable pass over the
    // fact table; the closed-form arithmetic is row-local double math on
    // identical inputs, so no cross-engine FP-summation drift (built-in
    // regr_slope/corr would accumulate doubles in engine-specific order).
    Qry(
      "q81_regression",
      s"""WITH m AS (SELECT l_returnflag AS flag, COUNT(*) AS n,
         |    ${dsumSql("l_quantity")} AS sx,
         |    ${dsumSql("l_extendedprice")} AS sy,
         |    ${dsumSql("l_quantity * l_quantity")} AS sxx,
         |    ${dsumSql("l_extendedprice * l_extendedprice")} AS syy,
         |    ${dsumSql("l_quantity * l_extendedprice")} AS sxy
         |  FROM lineitem GROUP BY 1),
         |d AS (SELECT flag, n, sx, sy, syy, sxy,
         |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw,
         |    ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
         |      ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2_raw
         |  FROM m)
         |SELECT flag, n, round(slope_raw, 6) AS slope,
         |  round((sy - slope_raw * sx) / n, 6) AS intercept,
         |  round(r2_raw, 6) AS r2
         |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Stats.linearFit(t(spark, dir).lineitem,
          x = $"l_quantity", y = $"l_extendedprice",
          keys = Seq($"l_returnflag".as("flag")))
        .select($"flag", $"n", round($"slope", 6).as("slope"),
          round($"intercept", 6).as("intercept"),
          round($"r2", 6).as("r2"))
    },

    // ---- z-score outlier detection -------------------------------------
    // Population mean/σ per event_type from decimal moments (one pass),
    // broadcast back onto the fact scan (4 stat rows — never a shuffle),
    // keep |z| > 3. The standard large-scale anomaly sweep: stats pass +
    // map-side filter pass.
    Qry(
      "q82_zscore_outliers",
      s"""WITH s AS (SELECT event_type, COUNT(*) AS n,
         |    ${dsumSql("value")} AS sx, ${dsumSql("value * value")} AS sxx
         |  FROM events GROUP BY 1),
         |st AS (SELECT event_type, sx / n AS mu,
         |    sqrt(sxx / n - (sx / n) * (sx / n)) AS sigma
         |  FROM s)
         |SELECT e.event_id, e.event_type,
         |  round((e.value - st.mu) / st.sigma, 6) AS z
         |FROM events e JOIN st ON e.event_type = st.event_type
         |WHERE abs((e.value - st.mu) / st.sigma) > 3e0""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        Stats.zscoreOutliers(t(spark, dir).events,
            keyCol = "event_type", valueCol = "value", threshold = 3.0)
          .select($"event_id", $"event_type", round($"z", 6).as("z"))
    },

    // ---- repetition quality (Gopher duplicate-bigram rule) -------------
    // Fraction of duplicated word bigrams per document — the classic
    // boilerplate/repetition filter in training-data curation. Pure
    // per-row array arithmetic (no join, no explode): scales as a map.
    // The flag comparison is integer ((dup·5 ≥ total) ⇔ frac ≥ 0.2) so no
    // boundary row can flip on FP representation.
    Qry(
      "q83_dup_ngrams",
      s"""WITH ${TextOps.oracleToksCte},
         |bg AS (SELECT doc_id,
         |    CAST(len(tk) - 1 AS BIGINT) AS n_bigrams,
         |    CAST(len(list_distinct(list_transform(range(len(tk) - 1),
         |      i -> array_to_string(tk[i+1:i+2], ' ')))) AS BIGINT)
         |      AS n_distinct
         |  FROM toks WHERE len(tk) >= 2)
         |SELECT doc_id, n_bigrams, n_distinct,
         |  round(CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams, 6)
         |    AS dup_frac,
         |  (n_bigrams - n_distinct) * 5 >= n_bigrams AS repetitive
         |FROM bg""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .select($"doc_id", TextOps.tokens($"text").as("tk"))
        .filter(size($"tk") >= 2)
        .select($"doc_id", TextOps.shingles($"tk", 2).as("bg"))
        .select($"doc_id", size($"bg").cast(LongType).as("n_bigrams"),
          size(array_distinct($"bg")).cast(LongType).as("n_distinct"))
        .select($"doc_id", $"n_bigrams", $"n_distinct",
          round(($"n_bigrams" - $"n_distinct").cast(DoubleType) /
            $"n_bigrams", 6).as("dup_frac"),
          (($"n_bigrams" - $"n_distinct") * 5 >= $"n_bigrams")
            .as("repetitive"))
    },

    // ---- corpus top-k tokens by document frequency ---------------------
    // Zipf-head inspection: distinct (doc, token) pairs → per-token df →
    // global top-k. Two hash-agg shuffles on the exploded token stream and
    // a TakeOrdered top-k (no global sort materialization). The (df DESC,
    // token ASC) order is total, so LIMIT is deterministic on both
    // engines.
    Qry(
      "q84_topk_tokens",
      s"""WITH ${TextOps.oracleToksCte},
         |dtok AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, unnest(tk) AS tok FROM toks))
         |SELECT tok, COUNT(*) AS df
         |FROM dtok GROUP BY 1
         |ORDER BY df DESC, tok LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
        .distinct()
        .groupBy($"tok").agg(count(one).as("df"))
        .orderBy($"df".desc, $"tok".asc)
        .limit(20)
    },

    // ---- EWMA smoothing over lag windows -------------------------------
    // Exponentially weighted moving average with a finite 5-tap kernel
    // (α = 1/2): one window pass, weights are exact binary fractions and
    // the summation order is fixed by the expression tree, so the double
    // result is bit-identical cross-engine. Rows before the 5th per key
    // are excluded (kernel not yet full) on both sides.
    Qry(
      "q85_ewma",
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
        |l AS (SELECT user_id, event_id, value,
        |    lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
        |    lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4,
        |    row_number() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT user_id, event_id,
        |  round((value + 0.5e0 * v1 + 0.25e0 * v2 + 0.125e0 * v3
        |    + 0.0625e0 * v4) / 1.9375e0, 6) AS ewma5
        |FROM l WHERE rn >= 5""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"value")
      Stats.ewma(e, keys = Seq($"user_id"),
          order = Seq($"ms", $"event_id"),
          valueCol = "value", alpha = 0.5, taps = 5)
        .select($"user_id", $"event_id", round($"ewma", 6).as("ewma5"))
    },

    // ---- sketch-vs-exact validation (HLL) ------------------------------
    // approx_count_distinct (HyperLogLog++) is the 100-TB path for
    // count-distinct: one-pass, mergeable, constant memory — where exact
    // distinct needs a full shuffle of the key stream. The query asserts
    // the sketch lands within 10% of exact at test scale (the oracle
    // states the bound as a constant TRUE, so a drifting sketch fails the
    // gate loudly); only the exact count is emitted as a value.
    Qry(
      "q86_sketch_bounds",
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  CAST(TRUE AS BOOLEAN) AS approx_ok
        |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_users"),
          approx_count_distinct($"user_id").as("approx"))
        .select($"event_type", $"exact_users",
          (abs($"approx" - $"exact_users") <=
            lit(0.1) * $"exact_users").as("approx_ok"))
    },

    // ---- stream-static enrichment join ---------------------------------
    // The serving-side shape the reference's consumers approximate:
    // a live stream joined against a broadcast static snapshot (per-user
    // lifetime mean), counting above-baseline events per type. The
    // stream-static inner join is STATELESS (no watermark bookkeeping,
    // no join state) — the static side ships once per executor.
    Qry(
      "q87_stream_enrich",
      s"""WITH ua AS (SELECT user_id, ${davgSql("value")} AS user_avg
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, COUNT(*) AS n_above,
         |  ${dsumSql("e.value")} AS val_above_sum
         |FROM events e JOIN ua ON e.user_id = ua.user_id
         |WHERE e.value > ua.user_avg
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val static = t(spark, dir).events
        .groupBy($"user_id".as("su"))
        .agg(davg($"value").as("user_avg"))
      val src = Streams.fileStream(spark, dir, "events")
      val agg = src.join(broadcast(static), $"user_id" === $"su")
        .filter($"value" > $"user_avg")
        .groupBy($"event_type")
        .agg(count(one).as("n_above"), dsum($"value").as("val_above_sum"))
      Streams.runToMemory(agg, "complete")
        .select($"event_type", $"n_above", $"val_above_sum")
    }
  )
}
