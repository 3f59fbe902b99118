package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Ninth coverage wave: quantile sketches validated against exact,
  * time-RANGE window frames, argmin/argmax aggregates, FILTER-clause
  * conditional aggregation, and pg_trgm-style character-trigram fuzzy
  * matching. */
object Extras9 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- quantile sketch vs exact --------------------------------------
    // approx_percentile (GK sketch) is the mergeable one-pass path for
    // percentiles at 100 TB (exact needs a per-group sort); the oracle
    // pins the sketch inside a 5% envelope of exact — a drifting sketch
    // fails the gate. Only exact values are emitted as numbers.
    Qry(
      "q88_approx_quantile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  CAST(TRUE AS BOOLEAN) AS sketch_ok
        |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        // exact percentile buffers and sorts its group's values — feed it
        // the two needed columns, not the full 11-column row
        .select($"l_returnflag", $"l_extendedprice")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("ep50"),
          expr("percentile(l_extendedprice, 0.9)").as("ep90"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
          expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("a90"))
        .select($"l_returnflag",
          round($"ep50", 4).as("p50"), round($"ep90", 4).as("p90"),
          (abs($"a50" - $"ep50") <= lit(0.05) * $"ep50" &&
            abs($"a90" - $"ep90") <= lit(0.05) * $"ep90").as("sketch_ok"))
    },

    // ---- time-RANGE window frame ---------------------------------------
    // Trailing 10-minute per-user sum/count via a RANGE frame on the ms
    // axis — value-based frames (vs the ROWS frames of q16/q17) are the
    // correct trailing-window semantics when event spacing is irregular.
    // Ties in ms share one frame, so the result is order-deterministic;
    // the sum is decimal-exact.
    Qry(
      "q89_range_frame",
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events)
         |SELECT user_id, event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
         |    AS val_10m,
         |  COUNT(*) OVER w AS n_10m
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms
         |  RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ms")
          .rangeBetween(-600000L, Window.currentRow)
        t(spark, dir).events
          .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
            $"value")
          .select($"user_id", $"event_id",
            sum($"value".cast(Money)).over(w).cast("double").as("val_10m"),
            count(one).over(w).as("n_10m"))
    },

    // ---- argmin / argmax aggregates ------------------------------------
    // min_by/max_by (DuckDB arg_min/arg_max) with an explicitly UNIQUE
    // ordering value: ties in the raw price would make the picked key
    // engine-dependent, so the comparand is price·1e9 + key. Uniqueness,
    // not integer exactness, is what matters: price·1e9 carries ~1 ulp of
    // product error, but 2-dp money steps of 1e7 dominate the key range
    // and both engines evaluate the identical IEEE-754 expression, so the
    // ordering agrees bit-for-bit.
    Qry(
      "q90_argminmax",
      """SELECT o_orderpriority,
        |  arg_min(o_orderkey, o_totalprice * 1e9 + o_orderkey)
        |    AS cheapest_key,
        |  arg_max(o_orderkey, o_totalprice * 1e9 + o_orderkey)
        |    AS priciest_key,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tie = $"o_totalprice" * lit(1e9) + $"o_orderkey"
      t(spark, dir).orders
        .groupBy($"o_orderpriority")
        .agg(min_by($"o_orderkey", tie).as("cheapest_key"),
          max_by($"o_orderkey", tie).as("priciest_key"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"))
    },

    // ---- conditional aggregation (FILTER clause family) ----------------
    Qry(
      "q91_conditional_agg",
      s"""SELECT l_returnflag,
         |  COUNT(*) FILTER (WHERE l_quantity > 25e0) AS n_big,
         |  BOOL_AND(l_discount <= 0.08e0) AS all_small_disc,
         |  BOOL_OR(l_tax > 0.07e0) AS any_high_tax,
         |  ${dsumSql(
             "CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' " +
               "THEN l_extendedprice END")} AS recent_rev
         |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(count_if($"l_quantity" > 25.0).as("n_big"),
          bool_and($"l_discount" <= 0.08).as("all_small_disc"),
          bool_or($"l_tax" > 0.07).as("any_high_tax"),
          dsum(when($"l_shipdate" >= lit("1997-01-01").cast("timestamp"),
            $"l_extendedprice")).as("recent_rev"))
    },

    // ---- character-trigram fuzzy matching (pg_trgm shape) --------------
    // Identifier-like strings ("Supplier#000000123") tokenize identically,
    // so word-level shingles (q36) and even SymSpell (q69, bounded radius)
    // miss the "similar id" relation; char-trigram Jaccard is the pg_trgm
    // answer. Common prefix trigrams carry no signal AND would fan the
    // shared-trigram join out quadratically — the df-cap (16 here: every
    // prefix trigram appears in all names) drops them, bounding the join
    // like q36's cap does at corpus scale.
    Qry(
      "q92_char_trigram", {
        val hashG = TextOps.oracleHashSql("g")
        s"""WITH tg AS (
           |  SELECT s_suppkey AS id, $hashG AS h
           |  FROM (SELECT s_suppkey, unnest(list_distinct(
           |      list_transform(range(1, len(s_name) - 1),
           |        i -> substr(s_name, i, 3)))) AS g
           |    FROM supplier WHERE len(s_name) >= 3)),
           |tgc AS (SELECT id, h FROM (
           |  SELECT id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM tg)
           |  WHERE df <= 16),
           |sizes AS (SELECT id, COUNT(*) AS n FROM tgc GROUP BY 1),
           |pairs AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
           |  FROM tgc a JOIN tgc b ON a.h = b.h AND a.id < b.id
           |  GROUP BY 1, 2)
           |SELECT ia AS id_a, ib AS id_b, shared, sa.n AS n_a, sb.n AS n_b,
           |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
           |FROM pairs
           |  JOIN sizes sa ON ia = sa.id
           |  JOIN sizes sb ON ib = sb.id
           |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared)
           |  >= 0.5e0""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      Dedup.jaccardPairs(
          Dedup.charNGramHashes(t(spark, dir).supplier,
            "s_suppkey", "s_name", 3),
          "s_suppkey", dfCap = 16)
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b", $"shared", $"n_a", $"n_b", $"jaccard")
    }
  )
}
