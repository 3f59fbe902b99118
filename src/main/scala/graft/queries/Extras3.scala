package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.sources.Tables

/** Third coverage wave: sliding event-time windows, positional explode
  * (generator), full outer join, and statistical aggregates. */
object Extras3 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- sliding windows (every event lands in 6 overlapping windows) --
    Qry(
      "q59_sliding_window",
      s"""WITH slid AS (
         |  SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
         |      - unnest(range(6)) * INTERVAL '10 minutes' AS ws,
         |    event_type, value
         |  FROM events)
         |SELECT ws, event_type, COUNT(*) AS n, ${dsumSql("value")} AS val_sum
         |FROM slid GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy(window($"ts", "60 minutes", "10 minutes"), $"event_type")
        .agg(count(one).as("n"), dsum($"value").as("val_sum"))
        .select($"window.start".as("ws"), $"event_type", $"n", $"val_sum")
    },

    // ---- positional explode (generator / UNNEST WITH ORDINALITY) -------
    Qry(
      "q60_posexplode",
      """SELECT vec_id, CAST(s.pos AS INTEGER) AS pos, s.val
        |FROM (SELECT vec_id,
        |        unnest(list_transform(range(len(embedding)),
        |          i -> struct_pack(pos := i, val := embedding[i+1]))) AS s
        |      FROM embeddings WHERE vec_id < 20)""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        t(spark, dir).embeddings
          .filter($"vec_id" < 20)
          .select($"vec_id", posexplode($"embedding"))
          .toDF("vec_id", "pos", "val")
    },

    // ---- full outer join ------------------------------------------------
    Qry(
      "q61_full_outer",
      s"""WITH rich AS (SELECT c_custkey AS ck, c_acctbal FROM customer
         |              WHERE c_acctbal > 7000e0),
         |  big AS (SELECT o_custkey AS ok, COUNT(*) AS n,
         |      ${dsumSql("o_totalprice")} AS tot
         |    FROM orders WHERE o_totalprice > 250000e0 GROUP BY 1)
         |SELECT COALESCE(ck, ok) AS custkey, c_acctbal, n, tot,
         |  CASE WHEN ck IS NULL THEN 'order_only'
         |       WHEN ok IS NULL THEN 'balance_only'
         |       ELSE 'both' END AS side
         |FROM rich FULL OUTER JOIN big ON ck = ok""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val tb = t(spark, dir)
        val rich = tb.customer.filter($"c_acctbal" > 7000.0)
          .select($"c_custkey".as("ck"), $"c_acctbal")
        val big = tb.orders.filter($"o_totalprice" > 250000.0)
          .groupBy($"o_custkey".as("ok"))
          .agg(count(one).as("n"), dsum($"o_totalprice").as("tot"))
        rich.join(big, $"ck" === $"ok", "full_outer")
          .select(coalesce($"ck", $"ok").as("custkey"), $"c_acctbal",
            $"n", $"tot",
            when($"ck".isNull, "order_only")
              .when($"ok".isNull, "balance_only")
              .otherwise("both").as("side"))
    },

    // ---- statistical aggregates (variance family + correlation) --------
    // Built-in stddev/corr merge per-partition moments in partition order
    // (order-dependent floats), which can't hash-match another engine.
    // Instead: order-independent decimal sums of x, x², y², xy, then the
    // SAME double-arithmetic moment formulas on both sides — bit-exact.
    Qry(
      "q62_stats",
      s"""WITH m AS (SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${dsumSql("l_quantity")} AS sb,
         |    ${dsumSql("l_quantity * l_quantity")} AS sbb,
         |    ${dsumSql("l_extendedprice")} AS sa,
         |    ${dsumSql("l_extendedprice * l_extendedprice")} AS saa,
         |    ${dsumSql("l_extendedprice * l_quantity")} AS sab
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag,
         |  round(sqrt((sbb - sb * sb / n) / (n - 1e0)), 4) AS qty_sd,
         |  round((sbb - sb * sb / n) / (n - 1e0), 4) AS qty_var,
         |  round((sab - sa * sb / n)
         |    / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6)
         |    AS price_qty_corr,
         |  round((sab - sa * sb / n) / (n - 1e0), 2) AS price_qty_cov
         |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val m = t(spark, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(count(one).cast("double").as("n"),
          dsum($"l_quantity").as("sb"),
          dsum($"l_quantity" * $"l_quantity").as("sbb"),
          dsum($"l_extendedprice").as("sa"),
          dsum($"l_extendedprice" * $"l_extendedprice").as("saa"),
          dsum($"l_extendedprice" * $"l_quantity").as("sab"))
      // Spark-side when() guards: under ANSI mode (Spark 4 default) a
      // 1-row group (n-1 = 0) or a constant column (0 variance in the
      // corr denominator) would fail the JOB with DIVIDE_BY_ZERO; the
      // guards yield null instead and are value-identical on every
      // non-degenerate group, so oracle parity is unchanged (DuckDB
      // returns inf/nan rather than erroring, and no fixture group is
      // degenerate).
      val corrDen = sqrt(($"saa" - $"sa" * $"sa" / $"n")
        * ($"sbb" - $"sb" * $"sb" / $"n"))
      m.select($"l_returnflag",
        round(sqrt(when($"n" > 1,
          ($"sbb" - $"sb" * $"sb" / $"n") / ($"n" - 1.0))), 4)
          .as("qty_sd"),
        round(when($"n" > 1,
          ($"sbb" - $"sb" * $"sb" / $"n") / ($"n" - 1.0)), 4)
          .as("qty_var"),
        round(when(corrDen > 0,
          ($"sab" - $"sa" * $"sb" / $"n") / corrDen), 6)
          .as("price_qty_corr"),
        round(when($"n" > 1,
          ($"sab" - $"sa" * $"sb" / $"n") / ($"n" - 1.0)), 2)
          .as("price_qty_cov"))
    }
  )
}
