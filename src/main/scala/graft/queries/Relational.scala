package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.sources.Tables

/** Batch relational surface (SURVEY.md §2.4): scans, projection, filters,
  * joins (broadcast / shuffle / semi / anti), aggregations (group-by,
  * rollup, cube, grouping sets, distinct), window functions (ranking,
  * running, moving frames), sorts/limits/top-k, set ops, scalar function
  * families (string/date/json), percentiles, histograms.
  *
  * The reference (`/root/reference`) has none of this — its analytics are
  * consumer-thread loops (SURVEY.md §2.2-§2.3); this module is the
  * relational expansion mandated by BASELINE.json, built declaratively so
  * Catalyst handles pushdown/pruning/join-selection.
  *
  * Scale notes (100 TB discipline):
  *   - dims (`part`, `nation`, `region`, small filtered sets) are
  *     broadcast explicitly; fact-fact joins shuffle on their keys.
  *   - every aggregate is partial-aggregable (sum/count/min/max/decimal
  *     sums) → map-side combine before the shuffle.
  *   - top-k is `row_number <= k` per partition key or
  *     TakeOrderedAndProject globally — never a global sort of the data.
  */
object Relational {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)
  private val one = lit(1)

  // Row-local revenue term: identical IEEE double math in Spark & DuckDB.
  private def revenue(price: Column, disc: Column): Column =
    price * (lit(1.0) - disc)
  private val revenueSql = "l_extendedprice * (1e0 - l_discount)"

  val all: Seq[Qry] = Seq(

    // ---- aggregation over a filtered scan (TPC-H Q1 shape) -------------
    // Money sums go through Exact.dsum2 (round to 2 dp IN DECIMAL SPACE,
    // then cast): past ~9e9 money units the 6-dp decimal→double cast is
    // one ulp apart across engines (Spark correctly-rounded vs DuckDB's
    // int128→double→/1e6 double-rounding — observed on the 10x stress
    // replica); the decimal-space round is exact in both.
    Qry(
      "q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsum2Sql("l_extendedprice")} AS sum_base_price,
         |  ${dsum2Sql(revenueSql)} AS sum_disc_price,
         |  ${dsum2Sql(s"$revenueSql * (1e0 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .filter($"l_shipdate" <= lit("2001-09-02 00:00:00").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum2($"l_extendedprice").as("sum_base_price"),
          dsum2(revenue($"l_extendedprice", $"l_discount"))
            .as("sum_disc_price"),
          dsum2(revenue($"l_extendedprice", $"l_discount") *
            (lit(1.0) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_discount").as("avg_disc"),
          count(one).as("count_order"))
    },

    // ---- projection + predicate pushdown -------------------------------
    Qry(
      "q2_filter_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_shipdate
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 25e0 AND l_returnflag = 'R'"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .filter($"l_discount" > 0.05 && $"l_quantity" < 25.0 &&
          $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
          $"l_discount", $"l_shipdate")
    },

    // ---- broadcast (map-side) join: fact x small dim -------------------
    Qry(
      "q3_broadcast_join",
      s"""SELECT p_brand,
         |  ${dsumSql(revenueSql)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.lineitem
        .join(broadcast(tb.part.select($"p_partkey", $"p_brand")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          dsum(revenue($"l_extendedprice", $"l_discount")).as("revenue"),
          count(one).as("n_items"))
    },

    // ---- multi-way join (TPC-H Q5 shape): 2 shuffle + 2 broadcast ------
    Qry(
      "q4_multi_join",
      s"""SELECT n_name, ${dsumSql(revenueSql)} AS revenue, COUNT(*) AS n_items
         |FROM customer
         |  JOIN orders   ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation   ON s_nationkey = n_nationkey
         |  JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer
        .join(tb.orders
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
            $"o_orderdate" < lit("1999-01-01 00:00:00").cast(TimestampType)),
          $"c_custkey" === $"o_custkey")
        .join(tb.lineitem, $"o_orderkey" === $"l_orderkey")
        .join(tb.supplier,
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(tb.nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(tb.region.filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(
          dsum(revenue($"l_extendedprice", $"l_discount")).as("revenue"),
          count(one).as("n_items"))
    },

    // ---- semi join (EXISTS) --------------------------------------------
    Qry(
      "q5_semi_join",
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS tot_bal
         |FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders
         |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer
        .join(tb.orders.filter($"o_orderstatus" === "F").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(one).as("n_customers"), dsum($"c_acctbal").as("tot_bal"))
    },

    // ---- anti join (NOT EXISTS) ----------------------------------------
    Qry(
      "q6_anti_join",
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS tot_bal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_totalprice > 400000e0)
         |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer
        .join(
          tb.orders.filter($"o_totalprice" > 400000.0).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(one).as("n_customers"), dsum($"c_acctbal").as("tot_bal"))
    },

    // ---- per-group top-k via ranking window ----------------------------
    Qry(
      "q7_topk_per_group",
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(spark, dir).orders
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
    },

    // ---- global ordered top-k (TakeOrderedAndProject, no full sort) ----
    Qry(
      "q8_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(100)
    },

    // ---- rollup --------------------------------------------------------
    Qry(
      "q9_rollup",
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS tot_bal
         |FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer
        .join(broadcast(tb.nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(tb.region), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(one).as("n_customers"), dsum($"c_acctbal").as("tot_bal"))
    },

    // ---- cube ----------------------------------------------------------
    Qry(
      "q10_cube",
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        // Pre-aggregate on the full key set BEFORE the cube: Expand then
        // multiplies ~|distinct key combos| rows (15 here), not the fact
        // table — at 100 TB the cube's 2^k row amplification happens on
        // an already-reduced relation. Decimal partials keep dsum exact
        // (decimal addition is associative); the single cast to DOUBLE
        // still happens once at the end.
        t(spark, dir).orders
          .groupBy($"o_orderstatus", $"o_orderpriority")
          .agg(count(one).as("pn"),
            sum($"o_totalprice".cast(graft.Exact.Money)).as("pt"))
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(sum($"pn").as("n_orders"),
            sum($"pt").cast(org.apache.spark.sql.types.DoubleType)
              .as("total"))
    },

    // ---- grouping sets (SQL entry path) --------------------------------
    Qry(
      "q11_grouping_sets",
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
        .stripMargin) { (spark, dir) =>
      t(spark, dir).orders.createOrReplaceTempView("orders")
      spark.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           |  ${dsumSql("o_totalprice")} AS total
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
          .stripMargin)
    },

    // ---- distinct aggregation ------------------------------------------
    Qry(
      "q12_distinct_agg",
      s"""SELECT o_orderstatus,
         |  COUNT(DISTINCT o_custkey) AS n_customers,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).orders
        .groupBy($"o_orderstatus")
        .agg(
          countDistinct($"o_custkey").as("n_customers"),
          count(one).as("n_orders"),
          dsum($"o_totalprice").as("total"))
    },

    // ---- set ops: UNION / INTERSECT / EXCEPT ---------------------------
    Qry(
      "q13_union",
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000e0
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000e0"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer.filter($"c_acctbal" > 8000.0).select($"c_custkey".as("custkey"))
        .union(tb.orders.filter($"o_totalprice" > 300000.0)
          .select($"o_custkey".as("custkey")))
        .distinct()
    },
    Qry(
      "q14_intersect",
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000e0
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000e0"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer.filter($"c_acctbal" > 8000.0).select($"c_custkey".as("custkey"))
        .intersect(tb.orders.filter($"o_totalprice" > 300000.0)
          .select($"o_custkey".as("custkey")))
    },
    Qry(
      "q15_except",
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000e0
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000e0"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer.filter($"c_acctbal" > 8000.0).select($"c_custkey".as("custkey"))
        .except(tb.orders.filter($"o_totalprice" > 300000.0)
          .select($"o_custkey".as("custkey")))
    },

    // ---- ranking + running + lag/lead windows --------------------------
    Qry(
      "q16_window_running",
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  row_number() OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(spark, dir).orders
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_spend",
          sum($"o_totalprice".cast(Money))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_price", lead($"o_totalprice", 1).over(w))
    },

    // ---- moving aggregate over a time-range frame ----------------------
    Qry(
      "q17_moving_avg",
      """SELECT user_id, event_id, ms, value,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS mov_sum,
        |  COUNT(*) OVER w AS mov_n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |    / (COUNT(*) OVER w) AS mov_avg
        |FROM (SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms
        |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms")
        .rangeBetween(-3600000L, Window.currentRow)
      t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"), $"value")
        .withColumn("mov_sum", sum($"value".cast(Money)).over(w).cast(DoubleType))
        .withColumn("mov_n", count(one).over(w))
        .withColumn("mov_avg", $"mov_sum" / $"mov_n")
    },

    // ---- string function family ----------------------------------------
    Qry(
      "q18_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_type, 1, 4) AS type_prefix,
        |  concat_ws('#', p_brand, p_type) AS brand_type,
        |  replace(p_name, 'a', '@') AS subbed,
        |  CAST(strpos(p_name, 'o') AS BIGINT) AS o_pos,
        |  lpad(p_brand, 10, '*') AS padded
        |FROM part""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).part.select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_brand").as("lbrand"),
        length($"p_name").cast(LongType).as("name_len"),
        substring($"p_type", 1, 4).as("type_prefix"),
        concat_ws("#", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "a", "@").as("subbed"),
        instr($"p_name", "o").cast(LongType).as("o_pos"),
        lpad($"p_brand", 10, "*").as("padded"))
    },

    // ---- date/time function family -------------------------------------
    Qry(
      "q19_date_funcs",
      s"""SELECT date_trunc('month', o_orderdate) AS month,
         |  CAST(year(date_trunc('month', o_orderdate)) AS BIGINT) AS yr,
         |  CAST(quarter(date_trunc('month', o_orderdate)) AS BIGINT) AS qtr,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY date_trunc('month', o_orderdate)""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        t(spark, dir).orders
          .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("month"))
          .agg(count(one).as("n_orders"), dsum($"o_totalprice").as("total"))
          .select($"month",
            year($"month").cast(LongType).as("yr"),
            quarter($"month").cast(LongType).as("qtr"),
            $"n_orders", $"total")
    },

    // ---- exact percentiles (reference §2.3 #18, done distributed) ------
    Qry(
      "q20_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    },

    // ---- pivot ----------------------------------------------------------
    Qry(
      "q21_pivot",
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(one))
        // fill only the pivoted columns — a blanket fill would also
        // rewrite a NULL group key to 0
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
    },

    // ---- JSON extraction (events.props) --------------------------------
    Qry(
      "q22_json_props",
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS k_sum,
        |  COUNT(k) AS k_n, MAX(k) AS k_max, MIN(k) AS k_min
        |FROM (SELECT event_type,
        |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // LongType, matching the oracle's TRY_CAST(... AS BIGINT): an
      // IntegerType field would null out k values beyond Int range
      val schema = StructType(Seq(StructField("k", LongType)))
      t(spark, dir).events
        .select($"event_type",
          from_json($"props", schema).getField("k").cast(LongType).as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").as("k_sum"), count($"k").as("k_n"),
          max($"k").as("k_max"), min($"k").as("k_min"))
    },

    // ---- correlated-subquery shape (decorrelated as a join) ------------
    Qry(
      "q23_above_customer_avg",
      s"""SELECT o_orderstatus, COUNT(*) AS n_above
         |FROM orders o
         |WHERE o_totalprice > 1.5 * (
         |  SELECT ${dsumSql("i.o_totalprice")} / COUNT(*)
         |  FROM orders i WHERE i.o_custkey = o.o_custkey)
         |GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = t(spark, dir).orders
      val avgs = orders.groupBy($"o_custkey".as("ck"))
        .agg((dsum($"o_totalprice") / count(one)).as("cavg"))
      orders.join(avgs, $"o_custkey" === $"ck")
        .filter($"o_totalprice" > $"cavg" * 1.5)
        .groupBy($"o_orderstatus")
        .agg(count(one).as("n_above"))
    },

    // ---- numeric histogram (fixed-width buckets) -----------------------
    Qry(
      "q24_histogram",
      """SELECT CAST(FLOOR(o_totalprice / 25000e0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).orders
        .select(floor($"o_totalprice" / 25000.0).cast(LongType).as("bucket"))
        .groupBy($"bucket")
        .agg(count(one).as("n"))
    }
  )
}
