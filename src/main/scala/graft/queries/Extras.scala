package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.operators.ExactPercentile
import graft.sources.Tables

/** Coverage extensions: typed-Aggregator UDAF, full ranking-window
  * family, multiset (ALL) set operations, Catalyst subquery handling via
  * the SQL entry path, and the array-function family. */
object Extras {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- custom typed Aggregator (exact percentile UDAF) ---------------
    Qry(
      "q50_percentile_udaf",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val p50 = udaf(new ExactPercentile(0.5))
      val p95 = udaf(new ExactPercentile(0.95))
      t(spark, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(round(p50($"l_extendedprice"), 4).as("p50"),
          round(p95($"l_extendedprice"), 4).as("p95"),
          count(one).as("n"))
    },

    // ---- full ranking-window family ------------------------------------
    Qry(
      "q51_window_ranks",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  dense_rank() OVER w AS drank,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |QUALIFY o_orderkey % 97 = 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(spark, dir).orders
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .withColumn("drank", dense_rank().over(w))
        .withColumn("prank", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .filter($"o_orderkey" % 97 === 0)
    },

    // ---- multiset set operations (ALL variants) ------------------------
    Qry(
      "q52_setops_all",
      """WITH a AS (SELECT o_custkey AS ck FROM orders
        |           WHERE o_orderstatus = 'F'),
        |     b AS (SELECT o_custkey AS ck FROM orders
        |           WHERE o_totalprice > 200000e0)
        |SELECT 'intersect_all' AS op, ck, COUNT(*) AS n
        |FROM (SELECT ck FROM a INTERSECT ALL SELECT ck FROM b) GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS op, ck, COUNT(*) AS n
        |FROM (SELECT ck FROM a EXCEPT ALL SELECT ck FROM b) GROUP BY 2"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val orders = t(spark, dir).orders
      val a = orders.filter($"o_orderstatus" === "F")
        .select($"o_custkey".as("ck"))
      val b = orders.filter($"o_totalprice" > 200000.0)
        .select($"o_custkey".as("ck"))
      a.intersectAll(b).groupBy($"ck").agg(count(one).as("n"))
        .select(lit("intersect_all").as("op"), $"ck", $"n")
        .unionByName(
          a.exceptAll(b).groupBy($"ck").agg(count(one).as("n"))
            .select(lit("except_all").as("op"), $"ck", $"n"))
    },

    // ---- Catalyst subquery handling (SQL entry path) -------------------
    Qry(
      "q53_sql_subqueries",
      s"""SELECT o_orderpriority, COUNT(*) AS n
         |FROM orders
         |WHERE o_custkey IN (SELECT c_custkey FROM customer
         |                    WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")}
         |                                       FROM customer))
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_quantity > 45e0)
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      val tb = t(spark, dir)
      tb.orders.createOrReplaceTempView("orders")
      tb.customer.createOrReplaceTempView("customer")
      tb.lineitem.createOrReplaceTempView("lineitem")
      spark.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n
           |FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer
           |                    WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")}
           |                                       FROM customer))
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_quantity > 45e0)
           |GROUP BY 1""".stripMargin)
    },

    // ---- array function family -----------------------------------------
    // NOTE: the gate-checked output must contain NO array/map/struct
    // columns — the driver's pandas compare crashes sorting them
    // (CORRECTNESS_r01 q54 harness error) — so top3 is emitted as three
    // scalar columns.
    Qry(
      "q54_array_funcs",
      """SELECT vec_id,
        |  CAST(len(v) AS BIGINT) AS dim,
        |  list_max(v) AS max_val,
        |  list_min(v) AS min_val,
        |  CAST(list_position(v, list_max(v)) AS BIGINT) AS max_pos,
        |  list_sort(v, 'DESC')[1] AS top3_1,
        |  list_sort(v, 'DESC')[2] AS top3_2,
        |  list_sort(v, 'DESC')[3] AS top3_3,
        |  list_contains(v, 0.0) AS has_zero
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).embeddings
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .select($"vec_id", $"v",
          sort_array($"v", asc = false).as("vd"))
        .select($"vec_id",
          size($"v").cast(LongType).as("dim"),
          array_max($"v").as("max_val"),
          array_min($"v").as("min_val"),
          array_position($"v", array_max($"v")).as("max_pos"),
          element_at($"vd", 1).as("top3_1"),
          element_at($"vd", 2).as("top3_2"),
          element_at($"vd", 3).as("top3_3"),
          array_contains($"v", 0.0).as("has_zero"))
    }
  )
}
