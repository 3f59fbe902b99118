package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.operators.SkewJoin
import graft.sources.Tables

/** Second coverage-extension wave: skew-salted join (result-identical to
  * the plain join — that identity IS the oracle), date/time arithmetic,
  * null-handling functions, and pivot→unpivot. */
object Extras2 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- salted skew join (same results as the plain join) -------------
    Qry(
      "q55_salted_join",
      s"""SELECT s_name, COUNT(*) AS n_items,
         |  ${dsumSql("l_extendedprice * (1e0 - l_discount)")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      SkewJoin.saltedJoin(
          tb.lineitem.select($"l_suppkey", $"l_extendedprice", $"l_discount"),
          tb.supplier.select($"s_suppkey", $"s_name"),
          largeKey = "l_suppkey", smallKey = "s_suppkey", salts = 8)
        .groupBy($"s_name")
        .agg(count(one).as("n_items"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    },

    // ---- date/time arithmetic family -----------------------------------
    Qry(
      "q56_date_arith",
      """SELECT o_orderkey,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        |FROM orders WHERE o_orderkey % 53 = 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).orders
        .filter($"o_orderkey" % 53 === 0)
        .select($"o_orderkey",
          datediff(to_date($"o_orderdate"), lit("1995-01-01")).as("days_since"),
          add_months(to_date($"o_orderdate"), 3).as("plus3m"),
          last_day(to_date($"o_orderdate")).as("month_end"),
          weekday($"o_orderdate").as("wd"),
          dayofyear($"o_orderdate").as("doy"))
    },

    // ---- null-handling functions ---------------------------------------
    Qry(
      "q57_null_funcs",
      s"""WITH agg AS (SELECT o_custkey, COUNT(*) AS n,
         |    ${dsumSql("o_totalprice")} AS tot
         |  FROM orders GROUP BY 1)
         |SELECT c_custkey,
         |  COALESCE(n, 0) AS n_orders,
         |  COALESCE(tot, 0e0) AS spend,
         |  (tot IS NOT DISTINCT FROM NULL) AS never_ordered,
         |  NULLIF(COALESCE(n, 0), 0) AS n_or_null,
         |  CASE WHEN tot IS NULL THEN 'none'
         |       WHEN tot > 500000e0 THEN 'big' ELSE 'small' END AS tier
         |FROM customer LEFT JOIN agg ON c_custkey = o_custkey"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      val agg = tb.orders.groupBy($"o_custkey")
        .agg(count(one).as("n"), dsum($"o_totalprice").as("tot"))
      tb.customer.join(agg, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey",
          coalesce($"n", lit(0L)).as("n_orders"),
          coalesce($"tot", lit(0.0)).as("spend"),
          ($"tot" <=> lit(null)).as("never_ordered"),
          nullif(coalesce($"n", lit(0L)), lit(0L)).as("n_or_null"),
          when($"tot".isNull, "none").when($"tot" > 500000.0, "big")
            .otherwise("small").as("tier"))
    },

    // ---- pivot → unpivot roundtrip -------------------------------------
    Qry(
      "q58_unpivot",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |  ty AS (SELECT * FROM (VALUES ('click'), ('error'), ('purchase'),
        |         ('signup'), ('view')) AS t(event_type)),
        |  c AS (SELECT user_id, event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1, 2)
        |SELECT u.user_id, ty.event_type, COALESCE(c.n, 0) AS n
        |FROM u CROSS JOIN ty
        |  LEFT JOIN c ON u.user_id = c.user_id
        |    AND ty.event_type = c.event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(spark, dir).events
        .groupBy($"user_id")
        .pivot("event_type", types)
        .agg(count(one))
        .na.fill(0L, types) // not the group key
        .unpivot(Array($"user_id"), types.map(col).toArray,
          "event_type", "n")
    }
  )
}
