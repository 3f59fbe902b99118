package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Twenty-second coverage wave: key-skew diagnostics and bucketed
  * (shuffle-free) joins under the oracle gate. */
object Extras22 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  /** One bucketed-table write per (sfDir, session): the join query is
    * about READ-side shuffle elimination, not write cost. */
  private val bucketed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bucketTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val suffix = bucketed.computeIfAbsent(dir, { _ =>
      val s = dir.replaceAll("\\W", "_")
      val tb = t(spark, dir)
      tb.orders.select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"graft_b_orders$s")
      tb.customer.select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"graft_b_customer$s")
      s
    })
    (s"graft_b_orders$suffix", s"graft_b_customer$suffix")
  }

  val all: Seq[Qry] = Seq(

    // ---- key-skew diagnostics ------------------------------------------
    // The pre-flight check before choosing a join strategy at scale:
    // per-key cardinality stats + the max/mean skew ratio for the
    // events partition key. Two hash aggregates (key counts, then stats
    // over counts) — all integers until the final rounded ratio.
    Qry(
      "q131_skew_report",
      """WITH kc AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(MIN(c) AS BIGINT) AS min_c, CAST(MAX(c) AS BIGINT) AS max_c,
        |  round(CAST(MAX(c) AS DOUBLE) * COUNT(*) / CAST(SUM(c) AS BIGINT),
        |    6) AS skew_ratio
        |FROM kc""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).events
        .groupBy($"user_id").agg(count(one).as("c"))
        .agg(count(one).as("n_keys"), sum($"c").as("n_rows"),
          min($"c").as("min_c"), max($"c").as("max_c"))
        .select($"n_keys", $"n_rows", $"min_c", $"max_c",
          round($"max_c".cast("double") * $"n_keys" / $"n_rows", 6)
            .as("skew_ratio"))
    },

    // ---- bucketed co-located join (shuffle-free) -----------------------
    // Both sides written bucketed+sorted on the join key, so the join
    // plans with ZERO exchanges — the layout that turns every repeated
    // key-join at 100 TB into a map-side merge. The oracle states the
    // same join over the original parquet (bucketing is a physical
    // property, not a semantic one).
    Qry(
      "q132_bucketed_join",
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (ordersT, customerT) = bucketTables(spark, dir)
      // merge hint: at fixture SF Catalyst would broadcast the customer
      // side (also shuffle-free, but it hides the bucket win); at 100 TB
      // neither side broadcasts and sort-merge over co-bucketed scans is
      // the real plan — the hint pins THAT plan so its shape (zero
      // exchanges, zero sorts on the join) is what gets audited
      spark.table(ordersT)
        .join(spark.table(customerT).hint("merge"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(one).as("n_orders"), dsum($"o_totalprice").as("revenue"))
    }
  )
}
