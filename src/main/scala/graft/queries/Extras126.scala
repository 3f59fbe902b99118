package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables

/** Hundred-twenty-sixth coverage wave: market concentration and
  * bipartite clustering — two structure metrics the existing profile
  * misses.
  *
  *  - q329: Herfindahl–Hirschman concentration index of supplier
  *    revenue per nation — THE concentration audit (mix monitoring for
  *    corpus sources uses the same statistic): HHI = Σ shareᵢ², here
  *    exact as (10⁶·Σwᵢ²) DIV W² over revenue cents in DECIMAL(38,0)
  *    (wᵢ² overflows int64; the square of a nation's total needs 46
  *    bits² headroom). Per nation: supplier count, total, HHI ppm and
  *    the top supplier's share ppm. One corpus-sized revenue groupBy;
  *    the HHI algebra runs on the supplier-count-bounded table.
  *
  *  - q330: butterfly (4-cycle) census of the customer↔supplier trade
  *    graph — the bipartite clustering primitive: bipartite graphs
  *    have NO triangles, so q297's clustering coefficient is
  *    structurally zero there; butterflies (two customers sharing two
  *    suppliers) are the right closure signal. wedges = Σₛ C(deg s, 2)
  *    (customer pairs co-buying from one supplier); butterflies =
  *    Σ_pairs C(shared, 2). The pair expansion is df-CAPPED at
  *    suppliers with ≤ 64 distinct customers (the Dedup discipline —
  *    a hub supplier contributes deg² pairs and says nothing about
  *    local closure); capped-out suppliers are REPORTED in the result
  *    row, not silently dropped. Output is one audit row: suppliers
  *    used/capped, wedges, co-buying pairs, butterflies, and the
  *    butterfly-to-wedge closure ratio in ppm.
  */
object Extras126 {

  private val DegCap = 64

  val all: Seq[Qry] = Seq(

    Qry(
      "q329_hhi_concentration",
      """WITH rev AS (SELECT s.s_nationkey AS nationkey, l.l_suppkey,
        |    CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |      AS HUGEINT) AS w
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2)
        |SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(w) AS BIGINT) AS total_cents,
        |  CAST((1000000 * SUM(w * w)) // (SUM(w) * SUM(w)) AS BIGINT)
        |    AS hhi_ppm,
        |  CAST((1000000 * MAX(w)) // SUM(w) AS BIGINT)
        |    AS top_share_ppm
        |FROM rev GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val rev = tt.lineitem
        .join(tt.supplier, $"s_suppkey" === $"l_suppkey")
        .groupBy($"s_nationkey".as("nationkey"), $"l_suppkey")
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .cast(DecimalType(38, 0)).as("w"))
      rev.groupBy($"nationkey")
        .agg(count(lit(1)).cast(LongType).as("n_suppliers"),
          sum($"w").cast(LongType).as("total_cents"),
          expr("CAST((1000000 * SUM(w * w)) DIV (SUM(w) * SUM(w)) " +
            "AS BIGINT)").as("hhi_ppm"),
          expr("CAST((1000000 * MAX(w)) DIV SUM(w) AS BIGINT)")
            .as("top_share_ppm"))
    },

    Qry(
      "q330_butterfly_census",
      s"""WITH b AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS c
         |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
         |d AS (SELECT s, COUNT(*) AS dc FROM b GROUP BY 1),
         |kept AS (SELECT s, dc FROM d WHERE dc <= $DegCap),
         |bk AS (SELECT b.s, b.c FROM b JOIN kept ON kept.s = b.s),
         |pairs AS (SELECT a.c AS c1, b2.c AS c2, COUNT(*) AS shared
         |  FROM bk a JOIN bk b2 ON a.s = b2.s AND a.c < b2.c
         |  GROUP BY 1, 2)
         |SELECT CAST((SELECT COUNT(*) FROM kept) AS BIGINT)
         |    AS n_suppliers_used,
         |  CAST((SELECT COUNT(*) FROM d WHERE dc > $DegCap) AS BIGINT)
         |    AS n_capped_out,
         |  CAST((SELECT SUM(dc * (dc - 1) // 2) FROM kept) AS BIGINT)
         |    AS wedges,
         |  CAST(COUNT(*) AS BIGINT) AS co_pairs,
         |  CAST(SUM(shared * (shared - 1) // 2) AS BIGINT)
         |    AS butterflies,
         |  CAST((1000000 * SUM(shared * (shared - 1) // 2))
         |    // (SELECT SUM(dc * (dc - 1) // 2) FROM kept) AS BIGINT)
         |    AS closure_ppm
         |FROM pairs""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val b = tt.lineitem
        .join(tt.orders, $"o_orderkey" === $"l_orderkey")
        .select($"l_suppkey".as("s"), $"o_custkey".as("c")).distinct()
      val d = b.groupBy($"s").agg(count(lit(1)).as("dc"))
      val kept = d.filter($"dc" <= DegCap)
      val bk = b.join(kept.select($"s"), "s")
      val pairs = bk.as("a")
        .join(bk.select($"s".as("s2"), $"c".as("c2")),
          $"s" === $"s2" && $"c" < $"c2")
        .groupBy($"c".as("c1"), $"c2")
        .agg(count(lit(1)).as("shared"))
      val keptStats = kept.agg(
        count(lit(1)).cast(LongType).as("n_suppliers_used"),
        sum(expr("dc * (dc - 1) DIV 2")).cast(LongType).as("wedges"))
      val cappedOut = d.filter($"dc" > DegCap)
        .agg(count(lit(1)).cast(LongType).as("n_capped_out"))
      pairs.agg(
          count(lit(1)).cast(LongType).as("co_pairs"),
          sum(expr("shared * (shared - 1) DIV 2")).cast(LongType)
            .as("butterflies"))
        .crossJoin(broadcast(keptStats))
        .crossJoin(broadcast(cappedOut))
        .select($"n_suppliers_used", $"n_capped_out", $"wedges",
          $"co_pairs", $"butterflies",
          expr("CAST((1000000 * butterflies) DIV wedges AS BIGINT)")
            .as("closure_ppm"))
    }
  )
}
