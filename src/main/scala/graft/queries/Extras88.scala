package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Eighty-eighth coverage wave: sketch-based join-size estimation and
  * market-basket lift.
  *
  *  - q268: join-cardinality estimation by Count-Min inner product —
  *    the optimizer-side question "how big is clicks JOIN errors on
  *    user_id going to be?" answered from two CMS sketches (q125's
  *    conventions: depth 4, salted md5 buckets) WITHOUT performing the
  *    join: |A ⋈ B| = Σ_u a_u·b_u is estimated by the per-row sketch
  *    inner product Σ_b A[r][b]·B[r][b], an upper bound for
  *    non-negative counts (collisions only ADD cross terms); the
  *    estimate is the min over rows. Output compares every row's
  *    estimate against the exact join size with integer-ppm
  *    overestimate error. Scale shape: one corpus-sized (user, side)
  *    count aggregate; sketch rows are width-bounded (4 x 256); the
  *    exact side is one more aggregate over the SAME staged count
  *    table — the audit's cost, not the estimator's. At 100 TB the
  *    sketches are mergeable per-shard state (the q220 register
  *    discipline) and the decision "shuffle 100 TB or broadcast"
  *    costs two linear passes, no shuffle of the join inputs.
  *  - q269: market-basket co-purchase lift — every within-order part
  *    pair (the bounded self-join: pairs per order are quadratic in
  *    ORDER SIZE, ~7 items, never corpus-quadratic), pair support vs
  *    the independence baseline: lift = P(ab) / (P(a)·P(b)), in ppm,
  *    floored in a DECLARED order chosen so every intermediate stays
  *    under 2^63 at any scale (1e6·n_ab DIV n_a <= 1e6 because
  *    n_ab <= n_a, then x n_orders, then DIV n_b — the q253
  *    discipline). Top-20 by lift under a minimum support, global
  *    rank via rank-limit pushdown.
  */
object Extras88 {

  private val one = lit(1)
  /** CMS geometry: depth (salted hash rows) x width (buckets). */
  private val Depth = 4
  private val Width = 256
  /** q269 minimum pair support and report size. */
  private val MinSupport = 3
  private val TopK = 20

  /** q268's oracle text — shared verbatim by the q272 streaming twin
    * (the q192/q193 pattern). */
  val JoinSizeOracle: String = {
    val hashFor = (i: Int) =>
          s"${TextOps.oracleHashSql(
            s"'cms$i:' || CAST(user_id AS VARCHAR)")} % $Width"
        val rowSelects = (0 until Depth).map(i =>
          s"SELECT $i AS r, ${hashFor(i)} AS bkt, a, b FROM cnt")
          .mkString("\nUNION ALL ")
        s"""WITH cnt AS (SELECT user_id,
           |    CAST(COUNT(*) FILTER (WHERE event_type = 'click')
           |      AS BIGINT) AS a,
           |    CAST(COUNT(*) FILTER (WHERE event_type = 'error')
           |      AS BIGINT) AS b
           |  FROM events WHERE event_type IN ('click', 'error')
           |  GROUP BY 1),
           |ex AS (SELECT CAST(SUM(a * b) AS BIGINT) AS exact_size
           |       FROM cnt),
           |rows0 AS ($rowSelects),
           |cms AS (SELECT r, bkt, CAST(SUM(a) AS BIGINT) AS ta,
           |    CAST(SUM(b) AS BIGINT) AS tb FROM rows0 GROUP BY 1, 2),
           |ip AS (SELECT r, CAST(SUM(ta * tb) AS BIGINT) AS est
           |       FROM cms GROUP BY 1)
           |SELECT r, est, exact_size,
           |  CAST(est >= exact_size AS BOOLEAN) AS never_undercounts,
           |  CASE WHEN exact_size = 0 THEN 0
           |    ELSE 1000000 * (est - exact_size) // exact_size END
           |    AS over_ppm
           |FROM ip, ex""".stripMargin
  }

  val all: Seq[Qry] = Seq(

    // ---- CMS inner-product join-size estimate -----------------------------
    Qry(
      "q268_join_size_estimate",
      JoinSizeOracle) { (spark, dir) =>
      import spark.implicits._
      def bucket(i: Int, uid: org.apache.spark.sql.Column) =
        TextOps.hashMod(concat(lit(s"cms$i:"), uid.cast("string"))) % Width
      // staged: the per-user count table feeds the sketch rows AND the
      // exact join size (the q125 discipline)
      val cnt = Staging.stage(
        Tables(spark, dir).events
          .filter($"event_type".isin("click", "error"))
          .groupBy($"user_id")
          .agg(count(when($"event_type" === "click", 1)).as("a"),
            count(when($"event_type" === "error", 1)).as("b")),
        eager = false)
      val ex = cnt.agg(sum($"a" * $"b").as("exact_size"))
      val rows0 = (0 until Depth).map(i =>
        cnt.select(lit(i).as("r"), bucket(i, $"user_id").as("bkt"),
          $"a", $"b"))
        .reduce(_ unionByName _)
      val ip = rows0.groupBy($"r", $"bkt")
        .agg(sum($"a").as("ta"), sum($"b").as("tb"))
        .groupBy($"r").agg(sum($"ta" * $"tb").as("est"))
      ip.crossJoin(broadcast(ex))
        .select($"r", $"est", $"exact_size",
          ($"est" >= $"exact_size").as("never_undercounts"),
          when($"exact_size" === 0, 0L)
            .otherwise(expr(
              "1000000 * (est - exact_size) DIV exact_size"))
            .as("over_ppm"))
    },

    // ---- market-basket co-purchase lift -----------------------------------
    Qry(
      "q269_copurchase_lift",
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok,
         |    l_partkey AS pk FROM lineitem),
         |no AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
         |       FROM items),
         |pc AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM items
         |       GROUP BY 1),
         |pr AS (SELECT a.pk AS pa, b.pk AS pb,
         |    CAST(COUNT(*) AS BIGINT) AS n_ab
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport),
         |lf AS (SELECT pa, pb, n_ab, ca.n AS n_a, cb.n AS n_b,
         |    ((1000000 * n_ab // ca.n) * n_orders) // cb.n AS lift_ppm
         |  FROM pr JOIN pc ca ON pr.pa = ca.pk
         |    JOIN pc cb ON pr.pb = cb.pk, no)
         |SELECT rn, pa, pb, n_ab, n_a, n_b, lift_ppm
         |FROM (SELECT *, row_number() OVER (ORDER BY lift_ppm DESC,
         |    pa, pb) AS rn FROM lf)
         |WHERE rn <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // staged: the distinct (order, part) leaf feeds the pair join
      // twice plus the per-part and order counts
      val items = Staging.stage(
        Tables(spark, dir).lineitem
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
          .distinct(),
        eager = false)
      val no = items.agg(countDistinct($"ok").as("n_orders"))
      val pc = items.groupBy($"pk").agg(count(one).as("n"))
      val pr = items.as("a")
        .join(items.as("b"),
          $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .groupBy($"a.pk".as("pa"), $"b.pk".as("pb"))
        .agg(count(one).as("n_ab"))
        .filter($"n_ab" >= MinSupport)
      val lf = pr
        .join(pc.select($"pk".as("ka"), $"n".as("n_a")), $"pa" === $"ka")
        .join(pc.select($"pk".as("kb"), $"n".as("n_b")), $"pb" === $"kb")
        .crossJoin(broadcast(no))
        // declared flooring order: 1e6*n_ab DIV n_a <= 1e6 (n_ab<=n_a),
        // x n_orders, DIV n_b - every intermediate < 2^63 at any scale
        .select($"pa", $"pb", $"n_ab", $"n_a", $"n_b",
          expr("((1000000 * n_ab DIV n_a) * n_orders) DIV n_b")
            .as("lift_ppm"))
      lf.withColumn("rn", row_number().over(
          Window.orderBy($"lift_ppm".desc, $"pa", $"pb")))
        .filter($"rn" <= TopK)
        .select($"rn", $"pa", $"pb", $"n_ab", $"n_a", $"n_b",
          $"lift_ppm")
    }
  )
}
