package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Ninety-sixth coverage wave: the sketch-driven join-order advisor and
  * KMV set intersection.
  *
  *  - q284: join-order advisor — q268's CMS inner product applied to
  *    the optimizer's actual question: for the 3-table join
  *    customer ⋈ orders ⋈ lineitem, which pairwise join first? The
  *    advisor estimates |customer ⋈ orders| (on custkey) and
  *    |orders ⋈ lineitem| (on orderkey) from two sketch pairs built
  *    in ONE pass per table, compares against the exact sizes, and
  *    ranks the candidate orders by estimated intermediate volume —
  *    the decision a cost-based optimizer makes from statistics,
  *    here made from mergeable sketches a 1000-shard table can
  *    maintain incrementally. Output: per candidate first-join, the
  *    estimate, the exact, and the chosen rank.
  *  - q285: KMV (k-minimum-values) sketch intersection — the sketch
  *    that answers intersections DIRECTLY, vs q276's HLL
  *    inclusion-exclusion detour: keep the k=256 smallest hashes per
  *    source; the union estimate is (k-1)·M / h_(k) over the merged
  *    bottom-k, and Jaccard is estimated from the shared fraction of
  *    the merged bottom-k, so inter = J·union needs no subtraction of
  *    two large estimates. Per source pair: KMV intersection estimate
  *    vs exact (signed ppm error) — the measured comparison a team
  *    picking a sketch reads next to q276's table. Integer-exact: KMV
  *    arithmetic is integer DIV over 60-bit hashes; ranks via
  *    bottom-k windows over k-bounded merged sets.
  */
object Extras96 {

  private val one = lit(1)
  private val Depth = 4
  private val Width = 256
  /** KMV bottom-k size. */
  private val K = 256
  /** Hash domain for KMV: TextOps.P (hashes are uniform in [0, P)). */
  private val P = TextOps.P

  val all: Seq[Qry] = Seq(

    // ---- sketch-driven join-order advisor ----------------------------------
    Qry(
      "q284_join_order_advisor", {
        // ONE md5 per row, split into Depth bucket fields (vs q268's
        // salted md5 PER DEPTH): at table-scan scale the hash is the
        // dominant cost, so the sketch build pays 1 digest/row, not 4
        def sk(table: String, key: String, name: String) = {
          val h = TextOps.oracleHashSql(s"CAST($key AS VARCHAR)")
          val rows = (0 until Depth).map(i =>
            s"SELECT $i AS r, (h // ${1L << (8 * i)}) % $Width AS bkt" +
              s" FROM hh")
            .mkString("\nUNION ALL ")
          s"""$name AS (SELECT r, bkt, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (WITH hh AS (SELECT $h AS h FROM $table) $rows)
             |  GROUP BY 1, 2)""".stripMargin
        }
        s"""WITH ${sk("customer", "c_custkey", "skc")},
           |${sk("orders", "o_custkey", "sko1")},
           |${sk("orders", "o_orderkey", "sko2")},
           |${sk("lineitem", "l_orderkey", "skl")},
           |e1 AS (SELECT CAST(MIN(ip) AS BIGINT) AS est FROM (
           |  SELECT a.r, SUM(a.c * b.c) AS ip FROM skc a
           |  JOIN sko1 b ON a.r = b.r AND a.bkt = b.bkt GROUP BY 1)),
           |e2 AS (SELECT CAST(MIN(ip) AS BIGINT) AS est FROM (
           |  SELECT a.r, SUM(a.c * b.c) AS ip FROM sko2 a
           |  JOIN skl b ON a.r = b.r AND a.bkt = b.bkt GROUP BY 1)),
           |x1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM customer
           |       JOIN orders ON c_custkey = o_custkey),
           |x2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM orders
           |       JOIN lineitem ON o_orderkey = l_orderkey),
           |cand AS (
           |  SELECT 'customer_orders' AS first_join, e1.est, x1.exact
           |  FROM e1, x1
           |  UNION ALL
           |  SELECT 'orders_lineitem', e2.est, x2.exact FROM e2, x2)
           |SELECT first_join, est, exact,
           |  CAST(row_number() OVER (ORDER BY est, first_join)
           |    AS BIGINT) AS chosen_rank,
           |  CAST(est >= exact AS BOOLEAN) AS never_undercounts
           |FROM cand""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // single scan + single digest per row; Depth bucket cells via
      // byte-slices of the one 60-bit hash (see the oracle note)
      def sketch(df: org.apache.spark.sql.DataFrame,
          key: org.apache.spark.sql.Column) =
        df.select(TextOps.hashMod(key.cast("string")).as("h"))
          .select(explode(array((0 until Depth).map(i =>
            struct(lit(i).as("r"),
              expr(s"(h div ${1L << (8 * i)}) % $Width").as("bkt"))): _*))
            .as("c0"))
          .select($"c0.r".as("r"), $"c0.bkt".as("bkt"))
          .groupBy($"r", $"bkt").agg(count(one).as("c"))
      def ip(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) =
        a.join(b.select($"r".as("r2"), $"bkt".as("bkt2"),
            $"c".as("c2")), $"r" === $"r2" && $"bkt" === $"bkt2")
          .groupBy($"r").agg(sum($"c" * $"c2").as("ipr"))
          .agg(min($"ipr").as("est"))
      val tt = Tables(spark, dir)
      val e1 = ip(sketch(tt.customer, $"c_custkey"),
        sketch(tt.orders, $"o_custkey"))
      val e2 = ip(sketch(tt.orders, $"o_orderkey"),
        sketch(tt.lineitem, $"l_orderkey"))
      val x1 = tt.customer.join(tt.orders, $"c_custkey" === $"o_custkey")
        .agg(count(one).as("exact"))
      val x2 = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
        .agg(count(one).as("exact"))
      val cand = e1.crossJoin(x1)
        .select(lit("customer_orders").as("first_join"), $"est", $"exact")
        .unionByName(e2.crossJoin(x2)
          .select(lit("orders_lineitem").as("first_join"), $"est",
            $"exact"))
      cand.select($"first_join", $"est", $"exact",
        row_number().over(Window.orderBy($"est", $"first_join"))
          .cast(LongType).as("chosen_rank"),
        ($"est" >= $"exact").as("never_undercounts"))
    },

    // ---- KMV bottom-k intersection ------------------------------------------
    Qry(
      "q285_kmv_intersect",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |td AS (SELECT DISTINCT d.source AS grp, sh.h
         |  FROM sh JOIN documents d USING (doc_id)),
         |kmv AS (SELECT grp, h FROM (
         |    SELECT grp, h, row_number() OVER (PARTITION BY grp
         |      ORDER BY h) AS rn FROM td) WHERE rn <= $K),
         |pairs AS (SELECT a.grp AS sa, b.grp AS sb
         |  FROM (SELECT DISTINCT grp FROM td) a
         |  JOIN (SELECT DISTINCT grp FROM td) b ON a.grp < b.grp),
         |mrg AS (SELECT sa, sb, h, shared FROM (
         |    SELECT p.sa, p.sb, k.h,
         |      CAST(COUNT(*) = 2 AS BIGINT) AS shared,
         |      row_number() OVER (PARTITION BY p.sa, p.sb
         |        ORDER BY k.h) AS rn
         |    FROM pairs p JOIN kmv k ON k.grp IN (p.sa, p.sb)
         |    GROUP BY p.sa, p.sb, k.h) WHERE rn <= $K),
         |agg AS (SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS kk,
         |    CAST(SUM(shared) AS BIGINT) AS nsh,
         |    CAST(MAX(h) AS BIGINT) AS hk
         |  FROM mrg GROUP BY 1, 2),
         |est AS (SELECT sa, sb, kk, nsh,
         |    (kk - 1) * $P // hk AS est_union,
         |    ((kk - 1) * $P // hk) * nsh // kk AS est_inter
         |  FROM agg),
         |ex AS (SELECT a.grp AS sa, b.grp AS sb,
         |    CAST(COUNT(*) AS BIGINT) AS exact_inter
         |  FROM td a JOIN td b ON a.h = b.h AND a.grp < b.grp
         |  GROUP BY 1, 2)
         |SELECT e.sa, e.sb, kk, nsh,
         |  CAST(est_union AS BIGINT) AS est_union,
         |  CAST(est_inter AS BIGINT) AS est_inter,
         |  COALESCE(ex.exact_inter, 0) AS exact_inter,
         |  CASE WHEN COALESCE(ex.exact_inter, 0) = 0 THEN NULL
         |    ELSE CAST(floor(1000000.0 * (est_inter - ex.exact_inter)
         |      / ex.exact_inter) AS BIGINT) END AS err_ppm
         |FROM est e LEFT JOIN ex ON ex.sa = e.sa AND ex.sb = e.sb"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val td = graft.operators.Dedup.shingleHashes(
        Tables(spark, dir).documents, "doc_id", "text",
        carry = Seq("source"))
        .select($"source".as("grp"), $"h").distinct()
      // bottom-k per source: rank-limit pushdown keeps a partial
      // bottom-k per input partition before the per-source exchange
      val wG = Window.partitionBy($"grp").orderBy($"h")
      val kmv = td.withColumn("rn", row_number().over(wG))
        .filter($"rn" <= K).select($"grp", $"h")
      val srcs = td.select($"grp").distinct()
      val pairs = srcs.select($"grp".as("sa"))
        .join(srcs.select($"grp".as("sb")), $"sa" < $"sb")
      // merged bottom-k per pair: k-bounded inputs, k-bounded output
      val wP = Window.partitionBy($"sa", $"sb").orderBy($"h")
      val mrg = pairs.join(kmv, $"grp" === $"sa" || $"grp" === $"sb")
        .groupBy($"sa", $"sb", $"h")
        .agg((count(one) === 2).cast(LongType).as("shared"))
        .withColumn("rn", row_number().over(wP))
        .filter($"rn" <= K)
      val agg = mrg.groupBy($"sa", $"sb")
        .agg(count(one).as("kk"), sum($"shared").as("nsh"),
          max($"h").as("hk"))
      val est = agg.select($"sa", $"sb", $"kk", $"nsh",
        expr(s"(kk - 1) * $P DIV hk").as("est_union"),
        expr(s"((kk - 1) * $P DIV hk) * nsh DIV kk").as("est_inter"))
      val ex = td.select($"grp".as("ga"), $"h")
        .join(td.select($"grp".as("gb"), $"h".as("h2")),
          $"h" === $"h2" && $"ga" < $"gb")
        .groupBy($"ga", $"gb").agg(count(one).as("exact_inter"))
      est.join(ex, $"sa" === $"ga" && $"sb" === $"gb", "left")
        .select($"sa", $"sb", $"kk", $"nsh", $"est_union", $"est_inter",
          coalesce($"exact_inter", lit(0L)).as("exact_inter"),
          when(coalesce($"exact_inter", lit(0L)) === 0, lit(null))
            .otherwise(expr(
              "CAST(floor(1000000.0 * (est_inter - exact_inter)" +
                " / exact_inter) AS BIGINT)")).as("err_ppm"))
    }
  )
}
