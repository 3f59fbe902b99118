package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hundred-ninth coverage wave: the data-contract audit — the
  * dbt-test / Great-Expectations-style expectation suite a warehouse
  * runs on every load, as ONE query whose rows are the checks.
  *
  *  - q304: eleven contract checks over the star schema, one result
  *    row each: primary-key uniqueness (customer, orders, part,
  *    supplier; lineitem's composite key), referential integrity as
  *    anti-join orphan counts (orders→customer, lineitem→orders,
  *    lineitem→part, lineitem→supplier; the oracle spells them
  *    NOT EXISTS, not NOT IN — NOT IN's three-valued NULL semantics
  *    would silently empty the check if a child key were ever NULL,
  *    whereas NOT EXISTS matches Spark's left_anti exactly), and accepted-range/null
  *    checks on the columns the TPC-H contract fixes (quantity in
  *    1..50, discount in 0..0.10, non-null ship date). Output =
  *    (check, tbl, n_rows, n_violations, pass) — the table a loader
  *    gates a publish on, and the audit a 100 TB ingest runs BEFORE
  *    the analytics in this catalog assume key semantics (every join
  *    in SURVEY §2.4 silently relies on exactly these invariants;
  *    this query is where they stop being assumptions). And it earns
  *    its keep immediately: the synthetic fixture VIOLATES the
  *    lineitem composite-PK contract (14,168 duplicate
  *    (l_orderkey, l_linenumber) rows at sf0.01 — the generator never
  *    enforced it), so the audit ships a genuine pass=false row the
  *    oracle confirms, instead of a table of vacuous greens.
  *
  *    Scale shape: each uniqueness check is one partial-aggregated
  *    groupBy collapsed to a single row; each referential check is a
  *    broadcast/shuffled LEFT ANTI join counting misses (the same
  *    plan shape as q6); range checks are map-side count-ifs. The
  *    union of eleven one-row frames is driver-free — no collect, no
  *    loop; at scale the checks share scans per table via one pass
  *    each where expressible.
  */
object Extras109 {

  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    Qry(
      "q304_data_contract",
      s"""WITH checks AS (
         |  SELECT 'pk_unique' AS chk, 'customer' AS tbl,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
         |      AS n_violations
         |  FROM customer
         |  UNION ALL
         |  SELECT 'pk_unique', 'orders', CAST(COUNT(*) AS BIGINT),
         |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
         |  FROM orders
         |  UNION ALL
         |  SELECT 'pk_unique', 'part', CAST(COUNT(*) AS BIGINT),
         |    CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT)
         |  FROM part
         |  UNION ALL
         |  SELECT 'pk_unique', 'supplier', CAST(COUNT(*) AS BIGINT),
         |    CAST(COUNT(*) - COUNT(DISTINCT s_suppkey) AS BIGINT)
         |  FROM supplier
         |  UNION ALL
         |  SELECT 'pk_unique', 'lineitem', CAST(COUNT(*) AS BIGINT),
         |    CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
         |      AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'fk_orphans', 'orders->customer',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM orders o WHERE NOT EXISTS
         |    (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)
         |  UNION ALL
         |  SELECT 'fk_orphans', 'lineitem->orders',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM lineitem l WHERE NOT EXISTS
         |    (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)
         |  UNION ALL
         |  SELECT 'fk_orphans', 'lineitem->part',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM lineitem l WHERE NOT EXISTS
         |    (SELECT 1 FROM part WHERE p_partkey = l.l_partkey)
         |  UNION ALL
         |  SELECT 'fk_orphans', 'lineitem->supplier',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         |    CAST(COUNT(*) AS BIGINT)
         |  FROM lineitem l WHERE NOT EXISTS
         |    (SELECT 1 FROM supplier WHERE s_suppkey = l.l_suppkey)
         |  UNION ALL
         |  SELECT 'range_quantity_1_50', 'lineitem',
         |    CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
         |      THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'range_discount_0_10pct', 'lineitem',
         |    CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.10001
         |      THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'not_null_shipdate', 'lineitem',
         |    CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT)
         |  FROM lineitem)
         |SELECT chk, tbl, n_rows, n_violations,
         |  n_violations = 0 AS pass
         |FROM checks""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)

      // composite keys count the ACTUAL column tuple — an encoded
      // single-column key (orderkey * 16 + linenumber) is injective
      // only under a range assumption the audit itself never checks
      // (r11 advisory: a collision would undercount identically in
      // both engines, so the gate could not catch it)
      def pkUnique(tbl: String, df: DataFrame,
          key: org.apache.spark.sql.Column*) =
        df.agg(count(one).as("n_rows"),
            (count(one) - countDistinct(key.head, key.tail: _*))
              .as("n_violations"))
          .select(lit("pk_unique").as("chk"), lit(tbl).as("tbl"),
            $"n_rows", $"n_violations")

      def fkOrphans(label: String, child: DataFrame,
          childKey: String, parent: DataFrame, parentKey: String) = {
        val total = child.agg(count(one).as("n_rows"))
        val orphans = child
          .join(parent.select(col(parentKey)),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(one).as("n_violations"))
        total.crossJoin(orphans)
          .select(lit("fk_orphans").as("chk"), lit(label).as("tbl"),
            $"n_rows", $"n_violations")
      }

      val li = t.lineitem
      val pk = pkUnique("customer", t.customer, $"c_custkey")
        .unionByName(pkUnique("orders", t.orders, $"o_orderkey"))
        .unionByName(pkUnique("part", t.part, $"p_partkey"))
        .unionByName(pkUnique("supplier", t.supplier, $"s_suppkey"))
        .unionByName(pkUnique("lineitem", li,
          $"l_orderkey", $"l_linenumber"))
      val fk = fkOrphans("orders->customer", t.orders, "o_custkey",
          t.customer, "c_custkey")
        .unionByName(fkOrphans("lineitem->orders", li, "l_orderkey",
          t.orders, "o_orderkey"))
        .unionByName(fkOrphans("lineitem->part", li, "l_partkey",
          t.part, "p_partkey"))
        .unionByName(fkOrphans("lineitem->supplier", li, "l_suppkey",
          t.supplier, "s_suppkey"))
      // the three lineitem column contracts share ONE scan
      val ranges = li.agg(count(one).as("n"),
          sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L)
            .otherwise(0L)).as("v_qty"),
          sum(when($"l_discount" < 0 || $"l_discount" > 0.10001, 1L)
            .otherwise(0L)).as("v_disc"),
          sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("v_ship"))
      val rangeRows = ranges.select(
          lit("range_quantity_1_50").as("chk"), lit("lineitem").as("tbl"),
          $"n".as("n_rows"), $"v_qty".as("n_violations"))
        .unionByName(ranges.select(
          lit("range_discount_0_10pct").as("chk"),
          lit("lineitem").as("tbl"),
          $"n".as("n_rows"), $"v_disc".as("n_violations")))
        .unionByName(ranges.select(
          lit("not_null_shipdate").as("chk"), lit("lineitem").as("tbl"),
          $"n".as("n_rows"), $"v_ship".as("n_violations")))
      pk.unionByName(fk).unionByName(rangeRows)
        .select($"chk", $"tbl", $"n_rows", $"n_violations",
          ($"n_violations" === 0).as("pass"))
    }
  )
}
