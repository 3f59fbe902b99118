package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.Vectors
import graft.sources.Tables

/** Seventeenth coverage wave: recursive CTEs, calendar-spine gap fill,
  * table profiling, a k-means Lloyd step, and time-weighted averaging. */
object Extras17 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- recursive CTE (SQL surface) -----------------------------------
    // WITH RECURSIVE through spark.sql — a date spine unrolled by the
    // recursion, then aggregated per month against order counts. The
    // recursion depth is bounded (182 days) and the engine-side text is
    // dialect-local while the SEMANTICS are identical. Scale note: a
    // production spine uses sequence()/explode (q118); this exercises
    // Catalyst's UnionLoop path.
    Qry(
      "q117_recursive_spine",
      """WITH RECURSIVE spine(d) AS (
        |  SELECT DATE '1996-01-01'
        |  UNION ALL
        |  SELECT d + 1 FROM spine WHERE d < DATE '1996-06-30'),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT date_trunc('month', spine.d) AS month,
        |  COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_empty_days,
        |  CAST(SUM(COALESCE(daily.n, 0)) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.d = daily.d
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      val tb = t(spark, dir)
      tb.orders.createOrReplaceTempView("orders")
      // 182-day unroll exceeds Spark's default 100-level recursion cap;
      // the MAX RECURSION LEVEL clause is Spark-dialect (DuckDB needs none)
      spark.sql(
        """WITH RECURSIVE spine(d) MAX RECURSION LEVEL 200 AS (
          |  SELECT DATE '1996-01-01'
          |  UNION ALL
          |  SELECT date_add(d, 1) FROM spine WHERE d < DATE '1996-06-30'),
          |daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
          |  FROM orders GROUP BY 1)
          |SELECT CAST(date_trunc('MONTH', spine.d) AS TIMESTAMP) AS month,
          |  COUNT(*) AS n_days,
          |  CAST(SUM(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_empty_days,
          |  CAST(SUM(COALESCE(daily.n, 0)) AS BIGINT) AS n_orders
          |FROM spine LEFT JOIN daily ON spine.d = daily.d
          |GROUP BY 1""".stripMargin)
    },

    // ---- calendar-spine gap fill (scale path) --------------------------
    // Missing-day zero-fill per event type: the spine is generated from
    // each type's own [min_day, max_day] via sequence()/explode — a
    // per-group bounded generator, no recursion, no driver loop. The
    // left join back is an equi-join on (type, day).
    Qry(
      "q118_gap_fill",
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
        |  FROM daily GROUP BY 1),
        |spine AS (SELECT event_type,
        |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM b)
        |SELECT s.event_type, COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_days,
        |  CAST(SUM(COALESCE(d.n, 0)) AS BIGINT) AS n_events
        |FROM spine s LEFT JOIN daily d
        |  ON s.event_type = d.event_type AND s.day = d.day
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val daily = t(spark, dir).events
        .groupBy($"event_type",
          to_date(date_trunc("day", $"ts")).as("day"))
        .agg(count(one).as("n"))
      val spine = daily.groupBy($"event_type")
        .agg(min($"day").as("lo"), max($"day").as("hi"))
        .select($"event_type",
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      spine.join(daily, Seq("event_type", "day"), "left")
        .groupBy($"event_type")
        .agg(count(one).as("n_days"),
          sum(when($"n".isNull, 1L).otherwise(0L)).as("n_zero_days"),
          sum(coalesce($"n", lit(0L))).as("n_events"))
    },

    // ---- table profiling (null / distinct counts per column) -----------
    // The data-quality sweep every ingestion pipeline runs first. One
    // pass + stack() on the Spark side; COUNT(DISTINCT) over doubles is
    // bit-equality on identical parquet values, so it is deterministic
    // cross-engine. Multiple exact distincts expand the scan (documented
    // trade-off — the approx variant is q86's HLL path).
    Qry(
      "q119_profile",
      """SELECT 'event_id' AS col_name, COUNT(*) - COUNT(event_id) AS n_null,
        |  COUNT(DISTINCT event_id) AS n_distinct FROM events
        |UNION ALL SELECT 'user_id', COUNT(*) - COUNT(user_id),
        |  COUNT(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'event_type', COUNT(*) - COUNT(event_type),
        |  COUNT(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'value', COUNT(*) - COUNT(value),
        |  COUNT(DISTINCT value) FROM events
        |UNION ALL SELECT 'props', COUNT(*) - COUNT(props),
        |  COUNT(DISTINCT props) FROM events""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val a = t(spark, dir).events.agg(
        (count(one) - count($"event_id")).as("n1"),
        countDistinct($"event_id").as("d1"),
        (count(one) - count($"user_id")).as("n2"),
        countDistinct($"user_id").as("d2"),
        (count(one) - count($"event_type")).as("n3"),
        countDistinct($"event_type").as("d3"),
        (count(one) - count($"value")).as("n4"),
        countDistinct($"value").as("d4"),
        (count(one) - count($"props")).as("n5"),
        countDistinct($"props").as("d5"))
      a.select(expr(
        """stack(5,
          |  'event_id', n1, d1, 'user_id', n2, d2, 'event_type', n3, d3,
          |  'value', n4, d4, 'props', n5, d5)
          |  AS (col_name, n_null, n_distinct)""".stripMargin))
    },

    // ---- one k-means (Lloyd) iteration over embeddings -----------------
    // Assign every vector to its nearest centroid (q42's broadcast
    // assignment), then recompute centroids as per-dimension means — the
    // building block of distributed k-means. Per-dim means ride the
    // decimal accumulator (a raw double sum would be partial-order
    // dependent); only the first 4 dims are emitted (the gate needs a
    // witness, not the full 64-wide centroid).
    Qry(
      "q120_kmeans_step",
      s"""WITH e AS (SELECT vec_id,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |d AS (SELECT vec_id, cid,
         |    list_reduce(list_prepend(0.0e0, list_transform(range(len(v)),
         |      i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))),
         |      (acc, x) -> acc + x) AS d2, v
         |  FROM e, c),
         |assign AS (SELECT vec_id, cid, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1)
         |SELECT cid, COUNT(*) AS n_members,
         |  round(${dsumSql("v[1]")} / COUNT(*), 6) AS c0,
         |  round(${dsumSql("v[2]")} / COUNT(*), 6) AS c1,
         |  round(${dsumSql("v[3]")} / COUNT(*), 6) AS c2,
         |  round(${dsumSql("v[4]")} / COUNT(*), 6) AS c3
         |FROM assign GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Tables(spark, dir).embeddings
        .select($"vec_id", Vectors.toDouble($"embedding").as("v"))
      val c = e.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"v".as("cv"))
      val w = Window.partitionBy($"vec_id").orderBy($"d2", $"cid")
      e.crossJoin(broadcast(c))
        .select($"vec_id", $"cid", Vectors.distSq($"v", $"cv").as("d2"),
          $"v")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"cid")
        .agg(count(one).as("n_members"),
          round(dsum(element_at($"v", 1)) / count(one), 6).as("c0"),
          round(dsum(element_at($"v", 2)) / count(one), 6).as("c1"),
          round(dsum(element_at($"v", 3)) / count(one), 6).as("c2"),
          round(dsum(element_at($"v", 4)) / count(one), 6).as("c3"))
    },

    // ---- time-weighted average (TWAP) ----------------------------------
    // The reference's VWAP sibling: each observation weighted by its
    // holding time (ms to the next event of the same type). Weights are
    // exact integers; value×gap products route through the decimal
    // accumulator. One window + one aggregate, single shuffle on the
    // series key.
    Qry(
      "q121_twap",
      s"""WITH e AS (SELECT event_type, event_id, value,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
         |g AS (SELECT event_type, value,
         |    lead(ms) OVER (PARTITION BY event_type
         |      ORDER BY ms, event_id) - ms AS gap
         |  FROM e)
         |SELECT event_type, COUNT(gap) AS n_holds,
         |  CAST(SUM(gap) AS BIGINT) AS held_ms,
         |  round(${dsumSql("value * gap")} / CAST(SUM(gap) AS BIGINT), 6)
         |    AS twap
         |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin) {
      (spark, dir) =>
        import spark.implicits._
        val w = Window.partitionBy($"event_type").orderBy($"ms", $"event_id")
        t(spark, dir).events
          .select($"event_type", $"event_id", $"value",
            unix_millis($"ts").as("ms"))
          .withColumn("gap", lead($"ms", 1).over(w) - $"ms")
          .filter($"gap".isNotNull)
          .groupBy($"event_type")
          .agg(count($"gap").as("n_holds"), sum($"gap").as("held_ms"),
            round(dsum($"value" * $"gap") / sum($"gap"), 6).as("twap"))
    }
  )
}
