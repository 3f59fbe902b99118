package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.sources.Tables

/** Twenty-ninth coverage wave: linear interpolation over a calendar
  * spine — the missing member of the gap-handling family (q71 LOCF
  * fill-forward, q118 zero-fill; this one reconstructs interior values
  * from BOTH neighbors, the standard time-series-db resampling fill). */
object Extras29 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- linear interpolation on per-user daily series ------------------
    // Per-user daily mean value (decimal-exact mean), spine over each
    // user's own [first, last] active day (sequence()/explode — q118's
    // bounded per-group generator), then every MISSING interior day gets
    // v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev) from the
    // nearest observed neighbors via IGNORE NULLS running windows
    // (q71's proven cross-engine construct; both directions here). Gap
    // rows are strictly interior — the spine is bounded by observed
    // days — so neighbors always exist. One shuffle on user_id carries
    // both windows; day arithmetic is integer (epoch days); the final
    // double expression is evaluated identically by both engines and
    // rounded at 6 dp. Only the interpolated rows are emitted.
    Qry(
      "q144_linear_interp",
      s"""WITH daily AS (SELECT user_id,
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         |    ${davgSql("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
         |  FROM daily GROUP BY 1),
         |spine AS (SELECT user_id,
         |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
         |      AS day
         |  FROM b),
         |j AS (SELECT s.user_id, s.day,
         |    date_diff('day', DATE '1970-01-01', s.day) AS di, d.v
         |  FROM spine s LEFT JOIN daily d
         |    ON s.user_id = d.user_id AND s.day = d.day),
         |f AS (SELECT user_id, day, di, v,
         |    last_value(v IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
         |      OVER wp AS pdi,
         |    first_value(v IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN di END IGNORE NULLS)
         |      OVER wn AS ndi
         |  FROM j
         |  WINDOW wp AS (PARTITION BY user_id ORDER BY di
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY di
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, day, CAST(ndi - pdi AS BIGINT) AS gap_len,
         |  round(pv + (nv - pv) * (CAST(di - pdi AS DOUBLE)
         |    / CAST(ndi - pdi AS DOUBLE)), 6) AS v_interp
         |FROM f WHERE v IS NULL""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val daily = t(spark, dir).events
        .select($"user_id", to_date(date_trunc("day", $"ts")).as("day"),
          $"value")
        .groupBy($"user_id", $"day")
        .agg(davg($"value").as("v"))
      val spine = daily.groupBy($"user_id")
        .agg(min($"day").as("lo"), max($"day").as("hi"))
        .select($"user_id",
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val j = spine.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", unix_date($"day").as("di"), $"v")
      val wp = Window.partitionBy($"user_id").orderBy($"di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy($"user_id").orderBy($"di")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDi = when($"v".isNotNull, $"di")
      j.select($"user_id", $"day", $"di", $"v",
          last($"v", ignoreNulls = true).over(wp).as("pv"),
          last(obsDi, ignoreNulls = true).over(wp).as("pdi"),
          first($"v", ignoreNulls = true).over(wn).as("nv"),
          first(obsDi, ignoreNulls = true).over(wn).as("ndi"))
        .filter($"v".isNull)
        .select($"user_id", $"day",
          ($"ndi" - $"pdi").cast("long").as("gap_len"),
          round($"pv" + ($"nv" - $"pv") *
            (($"di" - $"pdi").cast("double") /
              ($"ndi" - $"pdi").cast("double")), 6).as("v_interp"))
    },

    // ---- counter increase / rate with reset detection -------------------
    // The telemetry-counter semantics (PromQL increase()/rate()): per
    // series, sum the positive deltas; a NEGATIVE delta means the
    // counter reset and the post-reset value is the contribution. All
    // delta arithmetic runs in DECIMAL space (2-dp doubles cast exactly;
    // decimal lag/subtract/sum are exact and order-independent on both
    // engines — the established dsum discipline), one double division at
    // the end for the per-second rate. One shuffle on user_id: the lag
    // window and the aggregate share it.
    Qry(
      "q145_counter_rate",
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
        |    CAST(value AS DECIMAL(28,6)) AS v
        |  FROM events),
        |d AS (SELECT user_id, ms, v, v - lag(v) OVER w AS dv
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT user_id, COUNT(*) AS n_samples,
        |  CAST(SUM(CASE WHEN dv < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resets,
        |  CAST(SUM(CASE WHEN dv IS NULL THEN NULL
        |    WHEN dv >= 0 THEN dv ELSE v END) AS DOUBLE) AS increase,
        |  CASE WHEN MAX(ms) > MIN(ms) THEN
        |    round(CAST(SUM(CASE WHEN dv IS NULL THEN NULL
        |      WHEN dv >= 0 THEN dv ELSE v END) AS DOUBLE) * 1000
        |      / (MAX(ms) - MIN(ms)), 6) END AS rate_per_s
        |FROM d GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val d = t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"value".cast(Money).as("v"))
        .select($"user_id", $"ms", $"v",
          ($"v" - lag($"v", 1).over(w)).as("dv"))
      val contrib = when($"dv".isNull, lit(null))
        .when($"dv" >= 0, $"dv").otherwise($"v")
      val span = max($"ms") - min($"ms")
      d.groupBy($"user_id")
        .agg(count(one).as("n_samples"),
          sum(when($"dv" < 0, 1L).otherwise(0L)).as("n_resets"),
          sum(contrib).cast("double").as("increase"),
          when(span > 0,
            round(sum(contrib).cast("double") * 1000 / span, 6))
            .as("rate_per_s"))
    },

    // ---- triangle count on the near-dup graph ---------------------------
    // Duplicate-graph quality diagnostic beyond q95's degree histogram:
    // triangles measure how clique-like the duplicate clusters are
    // (boilerplate hubs produce stars — many edges, few triangles; true
    // re-posts produce cliques). Ordered-edge enumeration — the standard
    // distributed algorithm: edges are canonical (a < b), so each
    // triangle a<b<c is counted exactly once by joining (a,b)⋈(b,c) and
    // closing with (a,c). Two equi-joins over the STAGED pair list, no
    // wedge ever materialized twice; at corpus scale the pair list (the
    // blocked near-dup output) is orders smaller than the corpus, and
    // the join fanout is bounded by the df-capped pair generation
    // upstream.
    Qry(
      "q146_triangle_count",
      s"""WITH ${graft.operators.TextOps.oracleToksCte},
         |${graft.operators.TextOps.oracleSh3Cte},
         |${graft.operators.TextOps.oracleShCappedCte(
             graft.operators.Dedup.DefaultDfCap)},
         |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id) AS n, h
         |        FROM shc),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared,
         |    MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |e AS (SELECT da, db FROM pairs
         |      WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5e0),
         |tri AS (SELECT COUNT(*) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e1.db = e2.da
         |    JOIN e e3 ON e3.da = e1.da AND e3.db = e2.db),
         |deg AS (SELECT (SELECT COUNT(*) FROM e) AS n_edges,
         |    COUNT(DISTINCT node) AS n_nodes
         |  FROM (SELECT da AS node FROM e UNION ALL SELECT db FROM e))
         |SELECT n_nodes, n_edges, CAST(n_triangles AS BIGINT) AS n_triangles
         |FROM deg, tri""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.{Dedup, Staging}
      // the pair list is consumed three times (both wedge sides + the
      // closing join) and once more for the degree stats — staged once;
      // it sits above the whole shingle-join pipeline (cf. jaccardPairs)
      val e = Staging.stage(
        Dedup.jaccardPairs(
            Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
            "doc_id")
          .filter($"jaccard" >= 0.5)
          .select($"id_a".as("da"), $"id_b".as("db")),
        eager = false)
      val wedges = e.select($"da", $"db")
        .join(e.select($"da".as("db2"), $"db".as("dc")),
          $"db" === $"db2")
        .select($"da", $"db", $"dc")
      val tri = wedges
        .join(e.select($"da".as("ta"), $"db".as("tc")),
          $"da" === $"ta" && $"dc" === $"tc")
        .agg(count(one).as("n_triangles"))
      val nodes = e.select($"da".as("node"))
        .unionAll(e.select($"db".as("node")))
        .agg(countDistinct($"node").as("n_nodes"))
      val nEdges = e.agg(count(one).as("n_edges"))
      nodes.crossJoin(nEdges).crossJoin(tri)
        .select($"n_nodes", $"n_edges", $"n_triangles")
    }
  )
}
