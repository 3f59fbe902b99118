package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{AsOfJoin, Sessionize}
import graft.sources.Tables

/** Seventy-ninth coverage wave: warehouse temporal joins and exact
  * distribution drift.
  *
  *  - q249: SCD2 point-in-time lookup — the dimension-probe every
  *    warehouse runs against a versioned dimension: for each fact row
  *    (errors), the dimension version (the user's last NON-error
  *    activity state, built with q167's change-point machinery) valid
  *    at the fact's event time. The efficient form IS a backward as-of
  *    on valid_from (one union + single-shuffle running-last pass —
  *    never an interval theta join), with the interval's upper bound
  *    kept as an emitted sanity flag rather than a join residual.
  *  - q250: last-touch session attribution — the canonical event-
  *    analytics composition: click sessions (30-min gap) + backward
  *    as-of from each purchase to its latest prior click, carrying the
  *    click's session id, then the session's stats joined back. One
  *    operator library, three reused pieces, zero new shuffle shapes.
  *  - q251: exact two-sample Kolmogorov–Smirnov drift per source — is
  *    a source's document-length distribution shifted vs the rest of
  *    the corpus? D = max |F_a - F_rest| evaluated in EXACT integer
  *    cross-multiplied form (|cumA·nB − cumB·nA| over the distinct-
  *    length grid — no float CDFs), reported in ppm with the argmax
  *    length. The windows run over the (sources × distinct lengths)
  *    grid, never corpus rows.
  */
object Extras79 {

  private val one = lit(1)
  private val GapMs = 1800000L // 30-min session gap

  /** events as (user_id, event_id, ms, event_type, value). */
  private val eventsMsSql =
    """SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
      |  event_type, value FROM events""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- SCD2 point-in-time dimension lookup ------------------------------
    Qry(
      "q249_scd2_pit",
      s"""WITH e AS ($eventsMsSql),
         |dim AS (SELECT * FROM e WHERE event_type <> 'error'),
         |chg AS (
         |  SELECT user_id, ms, event_id, event_type,
         |    lag(event_type) OVER w AS prev
         |  FROM dim
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |cp AS (SELECT user_id, ms, event_id, event_type FROM chg
         |       WHERE prev IS NULL OR prev <> event_type),
         |v AS (SELECT user_id, row_number() OVER w AS version, event_type,
         |    ms AS vf, lead(ms) OVER w AS vt
         |  FROM cp WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |err AS (SELECT event_id, user_id, ms FROM e
         |        WHERE event_type = 'error')
         |SELECT event_id, user_id, ms,
         |  CAST(version AS BIGINT) AS version, state,
         |  CASE WHEN version IS NULL THEN NULL
         |    WHEN vt IS NULL OR ms < vt THEN 1 ELSE 0 END AS pit_ok
         |FROM (
         |  SELECT err.*, v.version, v.event_type AS state, v.vt,
         |    row_number() OVER (PARTITION BY err.event_id
         |                       ORDER BY v.vf DESC, v.version DESC) AS rn
         |  FROM err LEFT JOIN v
         |    ON err.user_id = v.user_id AND v.vf <= err.ms)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"event_type")
      // versioned dimension: q167's change-point machinery over the
      // user's non-error activity (both windows share one exchange)
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val versions = ev.filter($"event_type" =!= "error")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .select($"user_id", row_number().over(w).cast(LongType)
          .as("version"),
          $"event_type", $"ms".as("vf"),
          lead($"ms", 1).over(w).as("vt"))
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ms")
      AsOfJoin.backward(
          errors, versions,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "vf",
          carry = Seq("version" -> "version", "event_type" -> "state",
            "vt" -> "vt"),
          rightTieBreak = Seq("version"))
        .select($"event_id", $"user_id", $"ms", $"version", $"state",
          when($"version".isNull, lit(null).cast("int"))
            .when($"vt".isNull || $"ms" < $"vt", 1).otherwise(0)
            .as("pit_ok"))
    },

    // ---- last-touch session attribution -----------------------------------
    Qry(
      "q250_attribution",
      s"""WITH e AS ($eventsMsSql),
         |c AS (SELECT user_id, event_id, ms FROM e
         |      WHERE event_type = 'click'),
         |flags AS (
         |  SELECT user_id, event_id, ms,
         |    CASE WHEN lag(ms) OVER w IS NULL
         |           OR ms - lag(ms) OVER w >= $GapMs THEN 1 ELSE 0 END
         |      AS new_s
         |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sess AS (
         |  SELECT user_id, event_id, ms,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id
         |  FROM flags),
         |st AS (SELECT user_id, session_id, MIN(ms) AS session_start_ms,
         |    COUNT(*) AS session_clicks
         |  FROM sess GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, ms FROM e
         |      WHERE event_type = 'purchase'),
         |att AS (SELECT event_id, user_id, ms, click_id, session_id,
         |    ms - click_ms AS gap_ms
         |  FROM (
         |    SELECT p.*, s.event_id AS click_id, s.ms AS click_ms,
         |      s.session_id,
         |      row_number() OVER (PARTITION BY p.event_id
         |                         ORDER BY s.ms DESC, s.event_id DESC)
         |        AS rn
         |    FROM p LEFT JOIN sess s
         |      ON p.user_id = s.user_id AND s.ms <= p.ms)
         |  WHERE rn = 1)
         |SELECT a.event_id, a.user_id, a.ms, a.click_id,
         |  CAST(a.session_id AS BIGINT) AS session_id,
         |  st.session_start_ms,
         |  CAST(st.session_clicks AS BIGINT) AS session_clicks,
         |  a.gap_ms
         |FROM att a LEFT JOIN st
         |  ON a.user_id = st.user_id AND a.session_id = st.session_id"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"event_type")
      val sess = Sessionize.byGap(
        ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"ms"),
        keys = Seq("user_id"), timeMs = "ms", gapMs = GapMs,
        tieBreak = Seq("event_id"))
      val st = sess.groupBy($"user_id".as("su"), $"session_id".as("sid"))
        .agg(min($"ms").as("session_start_ms"),
          count(one).as("session_clicks"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ms")
      AsOfJoin.backward(
          purchases, sess,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ms", rightTime = "ms",
          carry = Seq("event_id" -> "click_id", "ms" -> "click_ms",
            "session_id" -> "session_id"),
          rightTieBreak = Seq("event_id"))
        .join(st, $"user_id" === $"su" && $"session_id" === $"sid",
          "left_outer")
        .select($"event_id", $"user_id", $"ms", $"click_id",
          $"session_id", $"session_start_ms", $"session_clicks",
          ($"ms" - $"click_ms").as("gap_ms"))
    },

    // ---- exact two-sample KS drift per source -----------------------------
    Qry(
      "q251_ks_drift",
      s"""WITH cnts AS (SELECT source, n_chars AS len,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |lens AS (SELECT len, CAST(SUM(c) AS BIGINT) AS call FROM cnts
         |  GROUP BY 1),
         |cum AS (SELECT len, CAST(SUM(call) OVER (ORDER BY len
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_all
         |  FROM lens),
         |na AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_a FROM cnts
         |  GROUP BY 1),
         |n AS (SELECT CAST(SUM(call) AS BIGINT) AS n FROM lens),
         |grid AS (SELECT s.source, l.len, l.cum_all,
         |    CAST(SUM(COALESCE(c.c, 0)) OVER (PARTITION BY s.source
         |      ORDER BY l.len ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS cum_a
         |  FROM (SELECT DISTINCT source FROM cnts) s
         |  CROSS JOIN cum l
         |  LEFT JOIN cnts c ON c.source = s.source AND c.len = l.len),
         |d AS (SELECT g.source, g.len,
         |    abs(g.cum_a * (n.n - na.n_a)
         |      - (g.cum_all - g.cum_a) * na.n_a) AS dnum,
         |    na.n_a, n.n - na.n_a AS n_b
         |  FROM grid g JOIN na ON g.source = na.source CROSS JOIN n)
         |SELECT source, n_a, n_b,
         |  CAST(1000000 * dnum // (n_a * n_b) AS BIGINT) AS d_ppm,
         |  len AS at_len
         |FROM (SELECT *, row_number() OVER (PARTITION BY source
         |        ORDER BY dnum DESC, len) AS rn FROM d)
         |WHERE rn = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val cnts = Tables(spark, dir).documents
        .groupBy($"source", $"n_chars".as("len"))
        .agg(count(one).as("c"))
      // all windows below run over the (sources x distinct lengths)
      // grid — bounded by value cardinality, never corpus rows; the
      // global cum_all window is over the distinct-length table only
      val lens = cnts.groupBy($"len").agg(sum($"c").as("call"))
        .withColumn("cum_all", sum($"call").over(
          Window.orderBy($"len")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val na = cnts.groupBy($"source".as("ns")).agg(sum($"c").as("n_a"))
      val n = lens.agg(sum($"call").as("n"))
      val wCum = Window.partitionBy($"source").orderBy($"len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grid = cnts.select($"source").distinct()
        .crossJoin(lens.select($"len", $"cum_all"))
        .join(cnts.withColumnRenamed("source", "cs")
          .withColumnRenamed("len", "cl"),
          $"source" === $"cs" && $"len" === $"cl", "left_outer")
        .withColumn("cum_a",
          sum(coalesce($"c", lit(0L))).over(wCum))
      val wTop = Window.partitionBy($"source")
        .orderBy($"dnum".desc, $"len")
      grid
        .join(broadcast(na), $"source" === $"ns")
        .crossJoin(broadcast(n))
        .withColumn("n_b", $"n" - $"n_a")
        .withColumn("dnum",
          abs($"cum_a" * $"n_b" - ($"cum_all" - $"cum_a") * $"n_a"))
        .withColumn("rn", row_number().over(wTop))
        .filter($"rn" === 1)
        .select($"source", $"n_a", $"n_b",
          expr("1000000 * dnum DIV (n_a * n_b)").as("d_ppm"),
          $"len".as("at_len"))
    }
  )
}
