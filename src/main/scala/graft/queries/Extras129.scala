package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Hundred-twenty-ninth coverage wave: three audit staples — the
  * model-eval gains table, the Poisson dispersion test, and calendar
  * completeness.
  *
  *  - q335: lift/gains table — rank units by a score (document length
  *    stands in for the model score; the machinery is
  *    score-agnostic), cut into exact deciles by ranked row number,
  *    and report each decile's response rate (outcome: lang = 'en'),
  *    cumulative gains and lift vs the base rate, all in ppm with
  *    integral division. THE campaign/classifier triage chart, exact
  *    in both engines (row_number deciles with (score, id) tie-breaks
  *    cut identical multisets — ntile is avoided deliberately: its
  *    remainder distribution is engine-defined).
  *
  *  - q336: variance-to-mean dispersion index of per-user daily event
  *    counts over the corpus's full day grid (zero days included via
  *    a bounded users × days frame): D = s²/x̄ =
  *    (nΣx²−(Σx)²) / ((n−1)·Σx), emitted as
  *    10⁶·n·(nΣx²−(Σx)²) DIV ((n−1)·Σx·n) — algebraically reduced to
  *    keep every operand integral. D ≈ 10⁶ is Poisson; the query
  *    flags over-dispersed (bursty) and under-dispersed (throttled)
  *    users — the traffic-shape screen behind bot detection.
  *
  *  - q337: calendar completeness — the expected (date, hour) grid
  *    spanned by the corpus (sequence/generate_series from the data's
  *    own min/max date) anti-joined with observed hours: each missing
  *    cell is a row, with expected/observed/missing totals carried as
  *    grid-constant columns. The ingestion-gap audit next to q304's
  *    contract checks.
  *
  * Scale shape: each is one corpus-sized groupBy; deciles/grids/flags
  * run on bounded tables (10 deciles, users × 30 days, days × 24).
  */
object Extras129 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q335_lift_gains",
      """WITH s AS (SELECT doc_id, n_chars,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_chars DESC,
        |      doc_id) AS rn, COUNT(*) OVER () AS n,
        |    SUM(pos) OVER () AS tot_pos FROM s),
        |d AS (SELECT ((rn - 1) * 10) // n + 1 AS decile, COUNT(*) AS dn,
        |    SUM(pos) AS dpos, MAX(n) AS n, MAX(tot_pos) AS tot_pos
        |  FROM r GROUP BY 1)
        |SELECT decile, CAST(dn AS BIGINT) AS dn,
        |  CAST(dpos AS BIGINT) AS dpos,
        |  CAST((1000000 * dpos) // dn AS BIGINT) AS rate_ppm,
        |  CAST((1000000 * SUM(dpos) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    // tot_pos AS BIGINT) AS cum_gain_ppm,
        |  CAST(((1000000 * dpos) // dn) * n // tot_pos AS BIGINT)
        |    AS lift_ppm
        |FROM d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // TWO-PASS GLOBAL RANK (r12 verdict): the first formulation
      // ranked ALL documents with one unpartitioned row_number — a
      // full-corpus single-partition sort. q223's bucketed prefix-sum
      // device applies verbatim to a rank: the total order
      // (n_chars DESC, doc_id) is split into buckets that are
      // CONTIGUOUS in that order — exact n_chars value, sub-bucketed
      // by doc_id range so a heavy tie never serializes —
      //   pass 1: bucket-LOCAL row_number (parallelism = #buckets,
      //           grows with the corpus);
      //   pass 2: per-bucket counts (a tiny aggregate, ~corpus/4096
      //           rows), cumulated in bucket order and broadcast back.
      // rank = bucket offset + local rank — bit-identical to the
      // global row_number because bucket boundaries respect the order.
      // The corpus totals (n, tot_pos) ride the same bucket aggregate
      // as a broadcast 1-row frame, retiring the unpartitioned
      // count/sum windows too.
      val bucketD = 4096L
      val s = graft.operators.Staging.stage(
        Tables(spark, dir).documents
          .select($"doc_id", $"n_chars",
            when($"lang" === "en", 1).otherwise(0).as("pos"))
          .withColumn("bkt", expr(s"doc_id DIV $bucketD")),
        eager = false)
      val wLoc = Window.partitionBy($"n_chars", $"bkt").orderBy($"doc_id")
      // bucket-offset cumulation, TWO-LEVEL (r13 advisory): the bucket
      // table is keyed by (n_chars, doc_id DIV 4096), so its size
      // scales with distinct n_chars — near corpus-sized if lengths
      // are near-unique, and a single unpartitioned window over it
      // would quietly regress to a corpus sort. Bands of 4096 n_chars
      // values are CONTIGUOUS in the (n_chars DESC, doc_id) total
      // order, so rank = global band offset + within-band offset +
      // local rank stays bit-identical while the only unpartitioned
      // window runs over the band table — bounded by the n_chars
      // DOMAIN / 4096 (data-independent), never by corpus cardinality.
      // The within-band window is partitioned (parallel across bands;
      // a single hot band degrades to the old shape, no worse).
      val buckets = s.groupBy($"n_chars".as("__c"), $"bkt".as("__b"))
        .agg(count(lit(1)).as("bc"), sum($"pos").as("bpos"))
        .withColumn("__band", expr("__c DIV 4096"))
      val wInB = Window.partitionBy($"__band")
        .orderBy($"__c".desc, $"__b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wBand = Window.orderBy($"__band".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val bandOffs = buckets.groupBy($"__band")
        .agg(sum($"bc").as("__bandc"))
        .withColumn("boff", coalesce(sum($"__bandc").over(wBand), lit(0L)))
        .select($"__band".as("__bb"), $"boff")
      val offs = buckets
        .withColumn("offw", coalesce(sum($"bc").over(wInB), lit(0L)))
        .join(broadcast(bandOffs), $"__band" === $"__bb")
        .select($"__c", $"__b", ($"boff" + $"offw").as("off"))
      val tots = buckets.agg(sum($"bc").cast(LongType).as("n"),
        sum($"bpos").cast(LongType).as("tot_pos"))
      val r = s
        .withColumn("loc", row_number().over(wLoc))
        .join(broadcast(offs),
          $"n_chars" === $"__c" && $"bkt" === $"__b")
        .withColumn("rn", $"off" + $"loc")
        .crossJoin(broadcast(tots))
      val d = r.groupBy(expr("((rn - 1) * 10) DIV n + 1").as("decile"))
        .agg(count(lit(1)).as("dn"), sum($"pos").as("dpos"),
          max($"n").as("n"), max($"tot_pos").as("tot_pos"))
      d.select($"decile", $"dn".cast(LongType).as("dn"),
          $"dpos".cast(LongType).as("dpos"),
          expr("CAST((1000000 * dpos) DIV dn AS BIGINT)").as("rate_ppm"),
          expr("CAST((1000000 * SUM(dpos) OVER (ORDER BY decile " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
            "DIV tot_pos AS BIGINT)").as("cum_gain_ppm"),
          expr("CAST(((1000000 * dpos) DIV dn) * n DIV tot_pos " +
            "AS BIGINT)").as("lift_ppm"))
    },

    Qry(
      "q336_dispersion_index",
      """WITH days AS (SELECT DISTINCT
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |users AS (SELECT DISTINCT user_id FROM events),
        |obs AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |      AS d, CAST(COUNT(*) AS HUGEINT) AS x
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT u.user_id, dd.d, COALESCE(obs.x, 0) AS x
        |  FROM users u CROSS JOIN days dd
        |  LEFT JOIN obs ON obs.user_id = u.user_id AND obs.d = dd.d),
        |m AS (SELECT user_id, COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(x * x) AS sxx FROM grid GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_days,
        |  CAST(sx AS BIGINT) AS total,
        |  CAST((1000000 * (n * sxx - sx * sx)) // ((n - 1) * sx)
        |    AS BIGINT) AS dispersion_ppm,
        |  CASE WHEN (1000000 * (n * sxx - sx * sx))
        |      // ((n - 1) * sx) > 1200000 THEN 1
        |    WHEN (1000000 * (n * sxx - sx * sx))
        |      // ((n - 1) * sx) < 800000 THEN -1 ELSE 0 END AS flag
        |FROM m WHERE sx > 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
      val days = ev.select(to_date($"ts").as("d")).distinct()
      val users = ev.select($"user_id").distinct()
      val obs = ev.groupBy($"user_id".as("ou"), to_date($"ts").as("od"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("x"))
      val grid = users.crossJoin(broadcast(days))
        .join(obs, $"user_id" === $"ou" && $"d" === $"od", "left_outer")
        .select($"user_id", $"d",
          coalesce($"x", lit(0).cast("decimal(38,0)")).as("x"))
      grid.groupBy($"user_id")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum($"x").as("sx"), sum(expr("x * x")).as("sxx"))
        .filter($"sx" > 0)
        .select($"user_id", $"n".cast(LongType).as("n_days"),
          $"sx".cast(LongType).as("total"),
          expr("CAST((1000000 * (n * sxx - sx * sx)) " +
            "DIV ((n - 1) * sx) AS BIGINT)").as("dispersion_ppm"),
          expr("CASE WHEN (1000000 * (n * sxx - sx * sx)) " +
            "DIV ((n - 1) * sx) > 1200000 THEN 1 " +
            "WHEN (1000000 * (n * sxx - sx * sx)) " +
            "DIV ((n - 1) * sx) < 800000 THEN -1 ELSE 0 END").as("flag"))
    },

    Qry(
      "q337_completeness_gaps",
      """WITH bounds AS (SELECT
        |    MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0,
        |    MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d1 FROM events),
        |dd AS (SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS d FROM bounds),
        |hh AS (SELECT unnest(range(24)) AS hr),
        |grid AS (SELECT d, CAST(hr AS BIGINT) AS hr
        |         FROM dd CROSS JOIN hh),
        |obs AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |    AS d, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr
        |  FROM events)
        |SELECT g.d, CAST(COUNT(*) AS BIGINT) AS expected,
        |  CAST(COUNT(obs.d) AS BIGINT) AS observed,
        |  CAST(COUNT(*) - COUNT(obs.d) AS BIGINT) AS missing,
        |  CAST(MIN(CASE WHEN obs.d IS NULL THEN g.hr END) AS BIGINT)
        |    AS first_gap_hr
        |FROM grid g LEFT JOIN obs ON obs.d = g.d AND obs.hr = g.hr
        |GROUP BY g.d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
      val bounds = ev.agg(min(to_date($"ts")).as("d0"),
        max(to_date($"ts")).as("d1"))
      val dd = bounds
        .select(explode(expr("sequence(d0, d1, interval 1 day)"))
          .as("d"))
      val grid = dd.crossJoin(
        broadcast(spark.range(0, 24).select($"id".as("hr"))))
      val obs = ev.select(to_date($"ts").as("od"),
        hour($"ts").cast(LongType).as("ohr")).distinct()
      grid.join(obs, $"d" === $"od" && $"hr" === $"ohr", "left_outer")
        .groupBy($"d")
        .agg(count(lit(1)).cast(LongType).as("expected"),
          count($"od").cast(LongType).as("observed"),
          (count(lit(1)) - count($"od")).cast(LongType).as("missing"),
          min(when($"od".isNull, $"hr")).cast(LongType)
            .as("first_gap_hr"))
    }
  )
}
