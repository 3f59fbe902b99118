package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.PageRank
import graft.sources.Tables
import graft.streaming.Streams

/** Eighty-fifth coverage wave: the iterated PageRank operator joins the
  * oracle-gated catalog, and the stream-stream FULL OUTER interval join.
  *
  *  - q262: [[graft.operators.PageRank.run]] — the library's weighted
  *    power iteration (staged edge leaf, per-round stage+release,
  *    dangling-mass redistribution, exact integer-ppm rounds) has had
  *    only spec coverage since r4; this query is its first
  *    cross-engine oracle pairing. It runs R=3 FIXED rounds (the new
  *    tolPpm<0 mode — convergence-gated round counts are data-
  *    dependent and an unrolled SQL oracle cannot follow them) over
  *    the customer<->supplier trade graph with BOTH edge directions,
  *    so rank genuinely propagates round over round and no node
  *    dangles (dangShare = 0 — the oracle text states the invariant
  *    the graph construction guarantees). The oracle re-derives all
  *    three rounds as unrolled CTEs — the q258/q187 proof shape
  *    applied to graphs; floor(r·w/tw) spelled directly, equal to the
  *    operator's overflow-safe decomposition by the division identity.
  *  - q263: stream-stream FULL OUTER interval join — q255's left-outer
  *    machinery completed to both sides: matched click/error pairs emit
  *    eagerly, an error with no click in its 10-minute lookback emits a
  *    null-right row once the watermark proves no click can arrive, and
  *    a click matching NO error's window emits a null-LEFT row once the
  *    watermark passes the last error window it could have joined. The
  *    per-side typed sentinels (q255's design — Catalyst pushes the
  *    side filter below EventTimeWatermark, so a shared sentinel would
  *    silently stall one watermark) close both sides; both sentinels
  *    sit at the global max event time so neither can emit. Oracle: the
  *    batch left-outer aggregate per error UNION ALL the anti-joined
  *    unmatched clicks.
  */
object Extras85 {

  private val Rounds = 3

  /** One unrolled PageRank round as a DuckDB CTE body: ranks from
    * `prev` (an expression over alias r — pass "1000000" for round 0's
    * uniform init with no join). */
  private def roundCte(name: String, prevCte: Option[String]): String = {
    val (joinPrev, rankExpr) = prevCte match {
      case Some(p) => (s"LEFT JOIN $p r ON r.node = e.src",
        "(r.r * e.w) // tw.tw")
      case None => ("", "(1000000 * e.w) // tw.tw")
    }
    s"""$name AS (SELECT n.node,
       |    150000 + (85 * COALESCE(SUM($rankExpr), 0)) // 100 AS r
       |  FROM n LEFT JOIN e ON e.dst = n.node
       |    LEFT JOIN tw ON tw.src = e.src
       |    $joinPrev
       |  GROUP BY 1)""".stripMargin
  }

  val all: Seq[Qry] = Seq(

    // ---- the iterated PageRank operator, oracle-paired --------------------
    Qry(
      "q262_pagerank_train",
      s"""WITH b AS (SELECT o_custkey AS c, l_suppkey AS s,
         |    CAST(COUNT(*) AS BIGINT) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |e AS (SELECT CAST(2 * c AS BIGINT) AS src,
         |    CAST(2 * s + 1 AS BIGINT) AS dst, w FROM b
         |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
         |    CAST(2 * c AS BIGINT), w FROM b),
         |tw AS (SELECT src, SUM(w) AS tw FROM e GROUP BY 1),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |${roundCte("r1", None)},
         |${roundCte("r2", Some("r1"))},
         |${roundCte("r3", Some("r2"))}
         |SELECT (node - 1) // 2 AS suppkey, CAST(r AS BIGINT) AS rank_ppm
         |FROM r3 WHERE node % 2 = 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val b = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey".cast(LongType).as("c"),
          $"l_suppkey".cast(LongType).as("s"))
        .agg(count(lit(1)).as("w"))
      val edges = b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"),
          $"w")
        .unionByName(b.select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst"),
          $"w"))
      PageRank.run(edges, "src", "dst", "w",
          maxIterations = Rounds, tolPpm = -1L)
        .filter($"id" % 2 === 1)
        .select(expr("(id - 1) DIV 2").as("suppkey"), $"rank_ppm")
    },

    // ---- stream-stream FULL OUTER interval join ---------------------------
    Qry(
      "q263_stream_full_outer_join",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value FROM events),
         |err AS (SELECT * FROM e WHERE event_type = 'error'),
         |clk AS (SELECT * FROM e WHERE event_type = 'click')
         |SELECT 'error' AS side, err.event_id, err.user_id,
         |  CAST(COUNT(c.ms) AS BIGINT) AS n_clicks,
         |  CAST(SUM(err.ms - c.ms) AS BIGINT) AS gap_sum,
         |  ${graft.Exact.dsumSql("c.value")} AS click_val_sum
         |FROM err LEFT JOIN clk c
         |  ON err.user_id = c.user_id
         | AND c.ms >= err.ms - 600000 AND c.ms <= err.ms
         |GROUP BY 2, 3
         |UNION ALL
         |SELECT 'click', c.event_id, c.user_id,
         |  CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
         |FROM clk c
         |WHERE NOT EXISTS (SELECT 1 FROM err
         |  WHERE err.user_id = c.user_id
         |    AND c.ms >= err.ms - 600000 AND c.ms <= err.ms)"""
        .stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
        .filter($"event_type".isin("click", "error"))
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"), $"value")
      // bounded driver state: one max row places the sentinels past
      // every join window + watermark delay (the q255 convention)
      val hi = ev.agg(max($"ms")).head().getLong(0)
      val sentinelMs = hi + 600000L + 1800000L
      def sentinel(uid: Long, eid: Long, kind: String) =
        spark.range(1).select(lit(uid).as("user_id"),
          lit(eid).as("event_id"), lit(kind).as("event_type"),
          lit(sentinelMs).as("ms"), lit(0.0).as("value"))
      val srcDir = Streams.partedDir(s"$dir#q263", Seq(
        ev.unionByName(sentinel(-1L, -1L, "error"))
          .unionByName(sentinel(-2L, -2L, "click"))))
      def side() = spark.readStream.schema(ev.schema).parquet(srcDir)
        .withColumn("ts", timestamp_millis($"ms"))
        .withWatermark("ts", "10 minutes")
      val err = side().filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts".as("ts_e"))
      val clk = side().filter($"event_type" === "click")
        .select($"user_id".as("c_user_id"), $"event_id".as("c_event_id"),
          $"ts".as("ts_c"), $"value".as("cv"))
      val joined = err.join(clk,
        $"user_id" === $"c_user_id" &&
          $"ts_c" >= $"ts_e" - expr("interval 10 minutes") &&
          $"ts_c" <= $"ts_e",
        "full_outer")
        .select($"event_id", $"user_id", $"c_event_id", $"c_user_id",
          (unix_millis($"ts_e") - unix_millis($"ts_c")).as("gap_ms"),
          $"cv", $"ts_c")
      // both sentinels sit at the max event time, so neither window
      // ever closes and neither can emit; the id filters are
      // belt-and-braces for the day the margins change
      val rows = Streams.runToMemory(joined, "append")
      val errSide = rows.filter($"event_id".isNotNull &&
          $"event_id" >= 0)
        .groupBy($"event_id", $"user_id")
        .agg(count($"ts_c").as("n_clicks"),
          sum($"gap_ms").as("gap_sum"),
          graft.Exact.dsum($"cv").as("click_val_sum"))
        .select(lit("error").as("side"), $"event_id", $"user_id",
          $"n_clicks", $"gap_sum", $"click_val_sum")
      val clkSide = rows.filter($"event_id".isNull &&
          $"c_event_id" >= 0)
        .select(lit("click").as("side"), $"c_event_id".as("event_id"),
          $"c_user_id".as("user_id"), lit(0L).as("n_clicks"),
          lit(null).cast(LongType).as("gap_sum"),
          lit(null).cast(DoubleType).as("click_val_sum"))
      errSide.unionByName(clkSide)
    }
  )
}
