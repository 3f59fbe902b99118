package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, Staging, TextOps}
import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-fifth coverage wave: per-node clustering coefficient, and
  * the MAD anomaly detector on the stream.
  *
  *  - q297: local clustering coefficient over the near-dup graph —
  *    cc(v) = 2·T(v) / (d(v)·(d(v)−1)) in ppm, the per-node density
  *    number that separates "hub of a tight boilerplate family"
  *    (cc→1) from "string of incidental matches" (cc→0); with q95
  *    degrees, q146 global triangles, q74 components, q262 PageRank
  *    and q293 LPA communities this completes the standard per-node
  *    graph profile. All integer: T(v) counts neighbor pairs that
  *    close, the ratio floors to ppm. Scale shape: the triangle join
  *    is neighbor×neighbor per node over the SPARSE thresholded dup
  *    graph (the same staged edge leaf every graph query shares) —
  *    bounded by Σd(v)², never corpus rows; no all-pairs anywhere.
  *  - q298: q295's median/MAD anomaly flags fed by a stream — the
  *    hourly (type, hour) value registers are the streaming
  *    aggregation's state (complete mode), the exact-median/MAD tail
  *    runs post-sink over the bounded hourly series. State is
  *    time-bounded (hours × types), the honest bound a monitoring
  *    deployment accepts and q275 documents. Shares q295's oracle
  *    text VERBATIM (the q281/q283 pattern).
  */
object Extras105 {

  val all: Seq[Qry] = Seq(

    // ---- local clustering coefficient --------------------------------------
    Qry(
      "q297_clustering_coeff",
      s"""WITH ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id)
         |          AS n, h
         |        FROM shc),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |    COUNT(*) AS shared, MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ed0 AS (SELECT da, db FROM pairs
         |        WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5e0),
         |edges AS (SELECT da AS a, db AS b FROM ed0
         |          UNION ALL SELECT db, da FROM ed0),
         |deg AS (SELECT a AS v, COUNT(*) AS d FROM edges GROUP BY 1),
         |tri AS (SELECT e1.a AS v, COUNT(*) AS t
         |  FROM edges e1 JOIN edges e2
         |    ON e1.a = e2.a AND e1.b < e2.b
         |  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
         |  GROUP BY 1)
         |SELECT deg.v AS member, CAST(d AS BIGINT) AS degree,
         |  CAST(COALESCE(t, 0) AS BIGINT) AS triangles,
         |  CAST(CASE WHEN d < 2 THEN 0
         |    ELSE 2000000 * COALESCE(t, 0) // (d * (d - 1)) END
         |    AS BIGINT) AS cc_ppm
         |FROM deg LEFT JOIN tri ON deg.v = tri.v""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val pairs = Dedup.jaccardPairs(
          Dedup.shingleHashes(Tables(spark, dir).documents,
            "doc_id", "text"), "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b")
      // the symmetrized edge list is the loop-shared leaf: degree scan,
      // both wedge sides and the closing-edge probe all read it
      val edges = Staging.stage(
        pairs.select($"id_a".as("a"), $"id_b".as("b"))
          .unionByName(pairs.select($"id_b".as("a"), $"id_a".as("b"))),
        eager = false)
      val deg = edges.groupBy($"a".as("v")).agg(count(lit(1)).as("d"))
      val tri = edges.select($"a".as("v"), $"b".as("u"))
        .join(edges.select($"a".as("v2"), $"b".as("w")),
          $"v" === $"v2" && $"u" < $"w")
        .join(edges.select($"a".as("x"), $"b".as("y")),
          $"x" === $"u" && $"y" === $"w")
        .groupBy($"v").agg(count(lit(1)).as("t"))
        .select($"v".as("tv"), $"t")
      deg.join(tri, $"v" === $"tv", "left")
        .select($"v".as("member"), $"d".cast(LongType).as("degree"),
          coalesce($"t", lit(0L)).cast(LongType).as("triangles"),
          when($"d" < 2, 0L)
            .otherwise(expr("2000000 * coalesce(t, 0) DIV (d * (d - 1))"))
            .cast(LongType).as("cc_ppm"))
    },

    // ---- MAD anomaly flags under Structured Streaming ----------------------
    Qry("q298_stream_mad", Extras104.MadOracle) { (spark, dir) =>
      import spark.implicits._
      // streaming state = the hourly value registers per (type, hour) —
      // time-bounded, the register discipline at the monitoring grain
      val h = Streams.fileStream(spark, dir, "events")
        .groupBy($"event_type",
          (unix_timestamp(date_trunc("hour", $"ts")) / 3600)
            .cast(LongType).as("hi"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vc"))
      Extras104.madTail(Streams.runToMemory(h, "complete"))
    }
  )
}
