package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Ninety-first coverage wave: Merkle-style snapshot reconciliation and
  * robust trend estimation.
  *
  *  - q274: anti-entropy snapshot diff by hierarchical partition
  *    hashes — the "which of my 100 TB changed?" primitive behind
  *    incremental sync and replica repair: row hashes fold
  *    ORDER-INDEPENDENTLY (bit_xor) into 256 bucket digests; only
  *    buckets whose (digest, count) disagree are opened for the
  *    row-level diff, so the reconciliation reads 2x256 digests plus
  *    the changed buckets' rows instead of comparing two corpora
  *    row-by-row (q237's snapshot diff is the full compare; this is
  *    the sublinear-read protocol around it). Snapshot B derives from
  *    A in-engine by hash-chosen mutations (~1% edits, ~1% deletes,
  *    3 inserts — the q256 damage-class pattern), so the oracle
  *    predicts both sides from the synthesis parameters. Scale shape:
  *    two linear hash passes, two 256-row digest tables, and a
  *    row-level join FILTERED to mismatched buckets via broadcast.
  *  - q275: Theil-Sen robust slope per event-type hourly series — the
  *    median of all pairwise slopes, immune to the outlier hours that
  *    wreck the q81-style least-squares fit. Pair slopes order by
  *    row-local IEEE division (identical both engines), the LOWER
  *    median is declared ((n+1) DIV 2), and the output carries the
  *    median pair's exact integer (dy, dx) plus floor(1e6·dy/dx) —
  *    floor on the double ratio, not integer DIV, as a defensive
  *    convention for negative slopes: in the harness's DuckDB 1.0.0
  *    both engines' integer division truncates toward zero (verified
  *    by tools/probe_parity.py's neg_intdiv probe), but `//`'s
  *    negative-operand behavior is the kind of semantic a DuckDB
  *    upgrade could change, and floor-on-double is pinned identical
  *    regardless.
  *    Scale shape: the corpus collapses once to the hourly series;
  *    pairs are quadratic in HOURS (bounded by the time range), never
  *    in events — a deployment with years of hours windows the pair
  *    set; the fixture's 744-hour month needs no window.
  */
object Extras91 {

  private val one = lit(1)
  /** q274 geometry: level-1 buckets; mutation classes per ~1%. */
  private val Buckets = 256
  private val Mod = 101

  val all: Seq[Qry] = Seq(

    // ---- Merkle-style snapshot reconciliation ------------------------------
    Qry(
      "q274_merkle_diff",
      s"""WITH a AS (SELECT doc_id, text,
         |    ${TextOps.oracleHashSql("text")} % $Mod AS cls
         |  FROM documents),
         |b AS (SELECT doc_id, text || ' edited' AS text FROM a
         |      WHERE cls = 0
         |  UNION ALL SELECT doc_id, text FROM a WHERE cls > 1
         |  UNION ALL SELECT 10000000 + i AS doc_id,
         |      'inserted row ' || CAST(i AS VARCHAR) AS text
         |    FROM range(3) t(i)),
         |ra AS (SELECT doc_id, doc_id % $Buckets AS bkt,
         |    ${TextOps.oracleHashSql("CAST(doc_id AS VARCHAR) || ':' || md5(text)")}
         |      AS h
         |  FROM a),
         |rb AS (SELECT doc_id, doc_id % $Buckets AS bkt,
         |    ${TextOps.oracleHashSql("CAST(doc_id AS VARCHAR) || ':' || md5(text)")}
         |      AS h
         |  FROM b),
         |da AS (SELECT bkt, bit_xor(h) AS xa,
         |    CAST(COUNT(*) AS BIGINT) AS n_a FROM ra GROUP BY 1),
         |db AS (SELECT bkt, bit_xor(h) AS xb,
         |    CAST(COUNT(*) AS BIGINT) AS n_b FROM rb GROUP BY 1),
         |mm AS (SELECT COALESCE(da.bkt, db.bkt) AS bkt,
         |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
         |  FROM da FULL JOIN db ON da.bkt = db.bkt
         |  WHERE COALESCE(xa, 0) <> COALESCE(xb, 0)
         |     OR COALESCE(n_a, 0) <> COALESCE(n_b, 0)),
         |diff AS (SELECT COALESCE(ra.bkt, rb.bkt) AS bkt,
         |    CAST(COUNT(*) FILTER (WHERE ra.h IS NOT NULL
         |      AND rb.h IS NOT NULL AND ra.h <> rb.h) AS BIGINT)
         |      AS n_changed,
         |    CAST(COUNT(*) FILTER (WHERE rb.h IS NULL) AS BIGINT)
         |      AS n_deleted,
         |    CAST(COUNT(*) FILTER (WHERE ra.h IS NULL) AS BIGINT)
         |      AS n_inserted
         |  FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id
         |  WHERE COALESCE(ra.bkt, rb.bkt) IN (SELECT bkt FROM mm)
         |  GROUP BY 1)
         |SELECT mm.bkt, n_a, n_b, n_changed, n_deleted, n_inserted
         |FROM mm JOIN diff ON mm.bkt = diff.bkt""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      // snapshot A staged: feeds its own hash pass AND synthesizes B
      val a = Staging.stage(Tables(spark, dir).documents
        .select($"doc_id", $"text",
          (TextOps.md5Long($"text") % TextOps.P % Mod).as("cls")),
        eager = false)
      val b = a.filter($"cls" === 0)
        .select($"doc_id", concat($"text", lit(" edited")).as("text"))
        .unionByName(a.filter($"cls" > 1).select($"doc_id", $"text"))
        .unionByName(spark.range(3).select(
          ($"id" + 10000000L).as("doc_id"),
          concat(lit("inserted row "), $"id").as("text")))
      def rows(df: org.apache.spark.sql.DataFrame) = df.select(
        $"doc_id", ($"doc_id" % Buckets).as("bkt"),
        TextOps.hashMod(concat($"doc_id".cast("string"), lit(":"),
          md5($"text"))).as("h"))
      val ra = rows(a.select($"doc_id", $"text"))
      val rb = rows(b)
      val da = ra.groupBy($"bkt")
        .agg(expr("bit_xor(h)").as("xa"), count(one).as("n_a"))
      val db = rb.groupBy($"bkt")
        .agg(expr("bit_xor(h)").as("xb"), count(one).as("n_b"))
      val mm = da.join(db.withColumnRenamed("bkt", "bkt2"),
          $"bkt" === $"bkt2", "full")
        .select(coalesce($"bkt", $"bkt2").as("bkt"),
          coalesce($"xa", lit(0L)).as("xa"),
          coalesce($"xb", lit(0L)).as("xb"),
          coalesce($"n_a", lit(0L)).as("n_a"),
          coalesce($"n_b", lit(0L)).as("n_b"))
        .filter($"xa" =!= $"xb" || $"n_a" =!= $"n_b")
        .select($"bkt", $"n_a", $"n_b")
      // row-level diff ONLY inside mismatched buckets: the broadcast
      // semi-filter is the sublinear-read step of the protocol
      val mmb = broadcast(mm.select($"bkt".as("mbkt")))
      val raf = ra.join(mmb, $"bkt" === $"mbkt").drop("mbkt")
      val rbf = rb.join(mmb, $"bkt" === $"mbkt").drop("mbkt")
        .select($"doc_id".as("doc_id_b"), $"bkt".as("bkt_b"),
          $"h".as("hb"))
      val diff = raf.join(rbf, $"doc_id" === $"doc_id_b", "full")
        .select(coalesce($"bkt", $"bkt_b").as("dbkt"), $"h", $"hb")
        .groupBy($"dbkt")
        .agg(count(when($"h".isNotNull && $"hb".isNotNull &&
            $"h" =!= $"hb", 1)).as("n_changed"),
          count(when($"hb".isNull, 1)).as("n_deleted"),
          count(when($"h".isNull, 1)).as("n_inserted"))
      mm.join(diff, $"bkt" === $"dbkt")
        .select($"bkt", $"n_a", $"n_b", $"n_changed", $"n_deleted",
          $"n_inserted")
    },

    // ---- Theil-Sen robust slope per series ---------------------------------
    Qry(
      "q275_theil_sen",
      s"""WITH h AS (SELECT event_type,
         |    epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600
         |      AS hi,
         |    CAST(SUM(CAST(value AS DECIMAL(28,6)) * 100) AS BIGINT)
         |      AS vc
         |  FROM events GROUP BY 1, 2),
         |pr AS (SELECT a.event_type AS et,
         |    b.vc - a.vc AS dy, b.hi - a.hi AS dx,
         |    CAST(b.vc - a.vc AS DOUBLE) / (b.hi - a.hi) AS sl,
         |    a.hi AS h1, b.hi AS h2
         |  FROM h a JOIN h b ON a.event_type = b.event_type
         |    AND b.hi > a.hi),
         |rk AS (SELECT et, dy, dx, sl, h1, h2,
         |    row_number() OVER (PARTITION BY et
         |      ORDER BY sl, h1, h2) AS rn,
         |    COUNT(*) OVER (PARTITION BY et) AS np
         |  FROM pr)
         |SELECT et AS event_type, CAST(np AS BIGINT) AS n_pairs,
         |  dy AS med_dy, CAST(dx AS BIGINT) AS med_dx,
         |  CAST(floor(1000000.0 * dy / dx) AS BIGINT) AS slope_ppm
         |FROM rk WHERE rn = (np + 1) // 2""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val h = Staging.stage(Tables(spark, dir).events
        .groupBy($"event_type",
          (unix_timestamp(date_trunc("hour", $"ts")) / 3600)
            .cast(LongType).as("hi"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vc")),
        eager = false)
      val pr = h.select($"event_type".as("et"), $"hi".as("h1"),
          $"vc".as("v1"))
        .join(h.select($"event_type".as("et2"), $"hi".as("h2"),
          $"vc".as("v2")),
          $"et" === $"et2" && $"h2" > $"h1")
        .select($"et", ($"v2" - $"v1").as("dy"), ($"h2" - $"h1").as("dx"),
          (($"v2" - $"v1").cast("double") / ($"h2" - $"h1")).as("sl"),
          $"h1", $"h2")
      val w = Window.partitionBy($"et").orderBy($"sl", $"h1", $"h2")
      pr.withColumn("rn", row_number().over(w))
        .withColumn("np", count(one).over(Window.partitionBy($"et")))
        .filter($"rn" === expr("(np + 1) DIV 2"))
        .select($"et".as("event_type"), $"np".as("n_pairs"),
          $"dy".as("med_dy"), $"dx".cast(LongType).as("med_dx"),
          floor(lit(1000000.0) * $"dy" / $"dx").cast(LongType)
            .as("slope_ppm"))
    }
  )
}
