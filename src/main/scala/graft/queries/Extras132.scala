package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Hundred-thirty-second coverage wave: rank correlation on bounded
  * bins, rich-club mixing, and the dedup family's precision/recall
  * scorecard.
  *
  *  - q342: Spearman rank correlation between quantity and price —
  *    computed WITHOUT a corpus-sized global rank: both variables bin
  *    to bounded marginals (50 quantities × $2,000 price buckets),
  *    tie-corrected midranks come from the marginal cumulative counts
  *    (2·midrank = 2·cum − cnt + 1, kept doubled to stay integral),
  *    and the weighted Pearson moments accumulate exactly in
  *    DECIMAL(38,0) over the bounded cell table. The final ratio
  *    r² = num²/(den₁·den₂) exceeds 38 digits, so it alone converts
  *    to double (one correctly-rounded conversion per operand,
  *    identical in both engines) — sign + r²-ppm reported, q338's
  *    output convention.
  *
  *  - q343: rich-club profile — for k ∈ {16, 32, 64}: the subgraph of
  *    nodes with degree > k, its internal edge count, and its density
  *    against both denominators: C(n,2) (the general rich-club
  *    normalizer) and n_cust·n_supp (the bipartite maximum — the
  *    trade graph cannot close customer–customer edges). "Do hubs
  *    preferentially trade with hubs" at three thresholds, next to
  *    q338's global mixing coefficient.
  *
  *  - q344: the LSH GEOMETRY SWEEP — q179 scores the shipped (B=4,
  *    R=4) banding once; q344 measures the (bands, rows) DECISION:
  *    the same 16 MinHash signatures banded three ways — (8,2)
  *    recall-leaning, (4,4) balanced, (2,8) precision-leaning — each
  *    scored against the shared exact-Jaccard ≥ 0.5 truth in one
  *    result (the S-curve tradeoff read from the gate, the tuning
  *    table a pipeline consults before committing a geometry).
  */
object Extras132 {

  private val K = 16; private val B = 4; private val R = 4
  private val PriceBucket = 200000L // $2,000 cents

  val all: Seq[Qry] = Seq(

    Qry(
      "q342_spearman_binned",
      s"""WITH cell AS (SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(round(l_extendedprice * 100) AS BIGINT)
         |      // $PriceBucket AS b,
         |    CAST(COUNT(*) AS HUGEINT) AS n
         |  FROM lineitem GROUP BY 1, 2),
         |qm AS (SELECT q, SUM(n) AS cnt FROM cell GROUP BY 1),
         |qr AS (SELECT q, 2 * SUM(cnt) OVER (ORDER BY q
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - cnt + 1 AS x2 FROM qm),
         |bm AS (SELECT b, SUM(n) AS cnt FROM cell GROUP BY 1),
         |br AS (SELECT b, 2 * SUM(cnt) OVER (ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - cnt + 1 AS y2 FROM bm),
         |m AS (SELECT SUM(c.n) AS nn, SUM(c.n * qr.x2) AS sx,
         |    SUM(c.n * br.y2) AS sy, SUM(c.n * qr.x2 * br.y2) AS sxy,
         |    SUM(c.n * qr.x2 * qr.x2) AS sxx,
         |    SUM(c.n * br.y2 * br.y2) AS syy
         |  FROM cell c JOIN qr ON qr.q = c.q JOIN br ON br.b = c.b)
         |SELECT CAST(nn AS BIGINT) AS n,
         |  CAST(CASE WHEN nn * sxy - sx * sy > 0 THEN 1
         |    WHEN nn * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INTEGER)
         |    AS sign,
         |  CAST(round(1000000 * (CAST(nn * sxy - sx * sy AS DOUBLE)
         |      * CAST(nn * sxy - sx * sy AS DOUBLE))
         |    / (CAST(nn * sxx - sx * sx AS DOUBLE)
         |      * CAST(nn * syy - sy * sy AS DOUBLE))) AS BIGINT)
         |    AS r2_ppm
         |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val cell = Tables(spark, dir).lineitem
        .groupBy($"l_quantity".cast(LongType).as("q"),
          expr(s"CAST(round(l_extendedprice * 100) AS BIGINT) " +
            s"DIV $PriceBucket").as("b"))
        .agg(dec(count(lit(1))).as("n"))
      val wq = Window.orderBy($"q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qr = cell.groupBy($"q").agg(sum($"n").as("cnt"))
        .select($"q",
          (lit(2) * sum($"cnt").over(wq) - $"cnt" + 1).as("x2"))
      val wb = Window.orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val br = cell.groupBy($"b").agg(sum($"n").as("cnt"))
        .select($"b",
          (lit(2) * sum($"cnt").over(wb) - $"cnt" + 1).as("y2"))
      cell.join(broadcast(qr), "q").join(broadcast(br), "b")
        .agg(sum($"n").as("nn"), sum(expr("n * x2")).as("sx"),
          sum(expr("n * y2")).as("sy"),
          sum(expr("n * x2 * y2")).as("sxy"),
          sum(expr("n * x2 * x2")).as("sxx"),
          sum(expr("n * y2 * y2")).as("syy"))
        .select($"nn".cast(LongType).as("n"),
          expr("CAST(CASE WHEN nn * sxy - sx * sy > 0 THEN 1 " +
            "WHEN nn * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INT)")
            .as("sign"),
          expr("CAST(round(1000000 * (CAST(nn * sxy - sx * sy " +
            "AS DOUBLE) * CAST(nn * sxy - sx * sy AS DOUBLE)) " +
            "/ (CAST(nn * sxx - sx * sx AS DOUBLE) " +
            "* CAST(nn * syy - sy * sy AS DOUBLE))) AS BIGINT)")
            .as("r2_ppm"))
    },

    Qry(
      "q343_rich_club",
      """WITH b AS (SELECT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT CAST(2 * c AS BIGINT) AS src,
        |    CAST(2 * s + 1 AS BIGINT) AS dst FROM b),
        |d AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT src AS node FROM e
        |    UNION ALL SELECT dst FROM e) GROUP BY 1),
        |ks AS (SELECT unnest([16, 32, 64]) AS k),
        |hi AS (SELECT ks.k, d.node FROM ks JOIN d ON d.deg > ks.k),
        |cnt AS (SELECT k, COUNT(*) AS nh,
        |    SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS nc,
        |    SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS ns
        |  FROM hi GROUP BY 1),
        |ew AS (SELECT h1.k, COUNT(*) AS m FROM e
        |  JOIN hi h1 ON h1.node = e.src
        |  JOIN hi h2 ON h2.node = e.dst AND h2.k = h1.k
        |  GROUP BY 1)
        |SELECT cnt.k, CAST(cnt.nh AS BIGINT) AS n_nodes,
        |  CAST(COALESCE(ew.m, 0) AS BIGINT) AS n_edges_within,
        |  CAST(CASE WHEN cnt.nh > 1 THEN (1000000 * COALESCE(ew.m, 0))
        |    // (cnt.nh * (cnt.nh - 1) // 2) END AS BIGINT)
        |    AS density_ppm,
        |  CAST(CASE WHEN cnt.nc * cnt.ns > 0
        |    THEN (1000000 * COALESCE(ew.m, 0)) // (cnt.nc * cnt.ns)
        |    END AS BIGINT) AS bipartite_density_ppm
        |FROM cnt LEFT JOIN ew ON ew.k = cnt.k""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      val b = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey".cast(LongType).as("c"),
          $"l_suppkey".cast(LongType).as("s"))
        .agg(count(lit(1)).as("w"))
      val e = b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
      val d = e.select($"src".as("node"))
        .unionByName(e.select($"dst".as("node")))
        .groupBy($"node").agg(count(lit(1)).cast(LongType).as("deg"))
      val ks = Seq(16L, 32L, 64L).toDF("k")
      val hi = broadcast(ks).join(d, $"deg" > $"k")
        .select($"k", $"node")
      val cnt = hi.groupBy($"k").agg(count(lit(1)).as("nh"),
        sum(when($"node" % 2 === 0, 1).otherwise(0)).as("nc"),
        sum(when($"node" % 2 === 1, 1).otherwise(0)).as("ns"))
      val ew = e
        .join(hi.select($"k".as("k1"), $"node".as("h1")),
          $"src" === $"h1")
        .join(hi.select($"k".as("k2"), $"node".as("h2")),
          $"dst" === $"h2" && $"k1" === $"k2")
        .groupBy($"k1".as("ke")).agg(count(lit(1)).as("m"))
      cnt.join(ew, $"k" === $"ke", "left_outer")
        .select($"k", $"nh".cast(LongType).as("n_nodes"),
          coalesce($"m", lit(0L)).cast(LongType).as("n_edges_within"),
          expr("CAST(CASE WHEN nh > 1 THEN (1000000 * COALESCE(m, 0)) " +
            "DIV (nh * (nh - 1) DIV 2) END AS BIGINT)")
            .as("density_ppm"),
          expr("CAST(CASE WHEN nc * ns > 0 THEN " +
            "(1000000 * COALESCE(m, 0)) DIV (nc * ns) END AS BIGINT)")
            .as("bipartite_density_ppm"))
    },

    Qry(
      "q344_lsh_geometry_sweep", {
        val minCols = (0 until K).map(i =>
          s"min((h * ${TextOps.aParam(i)} + ${TextOps.bParam(i)}) % ${TextOps.P}) AS m$i")
          .mkString(", ")
        def bandSelects(bands: Int, rows: Int) = (0 until bands).map { b =>
          val ks = (0 until rows).map(r => s"m${b * rows + r}")
            .mkString(", ")
          s"SELECT doc_id, $b AS band_idx, concat_ws(':', $ks) " +
            s"AS band_key FROM sig"
        }.mkString("\n  UNION ALL ")
        def geo(tag: Int, bands: Int, rows: Int) =
          s"""g$tag AS (SELECT DISTINCT $bands AS bands, $rows AS rows_,
             |    a.doc_id AS da, b.doc_id AS db
             |  FROM (${bandSelects(bands, rows)}) a
             |  JOIN (${bandSelects(bands, rows)}) b
             |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             |    AND a.doc_id < b.doc_id)""".stripMargin
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id)
           |    AS n, h FROM shc),
           |truthp AS (SELECT a.doc_id AS da, b.doc_id AS db,
           |    COUNT(*) AS shared, MAX(a.n) AS na, MAX(b.n) AS nb
           |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |truth AS (SELECT da, db FROM truthp
           |  WHERE CAST(shared AS DOUBLE)/(na + nb - shared) >= 0.5e0),
           |sig AS (SELECT doc_id, $minCols FROM shc GROUP BY doc_id),
           |${geo(1, 8, 2)},
           |${geo(2, 4, 4)},
           |${geo(3, 2, 8)},
           |cand AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
           |         UNION ALL SELECT * FROM g3),
           |m AS (SELECT c.bands, c.rows_, COUNT(*) AS nc,
           |    SUM(CASE WHEN t.da IS NOT NULL THEN 1 ELSE 0 END) AS tp
           |  FROM cand c LEFT JOIN truth t
           |    ON t.da = c.da AND t.db = c.db
           |  GROUP BY 1, 2),
           |nt AS (SELECT COUNT(*) AS nt FROM truth)
           |SELECT m.bands, m.rows_, CAST(nt.nt AS BIGINT) AS n_truth,
           |  CAST(m.nc AS BIGINT) AS n_cand, CAST(m.tp AS BIGINT) AS tp,
           |  CAST(m.nc - m.tp AS BIGINT) AS fp,
           |  CAST(nt.nt - m.tp AS BIGINT) AS fn,
           |  CAST(CASE WHEN m.nc > 0
           |    THEN (1000000 * m.tp) // m.nc END AS BIGINT)
           |    AS precision_ppm,
           |  CAST(CASE WHEN nt.nt > 0
           |    THEN (1000000 * m.tp) // nt.nt END AS BIGINT)
           |    AS recall_ppm
           |FROM m CROSS JOIN nt""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val d = Tables(spark, dir).documents
      val shc = Dedup.dfCapped(
        Dedup.shingleHashes(d, "doc_id", "text"), Dedup.DefaultDfCap)
      val truth = Dedup.jaccardPairs(shc, "doc_id", dfCap = 0)
        .filter($"jaccard" >= 0.5)
        .select($"id_a".as("ta"), $"id_b".as("tb"))
      val sig = Dedup.minhashSignatures(shc, "doc_id", "h", K)
      def candidates(bands: Int, rows: Int) = {
        val banded = Dedup.lshBands(sig, "doc_id", bands, rows)
        banded
          .join(banded.select($"doc_id".as("db0"),
              $"band_idx".as("bi"), $"band_key".as("bk")),
            $"band_idx" === $"bi" && $"band_key" === $"bk" &&
              $"doc_id" < $"db0")
          .select(lit(bands).as("bands"), lit(rows).as("rows_"),
            $"doc_id".as("da"), $"db0".as("db")).distinct()
      }
      val cand = candidates(8, 2)
        .unionByName(candidates(4, 4)).unionByName(candidates(2, 8))
      val m = cand.join(truth,
          $"da" === $"ta" && $"db" === $"tb", "left_outer")
        .groupBy($"bands", $"rows_")
        .agg(count(lit(1)).as("nc"),
          sum(when($"ta".isNotNull, 1).otherwise(0)).as("tp"))
      val nt = truth.agg(count(lit(1)).as("nt"))
      m.crossJoin(broadcast(nt))
        .select($"bands", $"rows_",
          $"nt".cast(LongType).as("n_truth"),
          $"nc".cast(LongType).as("n_cand"),
          $"tp".cast(LongType).as("tp"),
          ($"nc" - $"tp").cast(LongType).as("fp"),
          ($"nt" - $"tp").cast(LongType).as("fn"),
          expr("CAST(CASE WHEN nc > 0 THEN (1000000 * tp) DIV nc END " +
            "AS BIGINT)").as("precision_ppm"),
          expr("CAST(CASE WHEN nt > 0 THEN (1000000 * tp) DIV nt END " +
            "AS BIGINT)").as("recall_ppm"))
    }
  )
}
