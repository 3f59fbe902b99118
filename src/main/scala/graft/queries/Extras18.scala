package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Exact._
import graft.operators.{ConnectedComponents, Dedup, TextOps}
import graft.sources.Tables

/** Eighteenth coverage wave: canonical-document selection over dup
  * clusters, ORC format round-trip, partition-pruned reads, and a
  * count-min sketch with exact cross-engine parity. */
object Extras18 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)


  val all: Seq[Qry] = Seq(

    // ---- canonical-document selection per duplicate cluster ------------
    // The step a dedup pipeline actually ships: collapse each near-dup
    // cluster (q74's components) to its best member — longest text,
    // doc_id as the tiebreak. The comparand is an exact BIGINT
    // (n_chars·1e7 − doc_id: doc_id < 1e7 at every SF, so length strictly
    // dominates and the tiebreak is collision-free), making the winner
    // engine-independent. One extra equi-join + hash agg over q74's
    // cluster output.
    Qry(
      "q122_keep_best",
      s"""WITH RECURSIVE ${TextOps.oracleToksCte},
         |${TextOps.oracleSh3Cte},
         |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
         |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id) AS n, h
         |        FROM shc),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared,
         |    MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |edges0 AS (SELECT da, db FROM pairs
         |           WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5e0),
         |edges AS (SELECT da AS a, db AS b FROM edges0
         |          UNION SELECT db, da FROM edges0),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |cc AS (SELECT src AS member, MIN(dst) AS component
         |  FROM reach GROUP BY 1)
         |SELECT component,
         |  arg_max(member, n_chars * 10000000 - member) AS kept_doc,
         |  COUNT(*) AS n_members, COUNT(*) - 1 AS n_dropped,
         |  CAST(MAX(n_chars) AS BIGINT) AS kept_chars
         |FROM cc JOIN documents ON member = doc_id
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir).documents
      val pairs = Dedup.jaccardPairs(
          Dedup.shingleHashes(docs, "doc_id", "text"), "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b")
      ConnectedComponents.minLabel(pairs, "id_a", "id_b")
        .select($"id".as("member"), $"component")
        .join(docs.select($"doc_id", $"n_chars"),
          $"member" === $"doc_id")
        .groupBy($"component")
        .agg(max_by($"member", $"n_chars" * 10000000L - $"member")
          .as("kept_doc"),
          count(one).as("n_members"),
          (count(one) - 1).as("n_dropped"),
          max($"n_chars").as("kept_chars"))
    },

    // ---- ORC round-trip (second columnar format) -----------------------
    // lineitem slice → ORC files → read back → aggregate. The oracle
    // states the same aggregate over the original parquet: format
    // round-trip fidelity IS the assertion. ORC gets the same pushdown/
    // pruning treatment as parquet from the datasource V2 scan.
    Qry(
      "q123_orc_roundtrip",
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${dsumSql("l_quantity")} AS qty_sum,
         |  ${dsumSql("l_extendedprice")} AS price_sum
         |FROM lineitem WHERE l_suppkey % 10 = 0
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = RoundTrip.dir(s"$dir#orc")
      val src = t(spark, dir).lineitem
        .filter($"l_suppkey" % 10 === 0)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      src.write.mode("overwrite").orc(out)
      spark.read.orc(out)
        .groupBy($"l_returnflag")
        .agg(count(one).as("n"), dsum($"l_quantity").as("qty_sum"),
          dsum($"l_extendedprice").as("price_sum"))
    },

    // ---- partitioned write + partition-pruned read ---------------------
    // events partitioned by event_type on disk, then a single-partition
    // read: the scan touches ONE directory (PartitionFilters in the
    // plan, verified in PLANS.md) — the layout that makes per-category
    // queries O(category) instead of O(corpus) at 100 TB.
    Qry(
      "q124_partition_pruning",
      s"""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
         |    AS day,
         |  COUNT(*) AS n, ${dsumSql("value")} AS val_sum
         |FROM events WHERE event_type = 'click'
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = RoundTrip.dir(s"$dir#evpart")
      val src = t(spark, dir).events
        .select($"event_type", $"ts", $"value")
      src.write.mode("overwrite").partitionBy("event_type").parquet(out)
      spark.read.parquet(out)
        .filter($"event_type" === "click")
        .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
        .agg(count(one).as("n"), dsum($"value").as("val_sum"))
    },

    // ---- count-min sketch with exact parity ----------------------------
    // CMS(d=4, w=1024) over the token stream: per-row hashing into d
    // counter rows (one hash aggregate — the mergeable 100-TB shape),
    // then est(tok) = min over rows of its counter. Everything is
    // integer arithmetic on the shared md5 hash, so the ORACLE REBUILDS
    // THE SAME SKETCH bit-for-bit and the estimate itself is gate-checked
    // (not just an error bound) for the top-10 exact tokens.
    // est >= exact always (counters only over-count).
    Qry(
      "q125_cms_topk", {
        val hashFor = (i: Int) =>
          s"${TextOps.oracleHashSql(s"'cms$i:' || tok")} % 1024"
        val rowSelects = (0 until 4).map(i =>
          s"SELECT $i AS r, ${hashFor(i)} AS bkt, c FROM cnt")
          .mkString("\nUNION ALL ")
        val estSelects = (0 until 4).map(i =>
          s"SELECT tok, c, rn, $i AS r, ${hashFor(i)} AS bkt FROM top")
          .mkString("\nUNION ALL ")
        s"""WITH ${TextOps.oracleToksCte},
           |cnt AS (SELECT tok, COUNT(*) AS c
           |  FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
           |rows0 AS ($rowSelects),
           |cms AS (SELECT r, bkt, CAST(SUM(c) AS BIGINT) AS total
           |  FROM rows0 GROUP BY 1, 2),
           |top AS (SELECT tok, c, row_number()
           |    OVER (ORDER BY c DESC, tok) AS rn
           |  FROM cnt QUALIFY rn <= 10),
           |looks AS ($estSelects)
           |SELECT l.tok, l.c AS exact_count, l.rn AS rank,
           |  MIN(cms.total) AS cms_estimate,
           |  CAST(MIN(cms.total) >= l.c AS BOOLEAN) AS never_undercounts
           |FROM looks l JOIN cms ON l.r = cms.r AND l.bkt = cms.bkt
           |GROUP BY 1, 2, 3""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      def bucket(i: Int, tok: org.apache.spark.sql.Column) =
        TextOps.hashMod(concat(lit(s"cms$i:"), tok)) % 1024
      // staged: the exact count table feeds the sketch rows, the top-10
      // pick, AND the estimate lookups (Staging.stage, not persist — see
      // Dedup.jaccardPairs)
      val cnt = graft.operators.Staging.stage(
        t(spark, dir).documents
          .select(explode(TextOps.tokens($"text")).as("tok"))
          .groupBy($"tok").agg(count(one).as("c")),
        eager = false)
      val rows0 = (0 until 4).map(i =>
        cnt.select(lit(i).as("r"), bucket(i, $"tok").as("bkt"), $"c"))
        .reduce(_ unionByName _)
      val cms = rows0.groupBy($"r", $"bkt").agg(sum($"c").as("total"))
      val top = cnt.orderBy($"c".desc, $"tok").limit(10)
        .withColumn("rn", row_number().over(
          Window.orderBy($"c".desc, $"tok")))
      val looks = (0 until 4).map(i =>
        top.select($"tok", $"c", $"rn", lit(i).as("r"),
          bucket(i, $"tok").as("bkt")))
        .reduce(_ unionByName _)
      looks.join(cms, Seq("r", "bkt"))
        .groupBy($"tok", $"c".as("exact_count"), $"rn".as("rank"))
        .agg(min($"total").as("cms_estimate"))
        .select($"tok", $"exact_count", $"rank", $"cms_estimate",
          ($"cms_estimate" >= $"exact_count").as("never_undercounts"))
    }
  )
}
