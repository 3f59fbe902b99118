package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.{ArrowIpc, Tables}

/** Hundred-sixth coverage wave: sharded top-k heavy hitters with
  * deterministic error bounds, and the Arrow file-format round-trip.
  *
  *  - q299: merged shard-summary heavy hitters — the bounded-shuffle
  *    path for vocabulary-scale counts. Each of S=8 data shards
  *    (hash(doc_id), NOT keyed by word — keyed sharding would be
  *    exact and is the expensive full shuffle this replaces) keeps
  *    only its local top-K=20 words plus its cutoff (the K-th count —
  *    the most a DROPPED word can hold there, since ties break by
  *    word and a dropped tie equals the cutoff). The merge sums
  *    per-word counts where present (the lower bound) and adds absent
  *    shards' cutoffs (the upper bound): S×K rows move instead of
  *    |vocabulary|. The exact corpus count and true rank ride as the
  *    AUDIT columns, and `contained` pins lb <= exact <= ub row by
  *    row — the deterministic analog of SpaceSaving/Misra-Gries
  *    guarantees (those sketches are insert-order-dependent and could
  *    never hash-gate; per-shard exact top-K + cutoff is
  *    order-independent, so the oracle rebuilds it bit for bit).
  *    Scale shape: one corpus-sized (shard, word) partial-aggregated
  *    count; everything after is S×K-bounded except the audit's
  *    vocabulary-sized exact-count table, which the TopN rank probes
  *    via a bounded broadcast join (never an unpartitioned sort).
  *  - q300: q291's interchange proof for Arrow *file format* — the
  *    random-access variant with the footer (what memory-mapped
  *    readers and Feather v2 consumers open; stream format cannot
  *    seek). A typed orders projection writes as `.arrow` files
  *    task-side, reads back through the same `graft-arrow` DSv2
  *    source (per-file decoder picked by extension), and the
  *    aggregate hash-matches an oracle computed from the original
  *    parquet — any bit lost in either direction fails the gate.
  */
object Extras106 {

  private val one = lit(1)

  /** q299 geometry. */
  private val S = 8
  private val K = 20
  private val TopN = 10

  val all: Seq[Qry] = Seq(

    // ---- sharded top-k with error bounds ------------------------------------
    Qry(
      "q299_sharded_topk", {
        val shard = TextOps.oracleHashSql(
          "'shard:' || CAST(doc_id AS VARCHAR)")
        s"""WITH ${TextOps.oracleToksCte},
           |w AS (SELECT doc_id, unnest(tk) AS word FROM toks),
           |sh AS (SELECT ($shard) % $S AS s, word FROM w),
           |c AS (SELECT s, word, CAST(COUNT(*) AS BIGINT) AS cnt
           |      FROM sh GROUP BY 1, 2),
           |r AS (SELECT s, word, cnt,
           |    row_number() OVER (PARTITION BY s
           |      ORDER BY cnt DESC, word) AS rn,
           |    COUNT(*) OVER (PARTITION BY s) AS nw FROM c),
           |summ AS (SELECT s, word, cnt FROM r WHERE rn <= $K),
           |cut AS (SELECT s, MAX(CASE WHEN rn = $K AND nw > $K
           |      THEN cnt ELSE 0 END) AS bnd
           |  FROM r GROUP BY 1),
           |tot AS (SELECT SUM(bnd) AS total_bnd FROM cut),
           |cand AS (SELECT word, SUM(cnt) AS lb, SUM(c2.bnd) AS covered
           |  FROM summ JOIN cut c2 USING (s) GROUP BY 1),
           |est AS (SELECT word, lb,
           |    lb + (tot.total_bnd - covered) AS ub
           |  FROM cand, tot),
           |top AS (SELECT word, lb, ub FROM (
           |    SELECT *, row_number() OVER (ORDER BY lb DESC, word)
           |      AS brank FROM est) WHERE brank <= $TopN),
           |ex AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact
           |       FROM w GROUP BY 1),
           |xr AS (SELECT word, exact, CAST(row_number() OVER (
           |    ORDER BY exact DESC, word) AS BIGINT) AS true_rank
           |  FROM ex)
           |SELECT t.word, CAST(t.lb AS BIGINT) AS lb,
           |  CAST(t.ub AS BIGINT) AS ub, x.exact, x.true_rank,
           |  (t.lb <= x.exact AND x.exact <= t.ub) AS contained
           |FROM top t JOIN xr x USING (word)""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val w = Tables(spark, dir).documents
        .select($"doc_id", explode(TextOps.tokens($"text")).as("word"))
      val sh = w.select((TextOps.hashMod(concat(lit("shard:"),
        $"doc_id".cast("string"))) % S).as("s"), $"word")
      val c = sh.groupBy($"s", $"word").agg(count(one).as("cnt"))
      val wRank = Window.partitionBy($"s").orderBy($"cnt".desc, $"word")
      val r = c.withColumn("rn", row_number().over(wRank))
        .withColumn("nw", count(one).over(Window.partitionBy($"s")))
      val summ = r.filter($"rn" <= K).select($"s", $"word", $"cnt")
      val cut = r.groupBy($"s")
        .agg(max(when($"rn" === K && $"nw" > K, $"cnt").otherwise(0L))
          .as("bnd"))
      val tot = cut.agg(sum($"bnd").as("total_bnd"))
      val cand = summ.join(cut, "s")
        .groupBy($"word")
        .agg(sum($"cnt").as("lb"), sum($"bnd").as("covered"))
      val est = cand.crossJoin(broadcast(tot))
        .select($"word", $"lb",
          ($"lb" + ($"total_bnd" - $"covered")).as("ub"))
      val top = est.withColumn("brank",
          row_number().over(Window.orderBy($"lb".desc, $"word")))
        .filter($"brank" <= TopN).select($"word", $"lb", $"ub")
      // audit side: true_rank for the TopN words only — 1 + the number
      // of vocabulary entries sorting strictly before (exact DESC, word
      // ASC). A bounded broadcast-NLJ count over the vocab table
      // replaces the r11 unpartitioned Window.orderBy over every
      // distinct word (one task pulling the whole vocabulary — the
      // full-shuffle shape this query exists to avoid)
      val ex = w.groupBy($"word").agg(count(one).as("exact"))
      val topEx = ex.join(broadcast(top), "word")
        .select($"word", $"lb", $"ub", $"exact")
      val pred = ex.select($"word".as("w2"), $"exact".as("x2"))
        .join(broadcast(topEx.select($"word".as("tw"), $"exact".as("tx"))),
          $"x2" > $"tx" || ($"x2" === $"tx" && $"w2" < $"tw"))
        .groupBy($"tw").agg(count(one).as("npred"))
      topEx.join(broadcast(pred), $"word" === $"tw", "left_outer")
        .select($"word", $"lb", $"ub", $"exact",
          (coalesce($"npred", lit(0L)) + 1L).as("true_rank"),
          ($"lb" <= $"exact" && $"exact" <= $"ub").as("contained"))
    },

    // ---- Arrow FILE-format round-trip ---------------------------------------
    Qry(
      "q300_arrow_file_roundtrip",
      """SELECT o_orderstatus AS status,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val out = ArrowIpc.writeCached(s"$dir#q300",
        Tables(spark, dir).orders.select(
          $"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice"),
        fileFormat = true)
      spark.read.format("graft-arrow").load(out)
        .groupBy($"o_orderstatus".as("status"))
        .agg(count(one).as("n"),
          sum($"o_orderkey").as("sum_key"),
          sum($"o_custkey").as("sum_cust"),
          sum(round($"o_totalprice" * 100).cast("long")).as("sum_cents"))
    }
  )
}
