package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{ConnectedComponents, Dedup, Staging, TextOps}
import graft.sources.Tables

/** Hundred-thirty-third coverage wave: dedup-aware split leakage — the
  * train/test contamination audit that connects the dedup tier to the
  * eval tier.
  *
  *  - q345: a naive per-document hash split leaks: near-duplicate
  *    pairs straddle folds, so the test fold contains paraphrases of
  *    training documents and every metric inflates. The audit
  *    measures it exactly: ground-truth near-dup pairs (q74's exact
  *    Jaccard ≥ 0.5 on the df-capped shingle universe) are checked
  *    against (a) the naive 5-fold doc-hash split and (b) the
  *    DEDUP-AWARE split that assigns whole duplicate COMPONENTS
  *    (connected components over the pair graph — q74's machinery) to
  *    folds by component hash. One audit row: pair count, cross-fold
  *    leaks under each policy and leak ppm — with the component
  *    split's zero gated in-result (leaking there is structurally
  *    impossible: both endpoints inherit the component's fold). The
  *    q107/q153/q321 decontamination family measures PAST
  *    contamination; q345 PREVENTS it at split time.
  *
  * Scale shape: the pair pipeline is the df-capped staged-leaf dedup
  * join (no all-pairs); CC runs on the pair sliver; fold assignment
  * is per-row hash arithmetic; the audit joins are pair-sized.
  */
object Extras133 {

  private val Folds = 5

  val all: Seq[Qry] = Seq(

    Qry(
      "q345_split_leakage", {
        val foldOf = (e: String) =>
          s"${TextOps.oracleHashSql(s"CAST($e AS VARCHAR)")} % $Folds"
        s"""WITH RECURSIVE ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |${TextOps.oracleShCappedCte(Dedup.DefaultDfCap)},
           |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id)
           |    AS n, h FROM shc),
           |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
           |    COUNT(*) AS shared, MAX(a.n) AS na, MAX(b.n) AS nb
           |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |truth AS (SELECT da, db FROM pairs
           |  WHERE CAST(shared AS DOUBLE)/(na + nb - shared) >= 0.5e0),
           |edges AS (SELECT da AS a, db AS b FROM truth
           |          UNION SELECT db, da FROM truth),
           |nodes AS (SELECT DISTINCT a AS id FROM edges),
           |reach(src, dst) AS (SELECT id, id FROM nodes
           |  UNION SELECT r.src, e.b FROM reach r JOIN edges e
           |        ON r.dst = e.a),
           |comp AS (SELECT src AS id, MIN(dst) AS c FROM reach
           |         GROUP BY 1),
           |lk AS (SELECT t.da, t.db,
           |    CASE WHEN (${foldOf("t.da")}) <> (${foldOf("t.db")})
           |      THEN 1 ELSE 0 END AS naive_leak,
           |    CASE WHEN (${foldOf("ca.c")}) <> (${foldOf("cb.c")})
           |      THEN 1 ELSE 0 END AS comp_leak
           |  FROM truth t JOIN comp ca ON ca.id = t.da
           |  JOIN comp cb ON cb.id = t.db)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(naive_leak) AS BIGINT) AS naive_leaks,
           |  CAST((1000000 * SUM(naive_leak)) // COUNT(*) AS BIGINT)
           |    AS naive_leak_ppm,
           |  CAST(SUM(comp_leak) AS BIGINT) AS comp_leaks
           |FROM lk""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val d = Tables(spark, dir).documents
      val shc = Dedup.dfCapped(
        Dedup.shingleHashes(d, "doc_id", "text"), Dedup.DefaultDfCap)
      // staged ONCE: referenced both by the CC loop (which stages its
      // own symmetrized copy from it) and by the final leak join —
      // unstaged, the second reference re-ran the whole
      // tokenize→shingle→jaccard pipeline. Not released in-query (the
      // returned plan reads it lazily); the harness's per-query
      // Staging.sweep owns the release.
      val truth = Staging.stage(
        Dedup.jaccardPairs(shc, "doc_id", dfCap = 0)
          .filter($"jaccard" >= 0.5)
          .select($"id_a".as("da"), $"id_b".as("db")),
        eager = true)
      val comp = ConnectedComponents.minLabel(truth, "da", "db")
        .select($"id", $"component".as("c"))
      def foldOf(c: org.apache.spark.sql.Column) =
        TextOps.hashMod(c.cast("string")) % Folds
      val lk = truth
        .join(comp.select($"id".as("ia"), $"c".as("ca")), $"da" === $"ia")
        .join(comp.select($"id".as("ib"), $"c".as("cb")), $"db" === $"ib")
        .select(
          when(foldOf($"da") =!= foldOf($"db"), 1).otherwise(0)
            .as("naive_leak"),
          when(foldOf($"ca") =!= foldOf($"cb"), 1).otherwise(0)
            .as("comp_leak"))
      lk.agg(count(lit(1)).cast(LongType).as("n_pairs"),
        sum($"naive_leak").cast(LongType).as("naive_leaks"),
        expr("CAST((1000000 * SUM(naive_leak)) DIV COUNT(*) AS BIGINT)")
          .as("naive_leak_ppm"),
        sum($"comp_leak").cast(LongType).as("comp_leaks"))
    }
  )
}
