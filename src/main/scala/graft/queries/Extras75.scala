package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Seventy-fifth coverage wave: the SECOND tokenizer family. The BPE
  * lifecycle (q78/q162/q182/q187) is merge-driven; real pipelines also
  * train unigram-LM (SentencePiece-style) vocabularies, whose training
  * loop is EM over segmentations. q239 runs one full hard-EM step under
  * the q120/q162 fixed-point-step discipline, cross-engine exact.
  *
  *  - q239: unigram-LM EM step. Model: piece inventory = every corpus
  *    character + the top-16 character bigrams (by frequency, ties
  *    lexicographic); piece weights = floor(1e6·ln(count/total)) —
  *    BIGINT log-probs, so every DOWNSTREAM comparison is exact integer
  *    arithmetic (the only float op is the row-local ln, IEEE-identical
  *    across engines — the q158 discipline). E-step: per DISTINCT word
  *    (vocabulary collapse — the corpus is never re-segmented per
  *    occurrence), Viterbi segmentation via an integer DP fold over the
  *    word's positions, bigram-preferred deterministic tie-break, then
  *    a backward fold reconstructs the argmax segmentation. Hard-EM
  *    (Viterbi counts, not forward-backward expectations) is chosen
  *    exactly because its M-step counts are integers: the oracle
  *    re-derives the identical step, and one diverging segmentation
  *    anywhere in the vocabulary reshapes the piece counts corpus-wide.
  *    M-step: piece counts weighted by word frequency, renormalized to
  *    ppm. Scale shape: one corpus-sized tokenize+count pass collapses
  *    to the word vocabulary (staged leaf); everything after —
  *    inventory, weights, DP, backward, counts — is vocabulary-bounded,
  *    and the weight table rides as ONE broadcast map row.
  *
  * The model (oracle CTE stack + Spark pipeline) is shared with q241's
  * vocabulary-prune step (Extras76) via [[EmOraclePrefix]]/[[emModel]].
  */
object Extras75 {

  // model constants live with the operator (graft.operators.Unigram) so
  // the oracle text below and the engine can never drift apart
  private val TopBigrams = graft.operators.Unigram.TopBigrams
  private val Missing = graft.operators.Unigram.Missing
  private val NoCand = graft.operators.Unigram.NoCand

  /** dp/walk/seg/mstep CTE block for ONE hard-EM round, parameterized
    * by a name suffix and the weight-map CTE it segments under — so the
    * trainer oracle (Extras83) can unroll round 2 over `wm1` with the
    * IDENTICAL machinery text. The backward walk is a RECURSIVE CTE,
    * not a list_reduce with a struct accumulator: DuckDB 1.0's
    * list_reduce evaluates struct-typed accumulator fields
    * inconsistently inside the lambda (measured: the same st.j reads
    * two different values in one application; list accumulators are
    * fine — the dp fold uses one). q187's recursive-walk pattern is the
    * engine-supported shape. */
  private[queries] def emRoundCtes(sfx: String, wm: String): String =
    s"""dp$sfx AS (SELECT w, f, m,
       |    list_reduce(
       |      list_prepend(CAST([0] AS BIGINT[]),
       |        list_transform(range(length(w)),
       |          i -> [CAST(i + 1 AS BIGINT)])),
       |      (acc, x) -> list_append(acc, greatest(
       |        acc[CAST(x[1] AS INT)]
       |          + map_extract(m, substring(w, CAST(x[1] AS INT), 1))[1],
       |        CASE WHEN x[1] >= 2 THEN acc[CAST(x[1] AS INT) - 1]
       |          + COALESCE(map_extract(m,
       |              substring(w, CAST(x[1] AS INT) - 1, 2))[1],
       |            $Missing)
       |        ELSE $NoCand END))) AS dpl
       |  FROM words, $wm),
       |walk$sfx AS (
       |  SELECT w, f, m, dpl, length(w) AS j, CAST(NULL AS VARCHAR) AS p
       |  FROM dp$sfx
       |  UNION ALL
       |  SELECT w, f, m, dpl,
       |    CASE WHEN take2 THEN j - 2 ELSE j - 1 END,
       |    CASE WHEN take2 THEN substring(w, CAST(j AS INT) - 1, 2)
       |         ELSE substring(w, CAST(j AS INT), 1) END
       |  FROM (
       |    SELECT w, f, m, dpl, j,
       |      (j >= 2 AND dpl[CAST(j AS INT) + 1] =
       |        dpl[CAST(j AS INT) - 1] + COALESCE(map_extract(m,
       |          substring(w, CAST(j AS INT) - 1, 2))[1],
       |          $Missing)) AS take2
       |    FROM walk$sfx WHERE j > 0)),
       |seg$sfx AS (SELECT f, p FROM walk$sfx WHERE p IS NOT NULL),
       |mstep$sfx AS (SELECT p, CAST(SUM(f) AS BIGINT) AS cnt FROM seg$sfx
       |  GROUP BY 1)""".stripMargin

  /** DuckDB CTE stack through `wts` (p, wt — piece log-weights) and
    * `mstep` (p, cnt — Viterbi-segmentation piece counts): the word
    * vocabulary, the char+top-bigram inventory, round-0 weights, and
    * one [[emRoundCtes]] round under them. */
  private[queries] val EmOraclePrefix: String =
    s"""WITH RECURSIVE ${TextOps.oracleToksCte},
       |words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
       |chars AS (SELECT p, SUM(f) AS n FROM (
       |    SELECT f, unnest(list_transform(range(length(w)),
       |      i -> substring(w, CAST(i + 1 AS INT), 1))) AS p FROM words)
       |  GROUP BY 1),
       |bg AS (SELECT p, SUM(f) AS n FROM (
       |    SELECT f, unnest(list_transform(range(length(w) - 1),
       |      i -> substring(w, CAST(i + 1 AS INT), 2))) AS p
       |    FROM words WHERE length(w) >= 2)
       |  GROUP BY 1),
       |topbg AS (SELECT p, n FROM bg ORDER BY n DESC, p LIMIT $TopBigrams),
       |inv AS (SELECT p, n FROM chars UNION ALL SELECT p, n FROM topbg),
       |tot AS (SELECT SUM(n) AS t FROM inv),
       |wts AS (SELECT p,
       |    CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE) / t)) AS BIGINT)
       |      AS wt
       |  FROM inv, tot),
       |wm AS (SELECT map(list(p ORDER BY p), list(wt ORDER BY p)) AS m
       |  FROM wts),
       |${emRoundCtes("", "wm")}""".stripMargin

  /** Spark-side model shared by q239/q241: (wts (p, wt), mstep (p, cnt)).
    * Delegates to [[graft.operators.Unigram]] — one source of truth for
    * the inventory/weights/DP machinery, shared with the iterated
    * trainer (Extras83's training query). One corpus-sized
    * tokenize+count pass collapses to the staged word vocabulary;
    * everything downstream is vocabulary-bounded and the weight table
    * rides as one broadcast map row. */
  private[queries] def emModel(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val words = graft.operators.Unigram.wordTable(
      Tables(spark, dir).documents, "text")
    val wts = graft.operators.Unigram.weightsFromCounts(
      graft.operators.Unigram.inventory(words))
    (wts, graft.operators.Unigram.segmentCounts(words, wts))
  }

  val all: Seq[Qry] = Seq(

    Qry(
      "q239_unigram_em_step",
      s"""$EmOraclePrefix
         |SELECT p AS piece, CAST(length(p) AS INT) AS piece_len, cnt,
         |  CAST(1000000 * cnt // SUM(cnt) OVER () AS BIGINT) AS ppm
         |FROM mstep""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (_, mstep) = emModel(spark, dir)
      // M-step output: frequency-weighted piece counts in ppm
      mstep
        .withColumn("tot2", sum($"cnt").over(Window.partitionBy()))
        .select($"p".as("piece"), length($"p").as("piece_len"),
          $"cnt".cast(LongType).as("cnt"),
          expr("1000000 * cnt DIV tot2").as("ppm"))
    }
  )
}
