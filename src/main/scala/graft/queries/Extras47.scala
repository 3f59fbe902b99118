package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextOps}
import graft.sources.Tables

/** Forty-seventh coverage wave: the tokenizer ENCODE step, completing
  * the tokenizer lifecycle q78 (BPE-ish token counting) → q162/`Bpe`
  * (merge training) → q176 (vocabulary capacity planning) → **q182
  * (apply the trained artifact to the corpus)**.
  *
  * q182 applies a fixed 8-merge artifact in training-rank order (the
  * HuggingFace-BPE application shape: each merge fires once, greedily,
  * left-to-right over every non-overlapping occurrence) and reports
  * per-document token counts before/after plus chars-per-token
  * compression — the number that prices a corpus in tokens before a
  * training run. Both engines derive the merge patterns from the SAME
  * Scala constant, so they cannot drift:
  *
  *   - Spark collapses the corpus to its VOCABULARY first (the q162
  *     discipline), encodes each distinct word once via
  *     `Bpe.encodeWord` (exact greedy fold), broadcasts the
  *     vocab→encoded-length table back, and aggregates per document —
  *     the expensive per-word fold runs |vocabulary| times, never
  *     |corpus| times.
  *   - DuckDB encodes each document's pipe-delimited symbol string by
  *     running each merge's `replace` to a FIXPOINT inside a recursive
  *     CTE (q117's recursion precedent). Fixpoint leftmost-nonoverlap
  *     replacement equals the greedy fold: a replacement can never
  *     create a new occurrence of its own pattern (the merged symbol
  *     `ab` differs from both `a` and `b`), it can only defer a
  *     boundary-sharing neighbour to the next pass — and word
  *     boundaries ("||" between words) can never match an "|a|b|"
  *     pattern, so per-word and whole-document application agree.
  */
object Extras47 {

  /** The fixed merge artifact, rank-ordered — the single source for the
    * Spark fold AND the generated oracle patterns. PRECONDITION (the
    * require below enforces it at catalog build): no self-pair merge
    * (left == right). `Bpe.encodeWord` itself is exact for self-pairs,
    * but the ORACLE's fixpoint-replace formulation is not — on a run of
    * ≥ 4 identical symbols leftmost non-overlapping `replace` pairs
    * (1,2)(4,5)… while greedy pairs (1,2)(3,4)…, and a later merge can
    * turn that segmentation difference into a count difference. A
    * trained artifact (`Bpe.trainMerges`) CAN legitimately contain
    * self-pairs on repetitive corpora — such an artifact needs the
    * Spark path only, not this oracle formulation. */
  private val EncMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")
  require(EncMerges.forall { case (a, b) => a != b },
    "q182 oracle equivalence requires no self-pair merges")

  val all: Seq[Qry] = Seq(

    Qry(
      "q182_bpe_encode", {
        val pats = EncMerges.zipWithIndex.map { case ((a, b), i) =>
          s"(${i + 1}, '|$a|$b|', '|$a$b|')"
        }.mkString(", ")
        val n = EncMerges.size
        s"""WITH RECURSIVE ${TextOps.oracleToksCte},
           |base AS (SELECT doc_id,
           |    CAST(len(tk) AS BIGINT) AS n_words,
           |    CAST(length(array_to_string(tk, '')) AS BIGINT) AS n_chars,
           |    COALESCE(list_aggregate(list_transform(tk,
           |      w -> '|' || regexp_replace(w, '(.)', '\\1|', 'g')),
           |      'string_agg', ''), '') AS s
           |  FROM toks WHERE len(tk) > 0),
           |pats(i, pat, rep) AS (VALUES $pats),
           |enc AS (
           |  SELECT doc_id, s, 1 AS i FROM base
           |  UNION ALL
           |  SELECT e.doc_id, replace(e.s, p.pat, p.rep) AS s,
           |    CASE WHEN replace(e.s, p.pat, p.rep) = e.s
           |      THEN e.i + 1 ELSE e.i END AS i
           |  FROM enc e JOIN pats p ON p.i = e.i
           |  WHERE e.i <= $n),
           |fin AS (SELECT doc_id,
           |    CAST(length(s) - length(replace(s, '|', '')) AS BIGINT)
           |      AS pipes
           |  FROM enc WHERE i = ${n + 1})
           |SELECT b.doc_id, b.n_words, b.n_chars,
           |  fin.pipes - b.n_words AS n_bpe,
           |  CASE WHEN fin.pipes - b.n_words > 0
           |    THEN round(CAST(b.n_chars AS DOUBLE)
           |      / (fin.pipes - b.n_words), 6) END AS compression
           |FROM base b JOIN fin USING (doc_id)""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // vocabulary-collapse shape + fold: operators.Bpe.encodedCounts
      // (single source with the facade); only the oracle rounding is
      // applied here
      Bpe.encodedCounts(Tables(spark, dir).documents,
          "doc_id", "text", EncMerges)
        .select($"doc_id", $"n_words", $"n_chars", $"n_bpe",
          round($"compression", 6).as("compression"))
    }
  )
}
