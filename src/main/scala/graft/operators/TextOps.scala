package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis / dedup primitives for the LLM-data-pipeline surface
  * (BASELINE.json north star; entirely absent from the reference, whose
  * only "string" handling is raw little-endian byte blobs —
  * `/root/reference/src/storage/table.rs:27`).
  *
  * Cross-engine determinism contract: every primitive here has an exact
  * DuckDB-SQL equivalent (verified bit-for-bit by tools/probe_parity.py +
  * ProbeParity.scala) so dedup/similarity queries can be oracle-checked:
  *   - tokens: lowercase, split on non-[a-z0-9 CJK] (Java regex here,
  *     RE2 `[^a-z0-9\x{4e00}-\x{9fff}]+` in DuckDB), drop empties.
  *   - md5Long: first 15 hex digits of md5 → 60-bit non-negative BIGINT
  *     (DuckDB: `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`).
  *   - hashMod: md5Long mod P (P = 2^31-1) — the base hash for the
  *     MinHash affine family h_i(x) = (a_i·x + b_i) mod P, whose products
  *     stay < 2^62 (no BIGINT overflow under ANSI mode, either engine).
  *
  * Scale notes (100 TB): everything is per-row/codegen-friendly column
  * expressions — no UDFs, no driver state. MinHash signatures are K agg
  * columns in ONE hash aggregate (no K-fold row explosion); shingle
  * explosion is bounded by document length. At production scale the
  * md5-based hash would swap for xxhash64 (builtin, faster); md5 is used
  * because both engines implement it identically for oracle checking.
  */
object TextOps {
  /** Modulus for all token/shingle hashes: the Mersenne prime 2^31-1. */
  val P: Long = 2147483647L

  /** Java-regex token delimiter (keep in sync with TokenReDuck). */
  val TokenRe = "[^a-z0-9一-鿿]+"
  /** RE2 spelling of TokenRe for DuckDB oracle SQL. */
  val TokenReDuck = "[^a-z0-9\\x{4e00}-\\x{9fff}]+"

  /** Lowercased word tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenRe), t => length(t) > 0)

  /** BPE-style pre-tokenizer regex (the GPT-2 family: contractions,
    * space-prefixed letter/digit/symbol runs, whitespace runs) minus the
    * trailing lookahead RE2 cannot express. Whitespace is an EXPLICIT
    * class — Java's \s includes \x0B, RE2's does not. One constant feeds
    * both engines; quote-double it for SQL (`BpeTokSql`). */
  val BpeTok: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+|[ \t\n\r\f]+"""
  /** BpeTok escaped for embedding in a single-quoted SQL literal. */
  val BpeTokSql: String = BpeTok.replace("'", "''")

  /** Count of BPE-style pre-tokens in `text` (LongType). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTok), lit(0))).cast(LongType)

  /** 60-bit hash from the md5 hex prefix (identical in DuckDB). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** md5Long reduced mod P — base hash for MinHash/SimHash families. */
  def hashMod(c: Column): Column = md5Long(c) % P

  /** Word n-gram shingles (space-joined), empty array when < n tokens.
    * DuckDB twin:
    * `list_transform(range(len(tk)-n+1), i -> array_to_string(tk[i+1:i+n],' '))`
    *
    * Built as a zip_with fold (gram_k = gram_{k-1} ⊗ tk shifted by k-1)
    * so `tk` appears only in ARGUMENT position of the higher-order
    * functions, never inside a lambda body: after projection collapse an
    * outer expression captured in a lambda is re-evaluated PER ELEMENT —
    * the inlined tokenizer ran once per shingle position, measured 40×
    * slower on the documents fixture (24 s → 0.6 s at sf0.1).
    * zip_with pads the shorter (shifted) side with null and concat_ws
    * skips nulls, so tail positions hold partial grams — the final slice
    * drops those n-1 tails. */
  def shingles(tk: Column, n: Int): Column = {
    val grown = (2 to n).foldLeft(tk) { (acc, k) =>
      zip_with(acc, slice(tk, lit(k), greatest(size(tk) - (k - 1), lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    when(size(tk) >= n, slice(grown, lit(1), size(tk) - (n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Non-overlapping n-token chunks (space-joined), leftover tail < n
    * dropped; empty array when < n tokens. The C4-style chunking shape:
    * materializes exactly ⌊L/n⌋ chunks, not the L−n+1 overlapping
    * shingles. DuckDB twin:
    * `list_transform(range(0, len(tk)-n+1, n),
    *   i -> array_to_string(tk[i+1:i+n], ' '))`.
    *
    * Built as an `aggregate` fold so `tk` sits in ARGUMENT position (one
    * evaluation per row even after projection collapse inlines the
    * tokenizer — cf. the lambda-capture note on `shingles`): the
    * accumulator carries (finished chunks, current partial window) and
    * flushes the window every n tokens. */
  def strideChunks(tk: Column, n: Int): Column = {
    val emptyArr = array().cast("array<string>")
    aggregate(
      tk,
      struct(emptyArr.as("chunks"), emptyArr.as("cur")),
      (acc, t) => {
        val cur2 = concat(acc.getField("cur"), array(t))
        when(size(cur2) === n,
          struct(concat(acc.getField("chunks"),
            array(array_join(cur2, " "))).as("chunks"),
            emptyArr.as("cur")))
          .otherwise(struct(acc.getField("chunks").as("chunks"),
            cur2.as("cur")))
      },
      acc => acc.getField("chunks"))
  }

  /** Order-dependent polynomial fold of the token-hash sequence mod P —
    * a whole-document fingerprint (content + order sensitive).
    * DuckDB twin: `list_reduce(list_prepend(0::BIGINT, hashes),
    * (acc,h) -> (acc*31 + h) % P)`. */
  def docFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, tok) => (acc * 31 + hashMod(tok)) % P)

  /** MinHash affine-family parameters — plain literals so the generated
    * oracle SQL can embed the same constants.
    *
    * Modular POWERS (g^(i+2) mod P), not small multiples: with
    * a_i = c·(i+1) (c ≈ 1e6), every shingle whose base hash falls below
    * ~P/max(a_i) ≈ 130 maps to a small image under ALL K functions at
    * once — no wrap-around, order preserved — so one rare tiny-hash
    * shingle becomes every function's minimum and poisons the entire
    * signature of every document containing it (observed at sf0.1: a
    * J = 0.976 near-dup pair with 0/16 signature agreement; at corpus
    * scale thousands of such shingles exist). Powers of the same
    * generators give effectively uniform 31-bit coefficients (probe:
    * max |estimate − exact| over J ≥ 0.4 pairs drops 0.98 → 0.16,
    * binomial-noise territory for K = 16); products stay < 2^62, no
    * BIGINT overflow in either engine. */
  def aParam(i: Int): Long = BigInt(999983L).modPow(
    BigInt(i + 2), BigInt(P)).toLong
  def bParam(i: Int): Long = BigInt(1000003L).modPow(
    BigInt(i + 2), BigInt(P)).toLong

  // ---- canonical DuckDB oracle fragments ------------------------------
  // Single source for every query whose oracle needs the tokenizer /
  // shingle-hash pipeline — hand-copied variants drift (a tokenizer or
  // hash change that misses one copy silently breaks that oracle).

  /** DuckDB twin of hashMod. */
  def oracleHashSql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT) % $P"

  /** DuckDB twin of `tokens` as a CTE over `documents` (extra columns
    * lang/text are carried for the queries that need them). */
  val oracleToksCte: String =
    s"""toks AS (SELECT doc_id, lang, text,
       |  list_filter(string_split_regex(lower(text), '$TokenReDuck'),
       |              t -> len(t) > 0) AS tk
       |  FROM documents)""".stripMargin

  /** DuckDB twin of `Dedup.shingleHashes(_, "doc_id", "text", 3)`. */
  // no outer DISTINCT — mirrors Dedup.shingleHashes: dedup is per-doc at
  // string level (list_distinct); a residual hash collision would appear
  // identically in both engines (same md5, same mod)
  val oracleSh3Cte: String =
    s"""sh AS (SELECT doc_id, ${oracleHashSql("sh")} AS h
       |  FROM (SELECT doc_id,
       |          unnest(list_distinct(list_transform(range(len(tk) - 2),
       |            i -> array_to_string(tk[i+1:i+3], ' ')))) AS sh
       |        FROM toks WHERE len(tk) >= 3))""".stripMargin

  /** DuckDB twin of the df-cap inside `Dedup.jaccardPairs`: `shc` is
    * `sh` minus shingles whose document frequency exceeds `cap`. */
  def oracleShCappedCte(cap: Int): String =
    s"""shc AS (SELECT doc_id, h FROM (
       |  SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM sh)
       |  WHERE df <= $cap)""".stripMargin
}
