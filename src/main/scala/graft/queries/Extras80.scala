package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact._
import graft.operators.TextOps
import graft.sources.Tables

/** Eightieth coverage wave: the release artifacts a corpus ships with.
  *
  *  - q252: dataset card — the one-row summary a dataset release
  *    publishes: document/token/char volumes, language and source
  *    cardinalities, the dominant language and its corpus share,
  *    exact-duplicate rate, and the language-mix entropy (nats, x1e6).
  *    One corpus scan computes per-document facts; everything above is
  *    a handful of bounded aggregates cross-joined into one row. The
  *    entropy terms route through the DECIMAL(28,6) accumulator so
  *    language summation order cannot matter (ln itself is row-local —
  *    the q158 discipline).
  *  - q253: collocation mining — top-20 adjacent token pairs by exact
  *    integer LIFT (1e6·n_ab/n_a·N/n_b, floored in that declared
  *    order so no product overflows at corpus scale), the phrase table
  *    a tokenizer-seeding/phrase-mining pass ships. One corpus-sized
  *    bigram explode collapsing map-side; the lift join runs over the
  *    vocabulary-bounded count tables; top-20 rides rank-limit
  *    pushdown.
  */
object Extras80 {

  private val one = lit(1)
  private val MinPair = 25L
  private val TopK = 20

  // oracleToksCte does not carry `source` — inline a variant that
  // keeps every card dimension. (A STREAMING card twin is deliberately
  // absent: exact distinct counts are unsupported in streaming
  // aggregations, and per-doc-hash streaming state would be the wrong
  // design for a release-time summary anyway.)
  private val CardOracle: String =
    s"""WITH toks AS (SELECT doc_id, lang, source, text,
         |    list_filter(string_split_regex(lower(text),
         |      '${TextOps.TokenReDuck}'), t -> len(t) > 0) AS tk
         |  FROM documents),
         |d AS (SELECT doc_id, lang, source,
         |    CAST(len(tk) AS BIGINT) AS n_tok,
         |    strlen(text) AS n_chars, md5(text) AS h
         |  FROM toks),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_docs
         |  FROM d),
         |lc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM d
         |  GROUP BY 1),
         |topl AS (SELECT lang AS top_lang, nl AS top_lang_docs FROM lc
         |  ORDER BY nl DESC, lang LIMIT 1),
         |ent AS (SELECT ${dsumSql(
             "-(CAST(nl AS DOUBLE) / n_docs) * ln(CAST(nl AS DOUBLE) / n_docs)")}
         |    AS lang_entropy
         |  FROM lc CROSS JOIN tot)
         |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources,
         |  1000000 * n_dup_docs // n_docs AS exact_dup_ppm,
         |  top_lang, 1000000 * top_lang_docs // n_docs AS top_lang_ppm,
         |  lang_entropy
         |FROM tot CROSS JOIN topl CROSS JOIN ent""".stripMargin

  val all: Seq[Qry] = Seq(

    // ---- dataset card ------------------------------------------------------
    Qry("q252_dataset_card", CardOracle) { (spark, dir) =>
      import spark.implicits._
      // ONE corpus scan -> per-document facts; every aggregate above
      // is bounded (one global row, |langs| rows) and cross-joined back
      val d = Tables(spark, dir).documents
        .select($"doc_id", $"lang", $"source",
          size(TextOps.tokens($"text")).cast(LongType).as("n_tok"),
          length($"text").cast(LongType).as("n_chars"),
          md5($"text").as("h"))
      val tot = d.agg(count(one).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum($"n_chars").as("n_chars"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"source").as("n_sources"),
        (count(one) - countDistinct($"h")).as("n_dup_docs"))
      val lc = d.groupBy($"lang").agg(count(one).as("nl"))
      val topl = lc
        .withColumn("rn",
          row_number().over(Window.orderBy($"nl".desc, $"lang")))
        .filter($"rn" === 1)
        .select($"lang".as("top_lang"), $"nl".as("top_lang_docs"))
      val ent = lc.crossJoin(broadcast(tot.select($"n_docs".as("nd"))))
        .select(dsum(-($"nl".cast("double") / $"nd") *
          log($"nl".cast("double") / $"nd")).as("lang_entropy"))
      tot.crossJoin(broadcast(topl)).crossJoin(broadcast(ent))
        .select($"n_docs", $"n_tokens", $"n_chars", $"n_langs",
          $"n_sources",
          expr("1000000 * n_dup_docs DIV n_docs").as("exact_dup_ppm"),
          $"top_lang",
          expr("1000000 * top_lang_docs DIV n_docs").as("top_lang_ppm"),
          $"lang_entropy")
    },

    // ---- collocation mining ------------------------------------------------
    Qry(
      "q253_collocations",
      s"""WITH ${TextOps.oracleToksCte},
         |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n1
         |  FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn FROM uni),
         |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab FROM (
         |    SELECT unnest(list_transform(range(len(tk) - 1),
         |      i -> tk[CAST(i + 1 AS INT)])) AS a,
         |      unnest(list_transform(range(len(tk) - 1),
         |        i -> tk[CAST(i + 2 AS INT)])) AS b
         |    FROM toks WHERE len(tk) >= 2)
         |  GROUP BY 1, 2
         |  HAVING COUNT(*) >= $MinPair),
         |lift AS (SELECT a, b, nab,
         |    (1000000 * nab // ua.n1) * nn // ub.n1 AS lift_ppm
         |  FROM bi JOIN uni ua ON bi.a = ua.tok
         |    JOIN uni ub ON bi.b = ub.tok CROSS JOIN tot)
         |SELECT CAST(rn AS INT) AS rank, a, b, nab, lift_ppm
         |FROM (SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, a, b)
         |        AS rn FROM lift)
         |WHERE rn <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val toks = Tables(spark, dir).documents
        .select(TextOps.tokens($"text").as("tk"))
      val uni = toks.select(explode($"tk").as("tok"))
        .groupBy($"tok").agg(count(one).as("n1"))
      val tot = uni.agg(sum($"n1").as("nn"))
      // adjacent pairs: one corpus-sized explode, map-side collapsed;
      // the zip trick keeps tk in argument position (TextOps.shingles'
      // lambda-capture lesson)
      val bi = toks.filter(size($"tk") >= 2)
        .select(explode(zip_with(
          slice($"tk", lit(1), size($"tk") - 1),
          slice($"tk", lit(2), size($"tk") - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .select($"p.a", $"p.b")
        .groupBy($"a", $"b").agg(count(one).as("nab"))
        .filter($"nab" >= MinPair)
      // lift floored in the DECLARED order (1e6*nab/n_a, then *N/n_b)
      // so no product exceeds BIGINT at corpus scale
      bi.join(uni.select($"tok".as("ta"), $"n1".as("na")), $"a" === $"ta")
        .join(uni.select($"tok".as("tb"), $"n1".as("nb")), $"b" === $"tb")
        .crossJoin(broadcast(tot))
        .select($"a", $"b", $"nab",
          expr("(1000000 * nab DIV na) * nn DIV nb").as("lift_ppm"))
        .withColumn("rank",
          row_number().over(Window.orderBy($"lift_ppm".desc, $"a", $"b")))
        .filter($"rank" <= TopK)
        .select($"rank", $"a", $"b", $"nab", $"lift_ppm")
    }
  )
}
