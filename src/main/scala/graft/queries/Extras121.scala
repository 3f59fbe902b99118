package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.operators.TextOps
import graft.sources.Tables

/** Hundred-twenty-first coverage wave: drift ATTRIBUTION and fuzzy
  * contamination — the diagnostic rungs above q313's drift detection
  * and q107/q153's exact/semantic decontamination.
  *
  *  - q320: leave-one-out chi-square attribution — q313 says THAT the
  *    corpus mix depends on provenance; q320 says WHICH source drives
  *    it: for every source s, the chi-square statistic recomputed on
  *    the corpus WITHOUT s, derived purely by MARGIN ALGEBRA on the
  *    bounded (source, lang) count table (N′ = N−R_s, C′_l = C_l −
  *    O_{s,l}; languages whose column empties drop out, the standard
  *    contingency-table rule). delta_ppm = full − LOO is the source's
  *    contribution to the dependence signal. No corpus rescan per
  *    source — the 100 TB shape: ONE corpus-sized count groupBy, then
  *    sources × cells arithmetic on broadcast-bounded tables. Margins
  *    and differences stay exact DECIMAL(38,0)/HUGEINT; each final
  *    cell ratio uses the q342 device (correctly-rounded double
  *    conversion of the exact operands, IEEE division, round) so the
  *    statistic never overflows 38 digits at any corpus size (the
  *    integral DIV form NULLs silently past N ≈ 4·10⁷ — r12 advisory).
  *
  *  - q321: fuzzy benchmark-contamination scan — the edit-tolerant
  *    rung that exact n-gram overlap (q107) and embedding similarity
  *    (q153) bracket: OCR noise or light paraphrase defeats exact
  *    shingles while staying within a few character edits. The
  *    "benchmark phrase" is the corpus's most frequent 5-token window
  *    (deterministic: max count, ties lexicographic). Candidate
  *    windows must share ≥ 3 distinct tokens with the phrase (the
  *    q-gram-filter principle: a cheap set-overlap equi-join prunes
  *    the corpus before any edit distance runs — Levenshtein touches
  *    only ~1% of windows); survivors are verified with
  *    character-level Levenshtein and flagged at distance ≤ 6. At
  *    100 TB the phrase set (a benchmark suite) is broadcast; the
  *    token inverted-index join is the only corpus-sized stage.
  */
object Extras121 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q320_chi_square_attribution",
      """WITH o AS (SELECT source, lang, CAST(COUNT(*) AS HUGEINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, SUM(o) AS r FROM o GROUP BY 1),
        |c AS (SELECT lang, SUM(o) AS c FROM o GROUP BY 1),
        |n AS (SELECT SUM(o) AS n FROM o),
        |g AS (SELECT r.source, c.lang, COALESCE(o.o, 0) AS o, r.r, c.c
        |  FROM r CROSS JOIN c
        |  LEFT JOIN o ON o.source = r.source AND o.lang = c.lang),
        |full_chi AS (SELECT SUM(CAST(round((1000000
        |      * (CAST(g.o * n.n - g.r * g.c AS DOUBLE)
        |         * CAST(g.o * n.n - g.r * g.c AS DOUBLE)))
        |      / CAST(n.n * g.r * g.c AS DOUBLE)) AS BIGINT)) AS f
        |  FROM g CROSS JOIN n),
        |loo AS (SELECT x.source AS xs, SUM(
        |    CASE WHEN g.c - xo.o > 0 THEN
        |      CAST(round((1000000
        |        * (CAST(g.o * (n.n - x.r) - g.r * (g.c - xo.o) AS DOUBLE)
        |           * CAST(g.o * (n.n - x.r) - g.r * (g.c - xo.o)
        |               AS DOUBLE)))
        |      / CAST((n.n - x.r) * g.r * (g.c - xo.o) AS DOUBLE))
        |        AS BIGINT) ELSE 0 END) AS chi
        |  FROM r x CROSS JOIN n
        |  JOIN g ON g.source <> x.source
        |  JOIN g xo ON xo.source = x.source AND xo.lang = g.lang
        |  GROUP BY 1),
        |rr AS (SELECT source, CAST(r AS BIGINT) AS n_docs FROM r)
        |SELECT rr.source, rr.n_docs,
        |  CAST(full_chi.f AS BIGINT) AS chi2_full_ppm,
        |  CAST(loo.chi AS BIGINT) AS chi2_loo_ppm,
        |  CAST(full_chi.f - loo.chi AS BIGINT) AS delta_ppm
        |FROM rr JOIN loo ON loo.xs = rr.source
        |CROSS JOIN full_chi""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val o = Tables(spark, dir).documents
        .groupBy($"source", $"lang").agg(count(lit(1)).as("o"))
      val r = o.groupBy($"source").agg(sum($"o").as("r"))
      val c = o.groupBy($"lang").agg(sum($"o").as("c"))
      val n = o.agg(sum($"o").as("n"))
      val g = r.crossJoin(broadcast(c))
        .join(o.withColumnRenamed("o", "obs"), Seq("source", "lang"),
          "left_outer")
        .select($"source", $"lang",
          dec(coalesce($"obs", lit(0L))).as("o"),
          dec($"r").as("r"), dec($"c").as("c"))
      // final cell ratios via the q342 device (exact decimal operands,
      // one correctly-rounded double conversion each, IEEE division +
      // round — engine-identical): the all-integral DIV form needs
      // ~10⁶·N⁴ headroom and silently NULLs past DECIMAL(38,0) once
      // N > ~4·10⁷ rows (r12 advisory)
      val full = g.crossJoin(broadcast(n))
        .select(expr("CAST(round((1000000 " +
          "* (CAST(o * n - r * c AS DOUBLE) " +
          "* CAST(o * n - r * c AS DOUBLE))) " +
          "/ CAST(n * r * c AS DOUBLE)) AS BIGINT)").as("t"))
        .agg(sum($"t").as("f"))
      // LOO by margin algebra: for excluded source xs, n' = n - r_xs
      // and c'_l = c_l - o_{xs,l}; cells of xs drop, empty columns drop
      val x = g.select($"source".as("xs"), $"lang".as("xl"),
        $"o".as("xo"))
      val xr = r.select($"source".as("xs"), dec($"r").as("xrr"))
      val loo = g.join(broadcast(x), $"lang" === $"xl" &&
          $"source" =!= $"xs")
        .join(broadcast(xr), "xs")
        .crossJoin(broadcast(n))
        .select($"xs",
          when($"c" - $"xo" > 0,
            expr("CAST(round((1000000 " +
              "* (CAST(o * (n - xrr) - r * (c - xo) AS DOUBLE) " +
              "* CAST(o * (n - xrr) - r * (c - xo) AS DOUBLE))) " +
              "/ CAST((n - xrr) * r * (c - xo) AS DOUBLE)) AS BIGINT)"))
            .otherwise(lit(0L)).as("t"))
        .groupBy($"xs").agg(sum($"t").as("chi"))
      r.select($"source", $"r".cast(LongType).as("n_docs"))
        .join(loo, $"source" === $"xs")
        .crossJoin(broadcast(full))
        .select($"source", $"n_docs",
          $"f".cast(LongType).as("chi2_full_ppm"),
          $"chi".cast(LongType).as("chi2_loo_ppm"),
          ($"f" - $"chi").cast(LongType).as("delta_ppm"))
    },

    Qry(
      "q321_fuzzy_contamination",
      s"""WITH toks AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text),
         |    '${TextOps.TokenReDuck}'), t -> len(t) > 0) AS tk
         |  FROM documents WHERE lang = 'en'),
         |win AS (SELECT doc_id, unnest(range(len(tk) - 4)) AS i, tk
         |  FROM toks WHERE len(tk) >= 5),
         |w AS (SELECT doc_id, i AS pos,
         |    array_to_string(tk[i+1:i+5], ' ') AS wtext,
         |    tk[i+1:i+5] AS wt FROM win),
         |cnt AS (SELECT wtext, COUNT(*) AS c FROM w GROUP BY 1),
         |phrase AS (SELECT wtext AS p FROM cnt
         |           ORDER BY c DESC, wtext LIMIT 1),
         |ptoks AS (SELECT DISTINCT unnest(string_split(p, ' ')) AS pt
         |  FROM phrase),
         |wtok AS (SELECT DISTINCT doc_id, pos, unnest(wt) AS t FROM w),
         |ov AS (SELECT doc_id, pos, COUNT(DISTINCT t) AS overlap
         |  FROM wtok JOIN ptoks ON t = pt GROUP BY 1, 2)
         |SELECT w.doc_id, w.pos, w.wtext,
         |  CAST(ov.overlap AS BIGINT) AS overlap,
         |  CAST(levenshtein(w.wtext, phrase.p) AS BIGINT) AS dist,
         |  CASE WHEN levenshtein(w.wtext, phrase.p) <= 6
         |    THEN 1 ELSE 0 END AS hit
         |FROM w JOIN ov USING (doc_id, pos) CROSS JOIN phrase
         |WHERE ov.overlap >= 3""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val toks = Tables(spark, dir).documents
        .filter($"lang" === "en")
        .select($"doc_id", TextOps.tokens($"text").as("tk"))
        .filter(size($"tk") >= 5)
      val w = toks
        .select($"doc_id", posexplode(TextOps.shingles($"tk", 5)))
        .select($"doc_id", $"pos", $"col".as("wtext"))
      // deterministic benchmark phrase: most frequent 5-token window,
      // ties to the lexicographic minimum
      val phrase = w.groupBy($"wtext").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"wtext").limit(1)
        .select($"wtext".as("p"))
      val ptoks = phrase
        .select(explode(split($"p", " ")).as("pt")).distinct()
      val wtok = w
        .select($"doc_id", $"pos", explode(split($"wtext", " ")).as("t"))
        .distinct()
      val ov = wtok.join(broadcast(ptoks), $"t" === $"pt")
        .groupBy($"doc_id", $"pos")
        .agg(countDistinct($"t").as("overlap"))
        .filter($"overlap" >= 3)
      w.join(ov, Seq("doc_id", "pos"))
        .crossJoin(broadcast(phrase))
        .select($"doc_id", $"pos", $"wtext",
          $"overlap".cast(LongType).as("overlap"),
          levenshtein($"wtext", $"p").cast(LongType).as("dist"),
          when(levenshtein($"wtext", $"p") <= 6, 1).otherwise(0)
            .as("hit"))
    }
  )
}
