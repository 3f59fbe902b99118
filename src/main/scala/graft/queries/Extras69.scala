package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Sixty-ninth coverage wave: crawl-policy filtering + code detection.
  *
  *  - q230: robots.txt (REP) longest-match evaluation. Per-domain rule
  *    sets (three policy shapes: blanket-disallow-with-carve-out,
  *    directory blocks, tmp-only) are joined against per-document
  *    URLs and evaluated the way RFC 9309 / the Google REP says:
  *    the LONGEST matching rule wins, Allow beats Disallow on equal
  *    length, no match → allowed. The rule table is a broadcast (a
  *    real crawl's robots corpus is tiny next to its URL corpus), the
  *    match is a prefix compare, the verdict a per-URL top-1 window —
  *    the fetch-or-skip gate every crawler runs before touching a
  *    page.
  *  - q231: code-vs-prose detection for corpus routing. A hash-chosen
  *    quarter of documents get a code block appended; the detector
  *    recovers them from SIGNALS only — symbol density (braces,
  *    semicolons, equals), language-keyword hits, camelCase
  *    transitions — the heuristics a curation pipeline uses to route
  *    text to the code tokenizer. Thresholds sit far from the noise
  *    floor of word-soup prose, and the oracle computes the same
  *    regex counts, so a drifting regex or density cut hash-fails.
  */
object Extras69 {

  /** (policy class, type, path prefix) — policy class = source idx % 3. */
  private val Rules = Seq(
    (0, "disallow", "/private/"), (0, "allow", "/private/ok/"),
    (1, "disallow", "/"), (1, "allow", "/public/"),
    (2, "disallow", "/tmp/"))

  private val Paths = Seq(
    "/public/a", "/private/x", "/private/ok/y", "/tmp/z", "/index")

  val all: Seq[Qry] = Seq(

    // ---- robots.txt longest-match verdicts ------------------------------
    Qry(
      "q230_robots_filter", {
        val ruleRows = Rules.map { case (c, t, r) =>
          s"($c, '$t', '$r')" }.mkString(", ")
        val pathCase = Paths.zipWithIndex.map { case (p, i) =>
          s"WHEN $i THEN '$p'" }.mkString(" ")
        s"""WITH d AS (SELECT doc_id, source,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
           |  FROM documents),
           |u AS (SELECT doc_id,
           |    CAST(substring(source, 4) AS INT) % 3 AS cls,
           |    CASE h % ${Paths.size} $pathCase END AS path
           |  FROM d),
           |r AS (SELECT * FROM (VALUES $ruleRows) AS t(cls, typ, rule)),
           |m AS (SELECT u.doc_id, u.path, r.typ, r.rule,
           |    row_number() OVER (PARTITION BY u.doc_id
           |      ORDER BY length(r.rule) DESC, r.typ, r.rule) AS rn
           |  FROM u JOIN r ON u.cls = r.cls
           |    AND substring(u.path, 1, length(r.rule)) = r.rule)
           |SELECT u.doc_id, u.path, m.rule AS matched_rule,
           |  m.typ AS rule_type,
           |  COALESCE(m.typ = 'allow', TRUE) AS allowed
           |FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
           |  USING (doc_id)""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val u = Tables(spark, dir).documents
        .select($"doc_id",
          (expr("CAST(substring(source, 4) AS INT)") % 3).as("cls"),
          element_at(
            array(Paths.map(lit): _*),
            (graft.operators.TextOps.md5Long($"text") % Paths.size + 1)
              .cast("int")).as("path"))
      val r = Rules.toDF("cls", "typ", "rule")
      // REP: longest rule wins, allow beats disallow on ties
      val m = u.join(broadcast(r), Seq("cls"))
        .filter(expr("substring(path, 1, length(rule)) = rule"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"doc_id")
            .orderBy(length($"rule").desc, $"typ", $"rule")))
        .filter($"rn" === 1)
        .select($"doc_id", $"typ", $"rule")
      u.join(m, Seq("doc_id"), "left")
        .select($"doc_id", $"path", $"rule".as("matched_rule"),
          $"typ".as("rule_type"),
          coalesce($"typ" === "allow", lit(true)).as("allowed"))
    },

    // ---- code-vs-prose routing ------------------------------------------
    Qry(
      "q231_code_detect", {
        s"""WITH d AS (SELECT doc_id, source, text,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
           |  FROM documents),
           |s AS (SELECT doc_id, source,
           |    CASE WHEN h % 4 = 0 THEN text ||
           |      ' function load(data) { var idx = 0; return idx; }'
           |    ELSE text END AS body
           |  FROM d),
           |sig AS (SELECT doc_id, source, length(body) AS len,
           |    len(regexp_extract_all(body, '[{}();=]')) AS sym,
           |    len(regexp_extract_all(body,
           |      '\\b(function|return|var|def|class)\\b')) AS kw,
           |    len(regexp_extract_all(body, '[a-z][A-Z]')) AS camel
           |  FROM s)
           |SELECT doc_id, source, CAST(sym AS BIGINT) AS sym,
           |  CAST(kw AS BIGINT) AS kw, CAST(camel AS BIGINT) AS camel,
           |  CAST(sym * 1000000 // len AS BIGINT) AS sym_ppm,
           |  (sym * 1000000 // len >= 10000 AND kw >= 2) AS is_code
           |FROM sig""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val body = when(
        graft.operators.TextOps.md5Long($"text") % 4 === 0,
        concat($"text",
          lit(" function load(data) { var idx = 0; return idx; }")))
        .otherwise($"text")
      Tables(spark, dir).documents
        .select($"doc_id", $"source", body.as("body"))
        .select($"doc_id", $"source", length($"body").as("len"),
          size(regexp_extract_all($"body", lit("[{}();=]"), lit(0)))
            .as("sym"),
          size(regexp_extract_all($"body",
            lit("\\b(function|return|var|def|class)\\b"), lit(0)))
            .as("kw"),
          size(regexp_extract_all($"body", lit("[a-z][A-Z]"), lit(0)))
            .as("camel"))
        .select($"doc_id", $"source",
          $"sym".cast(LongType).as("sym"),
          $"kw".cast(LongType).as("kw"),
          $"camel".cast(LongType).as("camel"),
          expr("CAST(sym AS BIGINT) * 1000000 div len").cast(LongType)
            .as("sym_ppm"),
          (expr("CAST(sym AS BIGINT) * 1000000 div len") >= 10000 &&
            $"kw" >= 2).as("is_code"))
    }
  )
}
