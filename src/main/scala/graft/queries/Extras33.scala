package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Pii
import graft.sources.Tables

/** Thirty-third coverage wave: PII scrubbing — the redaction pass every
  * public-web training corpus runs before anything else sees the text
  * (emails, phone numbers, IP addresses → typed placeholder tokens).
  *
  * The fixture corpus is synthetic word soup with no real PII, so the
  * query first INJECTS deterministic PII derived from `doc_id` — the
  * same expression on the Spark and DuckDB sides, so the scrubber is
  * exercised against real positives and the oracle still closes. The
  * regexes stay inside the RE2 subset (no backrefs, no lookaround) so
  * the Java and DuckDB engines cannot disagree on what matches.
  *
  * Scale shape: one scan, row-local projection + filter, no shuffle, no
  * UDF — `regexp_replace`/`regexp_count` are codegen'd built-ins, so the
  * whole redaction pass rides a single WholeStageCodegen over the corpus.
  * At 100 TB this is the embarrassing-parallel ideal: bytes in, bytes
  * out, zero exchanges (the ORDER BY here exists only for the oracle's
  * deterministic hash compare).
  */
object Extras33 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // RE2-safe patterns, shared verbatim by both engines (operators.Pii)
  private val EmailRe = Pii.EmailRe
  private val PhoneRe = Pii.PhoneRe
  private val IpRe = Pii.IpRe

  val all: Seq[Qry] = Seq(

    // ---- PII injection + redaction ------------------------------------
    // doc_id % 3 == 0 → an email is appended; doc_id % 3 == 1 → a phone
    // and an IPv4; doc_id % 3 == 2 → untouched. ALL documents are
    // emitted: the untouched third must come out with zero counts and
    // clean_md5 == md5(text), so false positives on clean text fail the
    // oracle hash. (A WHERE on the computed counts would also get pushed
    // below the projection and re-evaluate every regex twice — emitting
    // the full corpus keeps the plan one scan → one project chain.)
    // The md5 of the redacted text pins the exact byte-level
    // replacement, not just the match counts.
    Qry(
      "q151_pii_redact",
      s"""WITH inj AS (SELECT doc_id, source, CASE
         |    WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id ||
         |      '@mail.example.com now'
         |    WHEN doc_id % 3 = 1 THEN text || ' call +1-555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |      ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
         |    ELSE text END AS text2 FROM documents),
         |red AS (SELECT doc_id, source,
         |    len(regexp_extract_all(text2, '$EmailRe')) AS n_emails,
         |    len(regexp_extract_all(text2, '$PhoneRe')) AS n_phones,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      text2, '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g'),
         |      '$IpRe', '<IP>', 'g') AS clean FROM inj)
         |SELECT doc_id, source, n_emails, n_phones,
         |  len(regexp_extract_all(clean, '<IP>')) AS n_ips,
         |  md5(clean) AS clean_md5, length(clean) AS clean_len
         |FROM red""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val injected = t(spark, dir).documents.select($"doc_id", $"source",
        when($"doc_id" % 3 === 0,
          concat($"text", lit(" contact user"), $"doc_id".cast("string"),
            lit("@mail.example.com now")))
          .when($"doc_id" % 3 === 1,
            concat($"text", lit(" call +1-555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit(" from 10."), ($"doc_id" % 256).cast("string"),
              lit(".0."), ($"doc_id" % 100).cast("string")))
          .otherwise($"text").as("text2"))
      injected
        .select($"doc_id", $"source",
          Pii.emailCount($"text2").as("n_emails"),
          Pii.phoneCount($"text2").as("n_phones"),
          Pii.redact($"text2").as("clean"))
        .select($"doc_id", $"source", $"n_emails", $"n_phones",
          regexp_count($"clean", lit("<IP>")).as("n_ips"),
          md5($"clean").as("clean_md5"),
          length($"clean").as("clean_len"))
    }
  )
}
