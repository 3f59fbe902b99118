package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Sixty-second coverage wave: raw-web extraction + sketch-based
  * decontamination — two stages every crawl-to-training pipeline runs
  * before anything in the dedup/quality family sees a byte.
  *
  *  - q217: HTML main-text extraction. A deterministic HTML envelope is
  *    synthesized around each document (title, nav boilerplate, entity
  *    escaping, a hash-chosen number of inline links), then EXTRACTED
  *    back: tag strip, entity decode, whitespace collapse — with
  *    per-document markup ratio and link density, the two classic
  *    boilerplate signals (q180 scores lines; this one scores markup).
  *    The oracle rebuilds the same envelope and must reverse it to the
  *    same characters, so a tag regex that eats text, an entity pass
  *    run in the wrong order, or a collapse that loses a boundary all
  *    hash-fail on every row.
  *  - q218: Bloom-filter n-gram decontamination. The benchmark slice's
  *    3-gram shingles build a 64 Kbit / k=4 Bloom bitset (2048 packed
  *    32-bit words, ONE aggregated row — the shape that broadcasts to
  *    1000 executors as a few KB); every training document probes it
  *    with plain bit arithmetic and is scored by possibly-contaminated
  *    shingle count, next to the EXACT semi-join count, so the output
  *    carries the sketch's false-positive behavior per source and the
  *    no-false-negative invariant as a gated boolean. At 100 TB the
  *    exact side is the audit; the broadcast bitset is the production
  *    path (no shuffle of the benchmark set at all).
  *
  * Reference tie: the byte/field-decode discipline of
  * `/root/reference/src/main.rs:85-86` (validate before trusting),
  * applied to the LLM-pipeline surface the brief adds on top.
  */
object Extras62 {

  // ---- q218 Bloom geometry (shared by Spark plan and oracle SQL, and
  // by the q222 streaming gate in Extras64) ----------------------------
  private[queries] val MBits = 65536       // 2^16 bits
  private[queries] val Words = MBits / 32  // 2048 packed 32-bit words
  private[queries] val KHash = 4

  private def posA(i: Int): Long = TextOps.aParam(i)
  private def posB(i: Int): Long = TextOps.bParam(i)

  /** SQL expression for hash i's bit position of shingle-hash column
    * `h` — identical text feeds both engines via expr()/oracle.
    *
    * Reduce mod P BEFORE mod 2^16: `x mod 2^16` sees only the low 16
    * bits of the product (a·h mod 2^16 = (a mod 2^16)(h mod 2^16) mod
    * 2^16), so without the prime reduction all K positions collapse to
    * functions of h's low half — measured 3.6% false positives against
    * the ~0.05% the (m, k, n) geometry predicts. The mod-P pass mixes
    * the high bits in (same affine family as MinHash; products < 2^62,
    * no overflow either engine). */
  private[queries] def posSql(i: Int, h: String): String =
    s"(((${posA(i)} * $h + ${posB(i)}) % ${TextOps.P}) % $MBits)"

  /** One-row DataFrame holding the whole bitset as a dense `Words`-slot
    * BIGINT array (absent words zero-filled) — the form that broadcasts
    * to every executor as a few KB. `evh` must be a single-column `h`
    * frame of the member hashes. */
  private[queries] def bloomDense(spark: org.apache.spark.sql.SparkSession,
      evh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pos = (0 until KHash).map(i =>
      evh.select(expr(posSql(i, "h")).as("pos")))
      .reduce(_ unionByName _)
    val words = pos
      .select((col("pos") / 32).cast(LongType).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
          .as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
    spark.range(Words).select(col("id").as("w"))
      .join(words, Seq("w"), "left")
      .select(col("w"), coalesce(col("bits"), lit(0L)).as("bits"))
      .agg(array_sort(collect_list(struct(col("w"), col("bits")))).as("ws"))
      .select(transform(col("ws"), e => e.getField("bits")).as("blm"))
  }

  /** SQL boolean: all KHash bloom bits set for hash expression `h`,
    * probing the dense array column `blm` (1-based element_at). */
  private[queries] def probeSql(h: String): String =
    (0 until KHash).map { i =>
      s"((shiftright(element_at(blm, CAST(${posSql(i, h)} / 32 AS INT) + 1), " +
        s"CAST(${posSql(i, h)} % 32 AS INT)) & 1) = 1)"
    }.mkString("(", " AND ", ")")

  val all: Seq[Qry] = Seq(

    // ---- HTML main-text extraction --------------------------------------
    Qry(
      "q217_html_extract", {
        // DuckDB twin of the synthesis + extraction below. '\n' inside
        // the character class is two chars in the literal; RE2 decodes
        // the escape exactly like Java regex does.
        s"""WITH d AS (SELECT doc_id, source, text,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 3
           |      AS extra
           |  FROM documents),
           |syn AS (SELECT doc_id, source,
           |    '<html><head><title>doc ' || doc_id ||
           |    '</title></head><body>' ||
           |    '<nav><a href="/">home</a> <a href="/about">about</a></nav>' ||
           |    '<p>' || replace(replace(text, '&', '&amp;'), '<', '&lt;') ||
           |    '</p>' ||
           |    CASE extra WHEN 0 THEN ''
           |      WHEN 1 THEN '<p>see <a href="/more">more</a></p>'
           |      ELSE '<p><a href="/a">a</a> <a href="/b">b</a></p>' END ||
           |    '</body></html>' AS html
           |  FROM d),
           |ext AS (SELECT doc_id, source, html,
           |    trim(regexp_replace(
           |      replace(replace(
           |        regexp_replace(html, '<[^>]*>', ' ', 'g'),
           |        '&lt;', '<'), '&amp;', '&'),
           |      '[ \\t\\n\\r]+', ' ', 'g')) AS clean
           |  FROM syn)
           |SELECT doc_id, source,
           |  CAST(length(html) AS BIGINT) AS html_chars,
           |  CAST(length(clean) AS BIGINT) AS text_chars,
           |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT)
           |    AS n_tags,
           |  CAST(len(regexp_extract_all(html, '<a href')) AS BIGINT)
           |    AS n_links,
           |  CAST((length(html) - length(clean)) * 1000000
           |    // length(html) AS BIGINT) AS markup_ppm,
           |  CAST(len(regexp_extract_all(html, '<a href')) * 1000000
           |    // greatest(length(clean), 1) AS BIGINT) AS link_ppm
           |FROM ext""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      // Synthesis and extraction are both column pipelines over one
      // scan — no UDFs, no shuffle until there isn't one (per-row map
      // only; the 100-TB shape is embarrassingly parallel).
      val d = Tables(spark, dir).documents
        .select($"doc_id", $"source", $"text",
          (TextOps.md5Long($"text") % 3).as("extra"))
      val esc = regexp_replace(regexp_replace($"text", lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;"))
      val html = concat(
        lit("<html><head><title>doc "), $"doc_id".cast("string"),
        lit("</title></head><body>"),
        lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>"),
        lit("<p>"), esc, lit("</p>"),
        when($"extra" === 0, lit(""))
          .when($"extra" === 1,
            lit("<p>see <a href=\"/more\">more</a></p>"))
          .otherwise(
            lit("<p><a href=\"/a\">a</a> <a href=\"/b\">b</a></p>")),
        lit("</body></html>"))
      // extraction: tags -> space, entities decoded AFTER tag strip
      // (&lt; must not resurrect as markup before the tag pass ends —
      // decode-then-strip would eat text a crawler legally serves),
      // then whitespace collapse + trim
      val syn = d.select($"doc_id", $"source", html.as("html"))
      val clean = trim(regexp_replace(
        regexp_replace(regexp_replace(
          regexp_replace($"html", lit("<[^>]*>"), lit(" ")),
          lit("&lt;"), lit("<")),
          lit("&amp;"), lit("&")),
        lit("[ \\t\\n\\r]+"), lit(" ")))
      syn.select($"doc_id", $"source", $"html", clean.as("clean"))
        .select($"doc_id", $"source",
          length($"html").cast(LongType).as("html_chars"),
          length($"clean").cast(LongType).as("text_chars"),
          size(regexp_extract_all($"html", lit("<[^>]*>"), lit(0)))
            .cast(LongType).as("n_tags"),
          size(regexp_extract_all($"html", lit("<a href"), lit(0)))
            .cast(LongType).as("n_links"),
          ((length($"html") - length($"clean")).cast(LongType) * 1000000L /
            length($"html")).cast(LongType).as("markup_ppm"),
          (size(regexp_extract_all($"html", lit("<a href"), lit(0)))
            .cast(LongType) * 1000000L /
            greatest(length($"clean").cast(LongType), lit(1L)))
            .cast(LongType).as("link_ppm"))
    },

    // ---- Bloom-filter n-gram decontamination ----------------------------
    Qry(
      "q218_bloom_decontam", {
        val posUnions = (0 until KHash).map(i =>
          s"SELECT ${posSql(i, "h")} AS pos FROM evh").mkString("\nUNION ALL ")
        // per-hash bloom lookups for the probe side: w_i/bit_i derived
        // from the same posSql text
        val probeJoins = (0 until KHash).map { i =>
          s"LEFT JOIN bloom b$i ON b$i.w = ${posSql(i, "tr.h")} // 32"
        }.mkString("\n")
        val allSet = (0 until KHash).map { i =>
          s"((COALESCE(b$i.bits, 0) >> CAST(${posSql(i, "tr.h")} % 32 AS INT)) & 1) = 1"
        }.mkString(" AND ")
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |d AS (SELECT doc_id, source,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 10 = 0
           |      AS is_eval
           |  FROM documents),
           |evh AS (SELECT DISTINCT h FROM sh JOIN d USING (doc_id)
           |  WHERE is_eval),
           |pos AS ($posUnions),
           |bloom AS (SELECT pos // 32 AS w,
           |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
           |  FROM pos GROUP BY 1),
           |tr AS (SELECT sh.doc_id, d.source, sh.h FROM sh
           |  JOIN d USING (doc_id) WHERE NOT is_eval),
           |probe AS (SELECT tr.doc_id, tr.source,
           |    CASE WHEN $allSet THEN 1 ELSE 0 END AS bloom_hit,
           |    CASE WHEN EXISTS (SELECT 1 FROM evh WHERE evh.h = tr.h)
           |      THEN 1 ELSE 0 END AS exact_hit
           |  FROM tr
           |$probeJoins)
           |SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
           |  COUNT(*) AS n_shingles,
           |  CAST(SUM(bloom_hit) AS BIGINT) AS bloom_hits,
           |  CAST(SUM(exact_hit) AS BIGINT) AS exact_hits,
           |  CAST(SUM(bloom_hit) - SUM(exact_hit) AS BIGINT) AS fp_hits,
           |  CAST(SUM(CASE WHEN exact_hit = 1 AND bloom_hit = 0
           |    THEN 1 ELSE 0 END) = 0 AS BOOLEAN) AS never_misses
           |FROM probe GROUP BY 1""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir).documents
      val flags = docs.select($"doc_id", $"source",
        (TextOps.md5Long($"text") % 10 === 0).as("is_eval"))
      // distinct per-doc 3-gram shingle hashes (the canonical dedup
      // input), tagged with the split + source
      val sh = Dedup.shingleHashes(docs, "doc_id", "text")
        .join(flags, "doc_id")
      val evh = sh.filter($"is_eval").select($"h").distinct()
      // Bloom build: 4 positions per shingle -> packed 32-bit words ->
      // ONE row holding the whole bitset as a dense 2048-slot array
      // (absent words zero-filled), broadcast to the probe side. The
      // benchmark set never shuffles against the corpus.
      val dense = bloomDense(spark, evh)
      val tr = sh.filter(!$"is_eval").select($"doc_id", $"source", $"h")
      val probed = tr.crossJoin(broadcast(dense))
        .withColumn("bloom_hit", expr(probeSql("h")).cast("int"))
        .join(evh.select($"h", lit(1).as("exact_hit")), Seq("h"), "left")
        .select($"doc_id", $"source", $"bloom_hit",
          coalesce($"exact_hit", lit(0)).as("exact_hit"))
      probed.groupBy($"source")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_shingles"),
          sum($"bloom_hit").cast(LongType).as("bloom_hits"),
          sum($"exact_hit").cast(LongType).as("exact_hits"),
          (sum($"bloom_hit") - sum($"exact_hit")).cast(LongType)
            .as("fp_hits"),
          (sum(when($"exact_hit" === 1 && $"bloom_hit" === 0, 1)
            .otherwise(0)) === 0).as("never_misses"))
    }
  )
}
