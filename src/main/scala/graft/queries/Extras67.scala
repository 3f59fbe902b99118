package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Sixty-seventh coverage wave: content-defined chunking.
  *
  *  - q227: CDC (Rabin-style) passage-level dedup. Chunk boundaries
  *    are CONTENT-defined — a cut lands after every position whose
  *    rolling 2-token context hashes ≡ 0 (mod 16) — so an edit
  *    perturbs at most the chunks overlapping its 2-token window and
  *    duplicated PASSAGES dedupe across documents even when the
  *    documents as wholes differ. (The fixed-stride chunking of q99
  *    re-aligns every chunk after any edit — the exact weakness CDC
  *    exists to fix. The context is a 2-gram, not the single token:
  *    the fixture's 31-word vocabulary left no single token ≡ 0 mod
  *    16, and one-token cuts would also fire at every occurrence of a
  *    common word — 961 pair contexts give real boundary dispersion.
  *    Divisor 16 ⇒ ~16-token expected chunks against ~55-token
  *    documents.) Shape: posexplode → per-doc lag + prefix-sum of
  *    boundary flags (ONE window sort serves both) → hash each chunk →
  *    corpus-wide duplicate counts. The per-doc window partitions by
  *    doc_id — the embarrassingly partitionable grain — and everything
  *    downstream is a hash aggregate. Output: per-source chunk totals,
  *    distinct chunks, duplicated-chunk instances, and mean chunk
  *    length — the passage-dedup savings estimate a curation run
  *    reads first.
  */
object Extras67 {

  private val Div = 16L // boundary divisor: expected chunk ~16 tokens (fixture docs are ~50-60 tokens)

  /** (doc_id, source, ch_h, ch_len) CDC chunk table over a documents
    * frame — the pipeline q227 gates, shared with q234's delta probe. */
  private[queries] def chunkTable(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val wp = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val pos = docs
      .select(col("doc_id"), col("source"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("i", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(wp))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          TextOps.hashMod(concat_ws(" ", col("prev"), col("tok")))
            % Div === 0, 1).otherwise(0))
    val cid = pos.withColumn("chunk_id",
      coalesce(sum(col("cut"))
        .over(wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    cid.groupBy(col("doc_id"), col("source"), col("chunk_id"))
      .agg(TextOps.hashMod(array_join(transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          e => e.getField("tok")), " ")).as("ch_h"),
        count(lit(1)).as("ch_len"))
  }

  /** Oracle CTE chain producing `ch` = (doc_id, chunk_id, ch_h, ch_len)
    * — requires TextOps.oracleToksCte upstream. */
  private[queries] val oracleChunkCtes: String =
    s"""pos0 AS (SELECT doc_id, unnest(list_transform(range(len(tk)),
       |    i -> {'i': i, 'tok': tk[i + 1]})) AS u FROM toks),
       |pos AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM pos0),
       |pv AS (SELECT doc_id, i, tok,
       |    lag(tok) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |  FROM pos),
       |fl AS (SELECT doc_id, i, tok,
       |    CASE WHEN prev IS NOT NULL AND
       |      ${TextOps.oracleHashSql("prev || ' ' || tok")} % $Div = 0
       |      THEN 1 ELSE 0 END AS cut
       |  FROM pv),
       |cid AS (SELECT doc_id, i, tok,
       |    COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS chunk_id
       |  FROM fl),
       |ch AS (SELECT doc_id, chunk_id,
       |    ${TextOps.oracleHashSql("string_agg(tok, ' ' ORDER BY i)")}
       |      AS ch_h,
       |    COUNT(*) AS ch_len
       |  FROM cid GROUP BY 1, 2)""".stripMargin

  val all: Seq[Qry] = Seq(

    Qry(
      "q227_cdc_chunks",
      s"""WITH ${TextOps.oracleToksCte},
         |$oracleChunkCtes,
         |src AS (SELECT ch.doc_id, d.source, ch.ch_h, ch.ch_len
         |  FROM ch JOIN documents d USING (doc_id)),
         |dups AS (SELECT ch_h, COUNT(*) AS n FROM src GROUP BY 1)
         |SELECT source, COUNT(*) AS n_chunks,
         |  COUNT(DISTINCT s.ch_h) AS n_distinct,
         |  CAST(SUM(CASE WHEN dups.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_instances,
         |  CAST(SUM(s.ch_len) * 1000 // COUNT(*) AS BIGINT)
         |    AS mean_len_x1000
         |FROM src s JOIN dups ON s.ch_h = dups.ch_h
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // chunkTable: boundary flag from the SHARED hash, chunk id =
      // prefix-sum of flags, chunk content re-joined in position order
      // (array_sort of (i, tok) structs == the oracle's ORDER BY
      // inside string_agg)
      val ch = chunkTable(Tables(spark, dir).documents)
      val dups = ch.groupBy($"ch_h").agg(count(lit(1)).as("n"))
      ch.join(dups, "ch_h")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct($"ch_h").as("n_distinct"),
          sum(when($"n" > 1, 1).otherwise(0)).cast(LongType)
            .as("dup_instances"),
          (sum($"ch_len") * 1000L / count(lit(1))).cast(LongType)
            .as("mean_len_x1000"))
    },

    // ---- delta-batch passage decontamination ----------------------------
    // q156's asymmetry at the PASSAGE grain: an incoming delta batch
    // (a hash-chosen tenth of the corpus) probes the standing corpus'
    // chunk-hash index; the corpus never self-joins. Per delta doc:
    // how many of its passages the corpus already has, and the novelty
    // fraction — the daily-crawl question "is this document new text
    // or a remix of passages we already own?"
    Qry(
      "q234_delta_cdc_probe",
      s"""WITH ${TextOps.oracleToksCte},
         |$oracleChunkCtes,
         |d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 10 = 3
         |      AS is_new
         |  FROM documents),
         |corpus AS (SELECT DISTINCT ch_h FROM ch JOIN d USING (doc_id)
         |  WHERE NOT is_new),
         |delta AS (SELECT ch.doc_id, ch.ch_h FROM ch JOIN d USING (doc_id)
         |  WHERE is_new),
         |pr AS (SELECT delta.doc_id,
         |    CASE WHEN EXISTS (SELECT 1 FROM corpus
         |      WHERE corpus.ch_h = delta.ch_h) THEN 1 ELSE 0 END AS known
         |  FROM delta)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(known) AS BIGINT) AS known_chunks,
         |  CAST((COUNT(*) - SUM(known)) * 1000000 // COUNT(*) AS BIGINT)
         |    AS novelty_ppm
         |FROM pr GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir).documents
      val flags = docs.select($"doc_id",
        (TextOps.md5Long($"text") % 10 === 3).as("is_new"))
      val ch = graft.operators.Staging.stage(
        chunkTable(docs).join(flags, "doc_id"), eager = false)
      val corpus = ch.filter(!$"is_new").select($"ch_h").distinct()
      val delta = ch.filter($"is_new").select($"doc_id", $"ch_h")
      delta
        .join(corpus.withColumn("known", lit(1)), Seq("ch_h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce($"known", lit(0))).cast(LongType)
            .as("known_chunks"),
          ((count(lit(1)) - sum(coalesce($"known", lit(0)))) * 1000000L /
            count(lit(1))).cast(LongType).as("novelty_ppm"))
    }
  )
}
