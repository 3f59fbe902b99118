package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Sixty-first coverage wave: training-run sizing + the streaming
  * hygiene gate.
  *
  *  - q215: sequence-packing efficiency — the question asked before
  *    every training run: concatenating each source's documents (EOS
  *    between docs) into fixed `SeqLen`-token windows, how many
  *    optimizer steps is this corpus, and what fraction of the last
  *    window is padding? Pure aggregation arithmetic over the BPE
  *    pre-token counts (q56's tokenizer), no packing materialized —
  *    the PLAN for one is just sums.
  *  - q216: q214's encoding-hygiene classification as a STREAMING
  *    rollup — the ingest gate that quarantines mojibake before a
  *    tokenizer sees it, grouped by (bom, utf8_ok) with a
  *    parameter-level oracle shared with the batch semantics.
  */
object Extras61 {

  private val SeqLen = 2048L

  val all: Seq[Qry] = Seq(

    // ---- sequence-packing / optimizer-step sizing -----------------------
    Qry(
      "q215_seq_packing",
      s"""WITH t AS (SELECT source,
         |    len(regexp_extract_all(text, '${TextOps.BpeTokSql}'))
         |      + 1 AS toks
         |  FROM documents)
         |SELECT source,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  CAST((SUM(toks) + ${SeqLen - 1}) // $SeqLen AS BIGINT)
         |    AS n_windows,
         |  CAST(((SUM(toks) + ${SeqLen - 1}) // $SeqLen * $SeqLen
         |    - SUM(toks)) * 1000000
         |    // ((SUM(toks) + ${SeqLen - 1}) // $SeqLen * $SeqLen)
         |    AS BIGINT) AS pad_ppm
         |FROM t GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // +1 = the EOS token appended per document by the packer; the
      // padding lives only in each source's LAST window, so pad_ppm
      // falls as a source grows — the small-source tax this metric
      // exists to expose
      Tables(spark, dir).documents
        .select($"source",
          (TextOps.bpeTokenCount($"text") + 1L).as("toks"))
        .groupBy($"source")
        .agg(sum($"toks").as("total_tokens"))
        .select($"source", $"total_tokens",
          (($"total_tokens" + (SeqLen - 1)) / SeqLen).cast("long")
            .as("n_windows"),
          (((($"total_tokens" + (SeqLen - 1)) / SeqLen).cast("long")
            * SeqLen - $"total_tokens") * 1000000L /
            ((($"total_tokens" + (SeqLen - 1)) / SeqLen).cast("long")
              * SeqLen)).cast("long").as("pad_ppm"))
    },

    // ---- streaming encoding-hygiene gate --------------------------------
    Qry(
      "q216_stream_encoding",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents),
         |p AS (SELECT doc_id,
         |  CASE h60 % 8 WHEN 1 THEN 'utf8' WHEN 2 THEN 'utf16le'
         |    WHEN 3 THEN 'utf16be' ELSE 'none' END AS bom,
         |  (h60 % 8 <= 1) AS utf8_ok
         |FROM d)
         |SELECT bom, utf8_ok, COUNT(*) AS n
         |FROM p GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      def bytesLit(hex: String) = lit(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      val t = expr("CAST(text AS BINARY)")
      val pick = expr("CAST(h60 % 8 AS INT)")
      val blob = when(pick === 0, t)
        .when(pick === 1, concat(bytesLit("EFBBBF"), t))
        .when(pick === 2, concat(bytesLit("FFFE"), bytesLit("610062006300")))
        .when(pick === 3, concat(bytesLit("FEFF"), bytesLit("006100620063")))
        .when(pick === 4, concat(t, bytesLit("80")))
        .when(pick === 5, concat(t, bytesLit("C0AF")))
        .when(pick === 6, concat(t, bytesLit("E282")))
        .otherwise(concat(t, bytesLit("EDA080")))
      val agg = Streams.fileStream(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("b", blob)
        .select(
          when(expr("substring(b, 1, 3)") === bytesLit("EFBBBF"), "utf8")
            .when(expr("substring(b, 1, 2)") === bytesLit("FFFE"), "utf16le")
            .when(expr("substring(b, 1, 2)") === bytesLit("FEFF"), "utf16be")
            .otherwise("none").as("bom"),
          expr("utf8_valid(b)").as("utf8_ok"))
        .groupBy(col("bom"), col("utf8_ok"))
        .agg(count(lit(1)).as("n"))
      Streams.runToMemory(agg, "complete")
    }
  )
}
