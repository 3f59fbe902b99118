package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sixtieth coverage wave: text-encoding hygiene.
  *
  *  - q214: BOM + strict UTF-8 validity classification — the very
  *    first pass a text-ingest pipeline runs over raw bytes before
  *    any tokenizer sees them. `utf8_valid` is a strict RFC 3629
  *    scan (overlong encodings, surrogate code points, F5..FF leads,
  *    truncated tails all false); BOM detection is a plain binary
  *    prefix compare. The synthesized corpus covers four BOM states
  *    and four distinct invalidity classes, so the oracle hash pins
  *    each rejection rule separately — a validator that "just
  *    decodes and catches" typically accepts surrogates or overlongs
  *    and would fail here.
  */
object Extras60 {

  private def bytesLit(hex: String) = lit(
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  val all: Seq[Qry] = Seq(

    Qry(
      "q214_encoding_sniff",
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
         |  FROM documents)
         |SELECT doc_id,
         |  CASE h60 % 8 WHEN 1 THEN 'utf8' WHEN 2 THEN 'utf16le'
         |    WHEN 3 THEN 'utf16be' ELSE 'none' END AS bom,
         |  (h60 % 8 <= 1) AS utf8_ok
         |FROM d""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      // class 0: bare text; 1: UTF-8 BOM (itself valid UTF-8); 2/3:
      // UTF-16 BOMs with 16-bit payloads (FF/FE leads are never valid
      // UTF-8); 4: lone continuation byte; 5: overlong '/' (C0 AF —
      // the classic path-traversal smuggle); 6: truncated 3-byte
      // sequence at EOF; 7: CESU-8 surrogate (ED A0 80)
      val t = expr("CAST(text AS BINARY)")
      val blob = expr("CAST(h60 % 8 AS INT)") match { case pick =>
        when(pick === 0, t)
          .when(pick === 1, concat(bytesLit("EFBBBF"), t))
          .when(pick === 2, concat(bytesLit("FFFE"), bytesLit("610062006300")))
          .when(pick === 3, concat(bytesLit("FEFF"), bytesLit("006100620063")))
          .when(pick === 4, concat(t, bytesLit("80")))
          .when(pick === 5, concat(t, bytesLit("C0AF")))
          .when(pick === 6, concat(t, bytesLit("E282")))
          .otherwise(concat(t, bytesLit("EDA080")))
      }
      Tables(spark, dir).documents
        .select(col("doc_id"), col("text"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("b", blob)
        .select(col("doc_id"),
          when(expr("substring(b, 1, 3)") === bytesLit("EFBBBF"), "utf8")
            .when(expr("substring(b, 1, 2)") === bytesLit("FFFE"), "utf16le")
            .when(expr("substring(b, 1, 2)") === bytesLit("FEFF"), "utf16be")
            .otherwise("none").as("bom"),
          expr("utf8_valid(b)").as("utf8_ok"))
    }
  )
}
