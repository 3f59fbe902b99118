package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Seventy-second coverage wave: dataset versioning.
  *
  *  - q237: snapshot diff — the release-to-release question every
  *    versioned corpus answers before publishing: what was added,
  *    removed, modified, unchanged, and what is the byte delta?
  *    Two hash-derived snapshots of the documents table (v1 drops one
  *    seventh, v2 drops another and revises a third) are compared the
  *    way a real manifest diff runs: FULL OUTER join on the stable id,
  *    content equality by hash — never by trusting a mtime — and a
  *    per-source × kind rollup with signed byte deltas. The oracle
  *    predicts every class from the synthesis parameters, so a join
  *    that drops null-side rows or a comparison that misses a revision
  *    hash-fails.
  */
object Extras72 {

  private val Rev = " [rev2]" // 7 chars appended to revised docs

  val all: Seq[Qry] = Seq(

    Qry(
      "q237_snapshot_diff",
      s"""WITH d AS (SELECT doc_id, source, strlen(text) AS len,
         |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 7
         |      AS c
         |  FROM documents),
         |k AS (SELECT doc_id, source, len,
         |    CASE c WHEN 2 THEN 'added' WHEN 5 THEN 'removed'
         |      WHEN 0 THEN 'modified' ELSE 'unchanged' END AS kind,
         |    CASE c WHEN 2 THEN len WHEN 5 THEN -len
         |      WHEN 0 THEN ${Rev.length} ELSE 0 END AS delta
         |  FROM d)
         |SELECT source, kind, COUNT(*) AS n,
         |  CAST(SUM(delta) AS BIGINT) AS bytes_delta
         |FROM k GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val d = Tables(spark, dir).documents
        .select($"doc_id", $"source", $"text",
          (TextOps.md5Long($"text") % 7).as("c"))
      val v1 = d.filter($"c" =!= 2)
        .select($"doc_id", $"source", $"text")
      val v2 = d.filter($"c" =!= 5)
        .select($"doc_id", $"source",
          when($"c" === 0, concat($"text", lit(Rev))).otherwise($"text")
            .as("text"))
      // the real diff: full-outer on the stable id, content compared
      // by hash (never by trusting a timestamp), byte deltas signed
      val j = v1.select($"doc_id", $"source".as("src1"),
          md5($"text").as("h1"), length($"text").as("l1"))
        .join(v2.select($"doc_id", $"source".as("src2"),
          md5($"text").as("h2"), length($"text").as("l2")),
          Seq("doc_id"), "full_outer")
      j.select(coalesce($"src1", $"src2").as("source"),
          when($"h1".isNull, "added")
            .when($"h2".isNull, "removed")
            .when($"h1" =!= $"h2", "modified")
            .otherwise("unchanged").as("kind"),
          (coalesce($"l2", lit(0)) - coalesce($"l1", lit(0)))
            .cast(LongType).as("delta"))
        .groupBy($"source", $"kind")
        .agg(count(lit(1)).as("n"),
          sum($"delta").cast(LongType).as("bytes_delta"))
    }
  )
}
