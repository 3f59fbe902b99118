package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Twelfth coverage wave: C4-style fixed-chunk cross-document dedup and
  * ordered string aggregation. */
object Extras12 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- fixed-chunk cross-document duplication (C4 shape) -------------
    // Non-overlapping 8-token chunks; a chunk appearing in more than one
    // document marks boilerplate/contamination (the C4/RefinedWeb line-
    // dedup rule, re-expressed over token chunks because the fixture text
    // has no line structure). Per-doc output: total chunks + how many are
    // corpus-duplicated. Chunking is per-row array arithmetic; the dup
    // set is one hash aggregate; the re-join is an equi-join on chunk —
    // scales exactly like the shingle machinery (and chunk count is L/8,
    // 8× SMALLER than the document stream, vs the 3-gram explosion's 3×
    // larger).
    Qry(
      "q99_chunk_dedup",
      s"""WITH ${TextOps.oracleToksCte},
         |ch AS (SELECT doc_id,
         |    unnest(list_transform(range(0, len(tk) - 7, 8),
         |      i -> array_to_string(tk[i+1:i+8], ' '))) AS chunk
         |  FROM toks WHERE len(tk) >= 8),
         |dup AS (SELECT chunk FROM (
         |    SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY 1)
         |  WHERE df > 1)
         |SELECT c.doc_id, COUNT(*) AS n_chunks,
         |  COUNT(d.chunk) AS n_dup_chunks
         |FROM ch c LEFT JOIN dup d ON c.chunk = d.chunk
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val chunks = t(spark, dir).documents
        .select($"doc_id",
          explode(TextOps.strideChunks(TextOps.tokens($"text"), 8))
            .as("chunk"))
      val dup = chunks.groupBy($"chunk")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" > 1)
        .select($"chunk".as("dchunk"))
      chunks.join(dup, $"chunk" === $"dchunk", "left")
        .groupBy($"doc_id")
        .agg(count(one).as("n_chunks"),
          count($"dchunk").as("n_dup_chunks"))
    },

    // ---- ordered string aggregation ------------------------------------
    // LISTAGG/string_agg with a declared order: collect_list is
    // partition-order-dependent, so the sort happens INSIDE the aggregate
    // result (array_sort) before joining — deterministic on any cluster
    // layout.
    Qry(
      "q100_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.nation
        .join(broadcast(tb.region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), ",")
          .as("nations"), count(one).as("n"))
    }
  )
}
