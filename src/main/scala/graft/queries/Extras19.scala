package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Nineteenth coverage wave: multimodal resize planning, the Spark 4
  * VARIANT path, and corpus-inequality measurement. */
object Extras19 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- thumbnail-dimension planning (multimodal metadata op) ---------
    // Aspect-preserving fit of every media item into a 128x128 box using
    // ONLY integer arithmetic (w*128 div max-side), so both engines agree
    // exactly; the decode-free half of a resize stage — the pixel work
    // happens in the q48 mapPartitions stub, the PLANNING is relational.
    // Derives (w, h) from the same md5-synthesized metadata as q48.
    Qry(
      "q126_thumb_dims",
      """WITH m AS (SELECT
        |    CAST(64 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
        |      % 193 AS BIGINT) AS w,
        |    CAST(64 + (CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)
        |      // 193) % 193 AS BIGINT) AS h
        |  FROM documents),
        |d AS (SELECT w, h,
        |    CASE WHEN w >= h THEN 128 ELSE (w * 128) // h END AS tw,
        |    CASE WHEN w >= h THEN (h * 128) // w ELSE 128 END AS th
        |  FROM m)
        |SELECT tw, th, COUNT(*) AS n,
        |  CAST(MIN(w) AS BIGINT) AS min_w, CAST(MAX(h) AS BIGINT) AS max_h
        |FROM d GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val hexpr = expr(
        "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")
      val m = t(spark, dir).documents
        .select((lit(64L) + hexpr % 193).as("w"),
          (lit(64L) + expr(
            "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)" +
              " div 193") % 193).as("h"))
      m.select($"w", $"h",
          when($"w" >= $"h", lit(128L))
            .otherwise(expr("(w * 128) div h")).as("tw"),
          when($"w" >= $"h", expr("(h * 128) div w"))
            .otherwise(lit(128L)).as("th"))
        .groupBy($"tw", $"th")
        .agg(count(one).as("n"), min($"w").as("min_w"),
          max($"h").as("max_h"))
    },

    // ---- VARIANT ingestion (Spark 4 semi-structured path) --------------
    // parse_json into a VARIANT column + typed variant_get extraction —
    // the shredded semi-structured story, distinct from q22's
    // string-path get_json_object. The variant never reaches the output
    // (gate contract: scalar columns only); the extracted BIGINT does.
    Qry(
      "q127_variant_extract",
      """SELECT event_type,
        |  COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_min,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_max,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS k_sum
        |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val k = expr("variant_get(parse_json(props), '$.k', 'bigint')")
      t(spark, dir).events
        .select($"event_type", k.as("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n_with_k"), min($"k").as("k_min"),
          max($"k").as("k_max"), sum($"k").as("k_sum"))
    },

    // ---- Gini coefficient of document length per source ----------------
    // Corpus-balance inequality measure (0 = uniform lengths, →1 = one
    // giant doc dominates): G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n over
    // ascending-sorted lengths. Both Σ terms are exact BIGINT sums (rank
    // ties on equal x cancel in Σ rank·x, so the doc_id tiebreak cannot
    // change the result); one window + one aggregate per source.
    Qry(
      "q128_length_gini",
      """WITH r AS (SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |m AS (SELECT source, COUNT(*) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(rn * n_chars) AS BIGINT) AS srx
        |  FROM r GROUP BY 1)
        |SELECT source, n AS n_docs,
        |  round(CASE WHEN sx > 0 THEN
        |      2.0e0 * srx / (CAST(n AS DOUBLE) * sx)
        |        - CAST(n + 1 AS DOUBLE) / n
        |    END, 6) AS gini
        |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
      t(spark, dir).documents
        .select($"source", $"n_chars",
          row_number().over(w).cast("long").as("rn"))
        .groupBy($"source")
        .agg(count(one).as("n"), sum($"n_chars").as("sx"),
          sum($"rn" * $"n_chars").as("srx"))
        .select($"source", $"n".as("n_docs"),
          round(when($"sx" > 0,
            lit(2.0e0) * $"srx" / ($"n".cast("double") * $"sx") -
              ($"n" + 1).cast("double") / $"n"), 6).as("gini"))
    }
  )
}
