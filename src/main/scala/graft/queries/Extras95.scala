package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Ninety-fifth coverage wave: the quality-filter capture curve and
  * the streaming AUC twin.
  *
  *  - q282: score-band capture curve — the operational readout of a
  *    quality filter: bucket q34's quantized score into 20-milli
  *    bands, and per band (descending) report document count,
  *    positive (English) count, band positive rate, and the
  *    CUMULATIVE capture rate — "threshold at this band and you keep
  *    X ppm of all positives at Y ppm precision", the table a curation
  *    owner reads before picking the cut. Pure integers; both windows
  *    run over the <= ~12 bands, never corpus rows.
  *  - q283: q281's exact AUC as a STREAMING aggregation — documents
  *    arrive as a file stream, the (score-level, pos, neg) count
  *    table is a complete-mode streaming groupBy whose state is
  *    bounded by the ~1001 quantized levels (the q220/q221/q272
  *    register discipline: score quantization IS what makes streaming
  *    eval state constant), and the Mann-Whitney tail runs post-sink.
  *    Shares q281's oracle text VERBATIM.
  */
object Extras95 {

  private val one = lit(1)
  /** Band width in score milli-units. */
  private val Band = 20L

  val all: Seq[Qry] = Seq(

    // ---- score-band capture curve ------------------------------------------
    Qry(
      "q282_capture_curve", {
        val stopRe = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
        s"""WITH ${TextOps.oracleToksCte},
           |q AS (SELECT lang,
           |    CAST(floor(1000 * (
           |      0.5e0 * (CAST(len(regexp_extract_all(lower(text),
           |          '$stopRe')) AS DOUBLE) / greatest(len(tk), 1))
           |      + 0.3e0 * (CAST(length(array_to_string(tk, ''))
           |          AS DOUBLE) / greatest(length(text), 1))
           |      - 0.2e0 * (CAST(len(regexp_extract_all(text,
           |          '[.,!?;:]')) AS DOUBLE) / greatest(length(text), 1))
           |    )) AS BIGINT) AS sm
           |  FROM toks),
           |b AS (SELECT CASE WHEN sm >= 0 THEN sm // $Band
           |      ELSE -((-sm + $Band - 1) // $Band) END AS band,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS pos
           |  FROM q GROUP BY 1),
           |t AS (SELECT SUM(n) AS tn, SUM(pos) AS tp FROM b),
           |c AS (SELECT band, n, pos,
           |    SUM(n) OVER (ORDER BY band DESC
           |      ROWS UNBOUNDED PRECEDING) AS cum_n,
           |    SUM(pos) OVER (ORDER BY band DESC
           |      ROWS UNBOUNDED PRECEDING) AS cum_pos
           |  FROM b)
           |SELECT band, n, pos,
           |  CAST(1000000 * pos // n AS BIGINT) AS band_rate_ppm,
           |  CAST(cum_n AS BIGINT) AS cum_docs,
           |  CAST(CASE WHEN tp = 0 THEN 0
           |    ELSE 1000000 * cum_pos // tp END AS BIGINT)
           |    AS capture_ppm,
           |  CAST(1000000 * cum_pos // cum_n AS BIGINT)
           |    AS precision_ppm
           |FROM c, t""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val q = Tables(spark, dir).documents
        .select($"lang", $"text", TextOps.tokens($"text").as("tk"))
        .select($"lang", Extras94.scoreMilli.as("sm"))
      // floor-toward-negative banding spelled once for both engines
      // (Spark DIV truncates; the CASE makes both floor)
      val b = q.groupBy(expr(
          s"CASE WHEN sm >= 0 THEN sm DIV $Band" +
            s" ELSE -((-sm + $Band - 1) DIV $Band) END").as("band"))
        .agg(count(one).as("n"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"))
      val t = b.agg(sum($"n").as("tn"), sum($"pos").as("tp"))
      val wD = Window.orderBy($"band".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      b.withColumn("cum_n", sum($"n").over(wD))
        .withColumn("cum_pos", sum($"pos").over(wD))
        .crossJoin(broadcast(t))
        .select($"band", $"n", $"pos",
          expr("1000000 * pos DIV n").as("band_rate_ppm"),
          $"cum_n".as("cum_docs"),
          when($"tp" === 0, 0L)
            .otherwise(expr("1000000 * cum_pos DIV tp"))
            .as("capture_ppm"),
          expr("1000000 * cum_pos DIV cum_n").as("precision_ppm"))
    },

    // ---- exact AUC under Structured Streaming ------------------------------
    Qry("q283_stream_auc", Extras94.AucOracle) { (spark, dir) =>
      import spark.implicits._
      // streaming state = the quantized level counts (~1001 rows) —
      // score quantization is what makes streaming eval state constant
      val g = Streams.fileStream(spark, dir, "documents")
        .select($"lang", $"text", TextOps.tokens($"text").as("tk"))
        .select($"lang", Extras94.scoreMilli.as("sm"))
        .groupBy($"sm")
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
          sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
      Extras94.aucTail(Streams.runToMemory(g, "complete"))
    }
  )
}
