package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{QualityLr, TextOps}
import graft.streaming.Streams

/** Hundred-fortieth coverage wave: the trained classifier's remaining
  * production rungs — calibration and streaming inference.
  *
  *  - q355: calibration table (reliability diagram) of q350's model:
  *    hard-sigmoid probabilities bucketed into 10 fixed 100 000-ppm
  *    bins; per bin the count, mean predicted probability and the
  *    ACTUAL positive rate, plus the signed gap — all exact integer
  *    ppm (the hard sigmoid is already integral; means are integral
  *    DIV). The companion every deployed classifier score needs
  *    beside q351's AUC: AUC says the ORDERING is right, calibration
  *    says the PROBABILITIES mean what they claim (the q335
  *    lift/gains shape, applied to the in-engine model).
  *
  *  - q356: streaming inference — the standing model (batch-trained
  *    weights, the static side) scores an incoming documents STREAM;
  *    the per-(doc, bucket) feature counts are the stream's only
  *    stateful aggregation (complete mode, the q314/q347 twin
  *    pattern), the score/quantize/AUC tail runs post-sink with the
  *    trained weights broadcast — so stream-scored == batch-scored is
  *    ONE hash against the same unrolled-training oracle. This is the
  *    serving shape: models train on the standing corpus, today's
  *    crawl scores as it lands.
  *
  * Scale shape: q355 adds one bounded 10-row tail to the training
  * pipeline; q356's stateful state is the (docs × ≤64) count table of
  * the scored WINDOW of data (the fixture streams the whole corpus —
  * a production deployment scores per micro-batch or per day-window);
  * weights ride a 64-row broadcast either way.
  */
object Extras140 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q355_quality_calibration",
      s"""WITH ${Extras137.trainCtes},
         |zf AS (SELECT f.doc_id, f.y, SUM(w.w * f.x) // 1000000 AS z
         |  FROM feat f JOIN w${Extras137.Rounds} w ON w.b = f.b
         |  GROUP BY 1, 2),
         |pp AS (SELECT doc_id, y,
         |    LEAST(GREATEST(500000 + z // 4, 0), 1000000) AS p FROM zf),
         |bins AS (SELECT LEAST(p // 100000, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(p) // COUNT(*) AS BIGINT) AS pred_ppm,
         |    CAST((1000000 * SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END))
         |      // COUNT(*) AS BIGINT) AS actual_ppm
         |  FROM pp GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n, pred_ppm, actual_ppm,
         |  pred_ppm - actual_ppm AS gap_ppm
         |FROM bins""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (feat, w) = Extras137.train(spark, dir)
      QualityLr.score(feat, w)
        .select($"y",
          expr("LEAST(GREATEST(500000 + z DIV 4, 0), 1000000)").as("p"))
        .groupBy(expr("LEAST(p DIV 100000, 9)").as("bin"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          expr("CAST(SUM(p) DIV COUNT(*) AS BIGINT)").as("pred_ppm"),
          expr("CAST((1000000 * SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END))" +
            " DIV COUNT(*) AS BIGINT)").as("actual_ppm"))
        .select($"bin".cast(LongType).as("bin"), $"n", $"pred_ppm",
          $"actual_ppm", ($"pred_ppm" - $"actual_ppm").as("gap_ppm"))
    },

    Qry(
      "q356_stream_model_serving",
      s"""WITH ${Extras137.trainCtes},
         |zf AS (SELECT f.doc_id, f.y, SUM(w.w * f.x) // 1000000 AS z
         |  FROM feat f JOIN w${Extras137.Rounds} w ON w.b = f.b
         |  GROUP BY 1, 2),
         |gl AS (SELECT z // 1000 AS sm,
         |    CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS pos,
         |    CAST(SUM(CASE WHEN y > 0 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS neg
         |  FROM zf GROUP BY 1),
         |cl AS (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY sm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumneg FROM gl)
         |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         |  CAST(SUM(neg) AS BIGINT) AS n_neg,
         |  CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc2,
         |  CAST(1000000 * SUM(pos * (2 * cumneg + neg))
         |    // (2 * SUM(pos) * SUM(neg)) AS BIGINT) AS auc_ppm
         |FROM cl""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // standing model: batch-trained weights (the static side) —
      // weights only; the batch feature leaf is never read here
      val w = Extras137.trainedW(spark, dir)
      // incoming stream: per-(doc, bucket) token counts are the one
      // stateful aggregation; everything after runs post-sink
      val counts = Streams.fileStream(spark, dir, "documents")
        .select($"doc_id",
          when($"lang" === "en", lit(1000000L)).otherwise(lit(0L))
            .as("y"),
          explode(TextOps.tokens($"text")).as("t"))
        .groupBy($"doc_id", $"y",
          (TextOps.md5Long($"t") % lit(TextOps.P) % QualityLr.B).as("b"))
        .agg(count(lit(1)).cast(LongType).as("c"))
      val sunk = Streams.runToMemory(counts, "complete")
      val nt = sunk.groupBy($"doc_id".as("__d"))
        .agg(sum($"c").as("__nt"))
      val feat = sunk.join(nt, $"doc_id" === $"__d")
        .select($"doc_id",
          $"y".cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .as("y"),
          $"b",
          expr("CAST((1000000 * c) DIV __nt AS DECIMAL(38,0))").as("x"))
      Extras94.aucTail(Extras137.learnedLevels(feat, w))
        .select($"n_pos", $"n_neg", $"auc2", $"auc_ppm")
    }
  )
}
