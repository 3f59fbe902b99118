package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.GraftSession
import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Scratch probe: integer-ppm hard-sigmoid logistic training over
  * hashed token features — sweeps eta/rounds, prints train AUC vs the
  * q281 heuristic (dev tool for freezing q350/q351 constants). */
object LrProbe {
  private val B = 64

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.build("lr-probe")
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val tf = docs
      .select($"doc_id", $"lang", explode(TextOps.tokens($"text")).as("t"))
      .groupBy($"doc_id", $"lang",
        (TextOps.md5Long($"t") % lit(TextOps.P) % B).as("b"))
      .agg(count(lit(1)).cast(LongType).as("c"))
    val nt = tf.groupBy($"doc_id".as("__d")).agg(sum($"c").as("__nt"))
    val feat = Staging.stage(
      tf.join(nt, $"doc_id" === $"__d")
        .select($"doc_id",
          when($"lang" === "en", lit(1000000L)).otherwise(lit(0L))
            .cast(DecimalType(38, 0)).as("y"),
          $"b",
          expr("CAST((1000000 * c) DIV __nt AS DECIMAL(38,0))").as("x")),
      eager = true)
    val nDocs = feat.select($"doc_id").distinct().count()
    println(s"[probe] docs=$nDocs")

    def train(eta: Long, rounds: Int): DataFrame = {
      var w = Staging.stage(
        spark.range(B).select($"id".as("b"),
          lit(0).cast(DecimalType(38, 0)).as("w")),
        eager = true)
      for (_ <- 1 to rounds) {
        val z = feat.join(broadcast(w), "b")
          .groupBy($"doc_id", $"y")
          .agg(expr("CAST(SUM(w * x) DIV 1000000 AS DECIMAL(38,0))")
            .as("z"))
        val resid = z.select($"doc_id",
          (least(greatest(lit(500000).cast(DecimalType(38, 0)) +
            expr("z DIV 4"), lit(0)), lit(1000000)) - $"y").as("r"))
        val g = feat.join(resid, "doc_id")
          .groupBy($"b").agg(sum($"r" * $"x").as("g"))
        val wNext = Staging.stage(
          w.join(g, Seq("b"), "left_outer")
            .select($"b",
              expr(s"CAST(w - ($eta * (COALESCE(g, 0) DIV $nDocs)) " +
                "DIV 1000000 AS DECIMAL(38,0))").as("w")),
          eager = true)
        Staging.release(w)
        w = wNext
      }
      w
    }

    def auc(scored: DataFrame): Long = {
      val g = scored.groupBy($"sm")
        .agg(sum(when($"y" > 0, 1L).otherwise(0L)).as("pos"),
          sum(when($"y" > 0, 0L).otherwise(1L)).as("neg"))
      graft.queries.Extras94.aucTail(g).collect()(0)
        .getAs[Long]("auc_ppm")
    }

    for (eta <- Seq(16L, 64L, 256L, 1024L); rounds <- Seq(4, 8)) {
      val w = train(eta, rounds)
      val scored = feat.join(broadcast(w), "b")
        .groupBy($"doc_id", $"y")
        .agg(expr("CAST(SUM(w * x) DIV 1000000 AS BIGINT)").as("z"))
        .select($"y", expr("z DIV 1000").as("sm"))
      println(s"[probe] eta=$eta rounds=$rounds auc_ppm=${auc(scored)}")
      Staging.release(w)
    }

    // heuristic baseline (q281's score) over the same doc population
    val hs = docs
      .select($"doc_id", $"lang", $"text", TextOps.tokens($"text").as("tk"))
      .filter(size($"tk") > 0)
      .select(when($"lang" === "en", lit(1L)).otherwise(lit(0L)).as("y"),
        graft.queries.Extras94.scoreMilli.as("sm"))
    println(s"[probe] heuristic auc_ppm=${auc(hs)}")
    spark.stop()
  }
}
