package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Hundred-thirty-fifth coverage wave: the round's two newest audits
  * as CONTINUOUS monitors — closing the batch/stream symmetry the
  * catalog maintains for every audit family (q245→q248, q313→q314,
  * q316→q325, q331→q332).
  *
  *  - q347: per-source KS drift attribution as a stream — the
  *    (source, length, count) table is a complete-mode streaming
  *    aggregation over the documents stream; the margin-algebra KS
  *    tail (grids, cumulative CDFs, argmax per source) runs post-sink
  *    over the domain-bounded counts through q346's tail function and
  *    oracle text verbatim.
  *
  *  - q348: the Benford first-digit audit as a stream — per-digit
  *    counts are the streaming aggregation (state: ≤ 9 rows); the
  *    spine join and deviation tail run post-sink against q327's
  *    oracle verbatim. The fraud monitor shape: the digit histogram
  *    stays current per micro-batch, conformity is re-derived from
  *    nine registers.
  */
object Extras135 {

  val all: Seq[Qry] = Seq(

    Qry("q347_stream_source_ks", Extras134.PerSourceKsOracle) {
      (spark, dir) =>
      import spark.implicits._
      val counts = Streams.fileStream(spark, dir, "documents")
        .groupBy($"source", $"n_chars".as("val"))
        .agg(count(lit(1)).as("c"))
      Extras134.ksTail(Streams.runToMemory(counts, "complete"))
    },

    Qry("q348_stream_benford", Extras124.BenfordOracle) { (spark, dir) =>
      import spark.implicits._
      val counts = Streams.fileStream(spark, dir, "orders")
        .select(Extras124.firstDigit.as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("obs"))
      Extras124.benfordTail(Streams.runToMemory(counts, "complete"))
    }
  )
}
