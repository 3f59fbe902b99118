package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact.Money
import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-third coverage wave: the Poisson bootstrap as a STREAMING
  * aggregation — the eval tier's last batch-only member gets its twin.
  *
  *  - q294: q280's bootstrap confidence intervals computed from a file
  *    stream. The explode-to-B-replicas and the deterministic
  *    hash→ppm→threshold weight are row-local (map-side in the
  *    micro-batch), so the streaming aggregation's state is exactly
  *    the per-(flag, replica) pair of decimal sums — flags × B × 2
  *    cells, CONSTANT regardless of stream length (the q220/q221/q272
  *    register discipline applied to uncertainty quantification: the
  *    replica sums ARE the mergeable state). The CI rank tail and the
  *    full-sample audit run post-sink over B rows per flag. Shares
  *    q280's oracle text VERBATIM (the q281/q283 pattern), so the
  *    cross-batch accumulation path is gated against the same rows
  *    the one-shot batch query produces.
  *
  *    Scale shape: a 100 TB stream of training-eval metrics keeps B×
  *    groups decimal registers per executor-partial and merges them at
  *    the complete-mode sink; nothing downstream ever sees corpus-
  *    sized rows. The weight never stores RNG state — it is a pure
  *    function of (row identity, replica), which is what makes
  *    at-least-once replays idempotent at the aggregation.
  */
object Extras103 {

  val all: Seq[Qry] = Seq(

    Qry("q294_stream_bootstrap", Extras94.BootstrapOracle) { (spark, dir) =>
      import spark.implicits._
      // streaming side: explode each lineitem row into its B replica
      // contributions and accumulate the (flag, b) decimal registers
      val sums = Streams.fileStream(spark, dir, "lineitem")
        .select($"l_returnflag".as("flag"), $"l_orderkey",
          $"l_linenumber", $"l_extendedprice".as("px"))
        // the fixture arrives as ONE file -> one scan partition, and the
        // x B explode + per-(row, replica) md5 below happen map-side of
        // the aggregation — without this narrow shuffle the whole 19M-
        // hash stage runs on a single task (measured 34.6 s at sf0.1 vs
        // ~3 s batch); one row-sized shuffle buys full parallelism. On a
        // real multi-file stream the scan already fans out and this is a
        // cheap no-op-sized exchange. Width = the session's core count,
        // NOT the streaming scope's shuffle.partitions: runToMemory
        // narrows that to 8 for state-store sizing, which quartered
        // this CPU-bound hash stage on local[32] (the state store keeps
        // its 8; only the pre-explode exchange fans wider).
        .repartition(spark.sparkContext.defaultParallelism,
          $"l_orderkey")
        .select($"flag", $"px", $"l_orderkey", $"l_linenumber",
          explode(sequence(lit(0), lit(Extras94.B - 1))).as("b"))
        .select($"flag", $"b", $"px",
          expr(Extras94.WeightSql).as("w"))
        .groupBy($"flag", $"b")
        .agg(sum($"w" * $"px".cast(Money)).as("s"), sum($"w").as("wt"))
      // post-sink: the CI rank tail over B rows per flag, plus the
      // full-sample audit from the batch table (the audit may see the
      // corpus; the ESTIMATOR state never did)
      val full0 = Extras94.bootstrapFull0(
        Tables(spark, dir).lineitem
          .select($"l_returnflag".as("flag"),
            $"l_extendedprice".as("px")))
      Extras94.bootstrapTail(Streams.runToMemory(sums, "complete"), full0)
    }
  )
}
