package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Seventieth coverage wave: mixture design + shard topology.
  *
  *  - q232: temperature-sampled mixture weights (the mT5/XLM-R
  *    pretraining recipe): per-source sampling weight ∝ tokens^0.5,
  *    normalized to ppm, then an epoch budget split and the implied
  *    per-source upsample factor. α = 0.5 deliberately: sqrt is
  *    CORRECTLY ROUNDED under IEEE-754 in both engines, so
  *    floor(sqrt(·)) is bit-deterministic where pow(x, 0.7)'s libm
  *    would not be (the same class of trap the HLL finalize hit —
  *    designed around this time, not discovered).
  *  - q233: shard-count change impact — mod-hash vs rendezvous (HRW)
  *    assignment when a corpus regrows from 8 to 12 shards. Both
  *    assignments are pure integer hashing (HRW argmax packs
  *    (score mod 2^55)·16 + shard into one BIGINT so max() IS the
  *    argmax, tie-broken deterministically); the output carries each
  *    scheme's moved-document ppm — the ~11/12 vs ~1/3 story that
  *    decides how a 100 TB corpus re-shards without re-reading
  *    everything.
  */
object Extras70 {

  private val EpochBudget = 1000000L // tokens per epoch to allocate
  private val OldShards = 8
  private val NewShards = 12

  /** Packed HRW score for shard i of hash column h: md5 of "h:i"
    * reduced to 55 bits, shard in the low 4. One structural template,
    * two hex→BIGINT spellings (Spark's conv(); DuckDB's '0x' || cast —
    * the same md5-prefix value either way, as everywhere in TextOps). */
  private def hrwWith(md5Long: String => String)(h: String, i: Int): String =
    s"((${md5Long(s"CAST($h AS STRING) || ':$i'")} % ${1L << 55}) * 16 + $i)"
  private def hrwSpark(h: String, i: Int): String =
    hrwWith(e => s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)")(h, i)
  private def hrwDuck(h: String, i: Int): String =
    hrwWith(e => s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)")(h, i)

  val all: Seq[Qry] = Seq(

    // ---- temperature-sampled mixture weights ----------------------------
    Qry(
      "q232_mixture_weights",
      s"""WITH t AS (SELECT source,
         |    CAST(SUM(len(regexp_extract_all(text, '${TextOps.BpeTokSql}'))
         |      + 1) AS BIGINT) AS total_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, total_tokens,
         |    CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS w
         |  FROM t),
         |s AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM w)
         |SELECT source, total_tokens, w,
         |  CAST(w * 1000000 // wsum AS BIGINT) AS quota_ppm,
         |  CAST($EpochBudget * w // wsum AS BIGINT) AS epoch_tokens,
         |  CAST($EpochBudget * w * 1000 // wsum // total_tokens AS BIGINT)
         |    AS upsample_x1000
         |FROM w CROSS JOIN s""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir).documents
        .select($"source", (TextOps.bpeTokenCount($"text") + 1L).as("toks"))
        .groupBy($"source").agg(sum($"toks").as("total_tokens"))
        .withColumn("w",
          expr("CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT)"))
      val s = t.agg(sum($"w").cast(LongType).as("wsum"))
      t.crossJoin(broadcast(s))
        .select($"source", $"total_tokens".cast(LongType).as("total_tokens"),
          $"w",
          expr("w * 1000000 div wsum").cast(LongType).as("quota_ppm"),
          expr(s"$EpochBudget * w div wsum").cast(LongType)
            .as("epoch_tokens"),
          expr(s"$EpochBudget * w * 1000 div wsum div total_tokens")
            .cast(LongType).as("upsample_x1000"))
    },

    // ---- mod vs rendezvous re-sharding impact ---------------------------
    Qry(
      "q233_shard_rebalance", {
        val oldMax = (0 until OldShards).map(hrwDuck("h", _))
          .mkString("greatest(", ", ", ")")
        val newMax = (0 until NewShards).map(hrwDuck("h", _))
          .mkString("greatest(", ", ", ")")
        s"""WITH d AS (SELECT doc_id, source,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
           |  FROM documents),
           |a AS (SELECT doc_id, source,
           |    h % $OldShards AS mod_old, h % $NewShards AS mod_new,
           |    $oldMax % 16 AS hrw_old, $newMax % 16 AS hrw_new
           |  FROM d)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
           |    AS BIGINT) AS mod_moved,
           |  CAST(SUM(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END)
           |    AS BIGINT) AS hrw_moved,
           |  CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
           |    * 1000000 // COUNT(*) AS BIGINT) AS mod_moved_ppm,
           |  CAST(SUM(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END)
           |    * 1000000 // COUNT(*) AS BIGINT) AS hrw_moved_ppm
           |FROM a GROUP BY 1""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val oldMax = (0 until OldShards).map(i => expr(hrwSpark("h", i)))
        .reduce((a, b) => greatest(a, b))
      val newMax = (0 until NewShards).map(i => expr(hrwSpark("h", i)))
        .reduce((a, b) => greatest(a, b))
      Tables(spark, dir).documents
        .select($"doc_id", $"source", TextOps.md5Long($"text").as("h"))
        .select($"doc_id", $"source",
          ($"h" % OldShards).as("mod_old"), ($"h" % NewShards).as("mod_new"),
          (oldMax % 16).as("hrw_old"), (newMax % 16).as("hrw_new"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"mod_old" =!= $"mod_new", 1).otherwise(0))
            .cast(LongType).as("mod_moved"),
          sum(when($"hrw_old" =!= $"hrw_new", 1).otherwise(0))
            .cast(LongType).as("hrw_moved"),
          (sum(when($"mod_old" =!= $"mod_new", 1).otherwise(0))
            .cast(LongType) * 1000000L / count(lit(1))).cast(LongType)
            .as("mod_moved_ppm"),
          (sum(when($"hrw_old" =!= $"hrw_new", 1).otherwise(0))
            .cast(LongType) * 1000000L / count(lit(1))).cast(LongType)
            .as("hrw_moved_ppm"))
    }
  )
}
