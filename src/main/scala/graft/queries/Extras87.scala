package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables
import graft.streaming.Streams

/** Eighty-seventh coverage wave: DSIR-style importance weighting and
  * the seasonal-decomposition streaming twin.
  *
  *  - q266: data selection via importance resampling weights (the
  *    DSIR shape): hashed token features (B=64 buckets), target
  *    distribution = the English slice, raw distribution = the whole
  *    corpus, per-doc weight = sum over token occurrences of
  *    log(p_target(bucket) / p_raw(bucket)) with add-one smoothing.
  *    The two lns are floored to integer ppm SEPARATELY (declared
  *    order) and everything after is exact integer arithmetic — the
  *    Unigram convention: the only float op is the row-local ln,
  *    IEEE-identical across engines. Scale shape: one corpus-sized
  *    explode + (doc, bucket) partial aggregate; both distribution
  *    tables are 64 rows derived from that frame; the log-ratio table
  *    joins back as a broadcast; the per-doc sum is the second and
  *    last shuffle. At 100 TB this is the standing recipe for "make
  *    the pretraining mix look like the target domain" — weights are
  *    a pure function of corpus + target slice, no model in the loop.
  *  - q267: q264's seasonal decomposition as a STREAMING aggregation —
  *    events arrive as a file stream, the hourly cents table is a
  *    complete-mode streaming groupBy (one stateful operator), and the
  *    trend/seasonal/remainder tail runs post-sink over the bounded
  *    (type x hour) series. Shares q264's oracle text VERBATIM (the
  *    q192/q193/q248 pattern).
  */
object Extras87 {

  private val one = lit(1)
  /** Hashed-feature buckets. */
  private val B = 64
  /** Target-domain slice. */
  private val TargetLang = "en"

  val all: Seq[Qry] = Seq(

    // ---- DSIR importance weights ------------------------------------------
    Qry(
      "q266_dsir_weights",
      s"""WITH ${TextOps.oracleToksCte},
         |tf AS (SELECT doc_id, lang,
         |    ${TextOps.oracleHashSql("t")} % $B AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, lang, unnest(tk) AS t FROM toks)
         |  GROUP BY 1, 2, 3),
         |tgt AS (SELECT b, SUM(c) AS n FROM tf
         |        WHERE lang = '$TargetLang' GROUP BY 1),
         |raw AS (SELECT b, SUM(c) AS n FROM tf GROUP BY 1),
         |tt AS (SELECT SUM(n) AS t FROM tgt),
         |rt AS (SELECT SUM(n) AS t FROM raw),
         |lp AS (SELECT r.b,
         |    CAST(floor(1000000.0 * ln((COALESCE(g.n, 0) + 1.0)
         |        / (tt.t + $B.0))) AS BIGINT)
         |  - CAST(floor(1000000.0 * ln((r.n + 1.0)
         |        / (rt.t + $B.0))) AS BIGINT) AS lppm
         |  FROM raw r LEFT JOIN tgt g ON r.b = g.b, tt, rt)
         |SELECT f.doc_id, CAST(SUM(f.c) AS BIGINT) AS n_toks,
         |  CAST(SUM(f.c * lp.lppm) AS BIGINT) AS w_ppm
         |FROM tf f JOIN lp ON f.b = lp.b
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tf = Tables(spark, dir).documents
        .select($"doc_id", $"lang",
          explode(TextOps.tokens($"text")).as("t"))
        .groupBy($"doc_id", $"lang",
          (TextOps.md5Long($"t") % lit(TextOps.P) % B).as("b"))
        .agg(count(one).cast(LongType).as("c"))
      val tgt = tf.filter($"lang" === TargetLang)
        .groupBy($"b".as("gb")).agg(sum($"c").as("gn"))
      val raw = tf.groupBy($"b".as("rb")).agg(sum($"c").as("rn"))
      val tt = tgt.agg(sum($"gn").as("ttot"))
      val rt = raw.agg(sum($"rn").as("rtot"))
      // B-row log-ratio table: both lns floored SEPARATELY to ppm
      // (the declared order the oracle spells identically)
      val lp = raw.join(tgt, $"rb" === $"gb", "left")
        .crossJoin(broadcast(tt)).crossJoin(broadcast(rt))
        .select($"rb",
          (floor(lit(1000000.0) *
            log((coalesce($"gn", lit(0L)) + 1.0) / ($"ttot" + lit(B.toDouble))))
            .cast(LongType) -
          floor(lit(1000000.0) *
            log(($"rn" + 1.0) / ($"rtot" + lit(B.toDouble))))
            .cast(LongType)).as("lppm"))
      tf.join(broadcast(lp), $"b" === $"rb")
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_toks"),
          sum($"c" * $"lppm").as("w_ppm"))
    },

    // ---- seasonal decomposition under Structured Streaming ----------------
    Qry("q267_stream_seasonal", Extras86.SeasonalOracle) { (spark, dir) =>
      import spark.implicits._
      val h = Streams.fileStream(spark, dir, "events")
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
        .agg((sum($"value".cast(graft.Exact.Money)) * 100)
          .cast(LongType).as("vsum_c"))
      // hourly cents table = the streaming aggregation; the
      // decomposition tail runs post-sink over the bounded series
      Extras86.seasonalTail(Streams.runToMemory(h, "complete"))
    }
  )
}
