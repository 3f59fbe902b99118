package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Sixty-eighth coverage wave: the shuffle advising itself.
  *
  *  - q229: join-key SKEW advisor — the third self-advising query
  *    (q204 plans compaction, q224 picks encodings, this one sizes
  *    salt). A deterministic hot key is synthesized (every 5th event
  *    lands on key 0, ~20% of the table — the classic null-key /
  *    default-value hotspot), then the advisor computes what a salted
  *    repartition needs to know BEFORE shuffling 100 TB: per-key
  *    frequencies, the p99 frequency as the "healthy partition" yard-
  *    stick, each top key's corpus share, and the salt factor
  *    ceil(freq / p99) (capped 32) that splits the hot key into
  *    average-sized slices. Everything is integer arithmetic over ONE
  *    frequency aggregate + one tiny top-k window — the stats pass is
  *    strictly cheaper than the join it protects, which is the whole
  *    point of running it first.
  */
object Extras68 {

  private val TopK = 5
  private val SaltCap = 32

  val all: Seq[Qry] = Seq(

    Qry(
      "q229_skew_advisor",
      s"""WITH e AS (SELECT CASE WHEN event_id % 5 = 0 THEN 0
         |    ELSE user_id END AS key
         |  FROM events),
         |f AS (SELECT key, COUNT(*) AS freq FROM e GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_keys,
         |    CAST(SUM(freq) AS BIGINT) AS n FROM f),
         |p AS (SELECT freq AS p99_freq, row_number() OVER (
         |      ORDER BY freq, key) AS rn
         |  FROM f QUALIFY rn = CAST(ceil(0.99 * (SELECT n_keys FROM tot))
         |    AS BIGINT)),
         |top AS (SELECT key, freq, row_number() OVER (
         |      ORDER BY freq DESC, key) AS rank
         |  FROM f QUALIFY rank <= $TopK)
         |SELECT t.rank, CAST(t.key AS BIGINT) AS key,
         |  CAST(t.freq AS BIGINT) AS freq,
         |  CAST(t.freq * 1000000 // tot.n AS BIGINT) AS share_ppm,
         |  CAST(p.p99_freq AS BIGINT) AS p99_freq,
         |  CAST(least((t.freq + p.p99_freq - 1) // p.p99_freq, $SaltCap)
         |    AS BIGINT) AS salt
         |FROM top t CROSS JOIN p CROSS JOIN tot""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val f = Tables(spark, dir).events
        .select(when($"event_id" % 5 === 0, 0L)
          .otherwise($"user_id").as("key"))
        .groupBy($"key").agg(count(lit(1)).as("freq"))
      val fs = graft.operators.Staging.stage(f, eager = false)
      val tot = fs.agg(count(lit(1)).as("n_keys"),
        sum($"freq").cast(LongType).as("n"))
      // p99 by exact rank over the KEY table (tiny after the aggregate)
      val ranked = fs.withColumn("rn",
        row_number().over(Window.orderBy($"freq", $"key")))
      val p99 = ranked.crossJoin(broadcast(tot))
        .filter($"rn" === ceil(lit(0.99) * $"n_keys").cast(LongType))
        .select($"freq".as("p99_freq"))
      val top = fs.withColumn("rank",
        row_number().over(Window.orderBy($"freq".desc, $"key")))
        .filter($"rank" <= TopK)
      top.crossJoin(broadcast(p99)).crossJoin(broadcast(tot))
        .select($"rank".cast(LongType).as("rank"),
          $"key".cast(LongType).as("key"),
          $"freq".cast(LongType).as("freq"),
          expr("freq * 1000000 div n").cast(LongType).as("share_ppm"),
          $"p99_freq".cast(LongType).as("p99_freq"),
          least(expr("(freq + p99_freq - 1) div p99_freq"), lit(SaltCap))
            .cast(LongType).as("salt"))
    }
  )
}
