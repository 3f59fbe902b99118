package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Twenty-fourth coverage wave: run-length analytics over event
  * sequences. */
object Extras24 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- run-length encoding of per-user event-type sequences ----------
    // RLE as windows: a run starts where the type differs from its lag;
    // run ids are the running sum of starts; run lengths fall out of one
    // aggregate. Sequence position (ms, event_id) is a total order, all
    // arithmetic is integral, and the whole thing is two windows + two
    // aggregates on ONE user_id shuffle — the streak/compression
    // analytics shape (longest streak, mean run length).
    Qry(
      "q135_type_runs",
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_id FROM events),
        |f AS (SELECT user_id, event_type, ms, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS st
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |r AS (SELECT user_id, event_type,
        |    SUM(st) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM f),
        |runs AS (SELECT user_id, rid, COUNT(*) AS len
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_runs,
        |  CAST(MAX(len) AS BIGINT) AS longest_run,
        |  CAST(SUM(len) AS BIGINT) AS n_events
        |FROM runs GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir).events
        .select($"user_id", $"event_type", unix_millis($"ts").as("ms"),
          $"event_id")
        .withColumn("st",
          when(lag($"event_type", 1).over(w).isNull ||
            lag($"event_type", 1).over(w) =!= $"event_type", 1)
            .otherwise(0))
        .withColumn("rid", sum($"st").over(wRun))
        .groupBy($"user_id", $"rid")
        .agg(count(one).as("len"))
        .groupBy($"user_id")
        .agg(count(one).as("n_runs"), max($"len").as("longest_run"),
          sum($"len").as("n_events"))
    }
  )
}
