package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Exact._
import graft.operators.{ConnectedComponents, Dedup, TextOps}
import graft.sources.Tables

/** Seventh coverage wave: last-observation-carried-forward gap filling
  * (the canonical time-series fill operator, via IGNORE NULLS windows)
  * and GROUPING markers on rollups. */
object Extras7 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- LOCF gap fill + value windows ---------------------------------
    // Values < 5 are treated as missing sensor readings; `filled` carries
    // the last valid observation forward per user.
    Qry(
      "q71_fill_forward",
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value,
        |    CASE WHEN value < 5e0 THEN NULL ELSE value END AS nv
        |  FROM events)
        |SELECT user_id, event_id, value,
        |  last_value(nv IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  first_value(value) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_seen,
        |  nth_value(value, 3) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS third_value
        |FROM e""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val running = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(spark, dir).events
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          $"value", when($"value" < 5.0, lit(null)).otherwise($"value")
            .as("nv"))
        .select($"user_id", $"event_id", $"value",
          last($"nv", ignoreNulls = true).over(running).as("filled"),
          first($"value").over(running).as("first_seen"),
          nth_value($"value", 3).over(full).as("third_value"))
    },

    // ---- deterministic hash sampling (reproducible pipeline sampling) --
    // Random sampling isn't reproducible across engines/runs; hashing
    // content into [0,P) and thresholding is — the standard deterministic
    // sampling technique for training-data pipelines (same doc always
    // lands in the same split).
    Qry(
      "q75_hash_sample",
      s"""SELECT doc_id, lang,
         |  ${graft.operators.TextOps.oracleHashSql("text")} AS bucket
         |FROM documents
         |WHERE ${graft.operators.TextOps.oracleHashSql("text")}
         |  < ${TextOps.P / 10}""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).documents
        .withColumn("bucket", TextOps.hashMod($"text"))
        .filter($"bucket" < TextOps.P / 10)
        .select($"doc_id", $"lang", $"bucket")
    },

    // ---- stratified deterministic sample: fixed quota per language -----
    Qry(
      "q76_stratified_sample",
      s"""SELECT lang, doc_id, rn FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${graft.operators.TextOps.oracleHashSql("text")},
         |               doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 10""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"lang")
        .orderBy(TextOps.hashMod($"text"), $"doc_id")
      t(spark, dir).documents
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"lang", $"doc_id", $"rn")
    },

    // ---- duplicate clusters: connected components over near-dup pairs -
    Qry(
      "q74_dup_clusters",
      s"""WITH RECURSIVE ${graft.operators.TextOps.oracleToksCte},
         |${graft.operators.TextOps.oracleSh3Cte},
         |${graft.operators.TextOps.oracleShCappedCte(
             graft.operators.Dedup.DefaultDfCap)},
         |szn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY doc_id) AS n, h
         |        FROM shc),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared,
         |    MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM szn a JOIN szn b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |edges0 AS (SELECT da, db FROM pairs
         |           WHERE CAST(shared AS DOUBLE)/(na+nb-shared) >= 0.5e0),
         |edges AS (SELECT da AS a, db AS b FROM edges0
         |          UNION SELECT db, da FROM edges0),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
         |SELECT src AS member, MIN(dst) AS component
         |FROM reach GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val pairs = Dedup.jaccardPairs(
          Dedup.shingleHashes(t(spark, dir).documents, "doc_id", "text"),
          "doc_id")
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b")
      ConnectedComponents.minLabel(pairs, "id_a", "id_b")
        .select($"id".as("member"), $"component")
    },

    // ---- GROUPING markers on rollup ------------------------------------
    Qry(
      "q72_grouping_id",
      s"""SELECT r_name, n_name,
         |  CAST(GROUPING(r_name) AS INTEGER) AS gr,
         |  CAST(GROUPING(n_name) AS INTEGER) AS gn,
         |  COUNT(*) AS n, ${dsumSql("c_acctbal")} AS tot
         |FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tb = t(spark, dir)
      tb.customer
        .join(broadcast(tb.nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(tb.region), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(grouping($"r_name").cast(IntegerType).as("gr"),
          grouping($"n_name").cast(IntegerType).as("gn"),
          count(one).as("n"), dsum($"c_acctbal").as("tot"))
        .select($"r_name", $"n_name", $"gr", $"gn", $"n", $"tot")
    }
  )
}
