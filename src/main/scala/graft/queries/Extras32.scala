package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Thirty-second coverage wave: deterministic corpus splitting — the
  * train/val/test assignment and reproducible shuffle order every
  * training-data pipeline needs downstream of curation. Both are
  * content-hash driven (TextOps.hashMod, md5-parity with the DuckDB
  * oracle), so the assignment is a pure function of the document text:
  * stable across runs, machines, and repartitionings, and immune to
  * input file order — the property that makes a 100 TB split auditable.
  */
object Extras32 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)

  // 80/10/10 by hash range over [0, P): integer bounds computed the same
  // way in both engines so the CASE arms can never disagree
  private val TrainBound = TextOps.P * 8 / 10
  private val ValBound = TextOps.P * 9 / 10

  val all: Seq[Qry] = Seq(

    // ---- deterministic train/val/test split + shuffle-order heads ------
    // Assignment: hash(text) range-partitioned 80/10/10. Output: per-split
    // volume plus the first 5 documents of each split in shuffle order
    // (ORDER BY hash, doc_id — the reproducible "epoch order"). Scale
    // shape: the heads ride Spark's rank-limit pushdown (WindowGroupLimit
    // keeps a partial top-5 per input partition BEFORE the 3-key
    // exchange), and the 3-row count table broadcasts back onto them —
    // the full corpus is never sorted or skew-collected.
    Qry(
      "q150_corpus_split",
      s"""WITH s AS (SELECT doc_id,
         |    ${TextOps.oracleHashSql("text")} AS h FROM documents),
         |sp AS (SELECT doc_id, h,
         |    CASE WHEN h < $TrainBound THEN 'train'
         |         WHEN h < $ValBound THEN 'val'
         |         ELSE 'test' END AS split FROM s),
         |c AS (SELECT split, COUNT(*) AS n_split FROM sp GROUP BY split),
         |r AS (SELECT split, doc_id, h,
         |    row_number() OVER (PARTITION BY split
         |      ORDER BY h, doc_id) AS rn FROM sp)
         |SELECT r.split, rn, doc_id, h, n_split
         |FROM r JOIN c ON r.split = c.split WHERE rn <= 5""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val sp = t(spark, dir).documents
        .select($"doc_id", TextOps.hashMod($"text").as("h"))
        .withColumn("split",
          when($"h" < TrainBound, "train")
            .when($"h" < ValBound, "val")
            .otherwise("test"))
      val counts = sp.groupBy($"split").agg(count(lit(1)).as("n_split"))
      val heads = sp
        .withColumn("rn", row_number().over(
          Window.partitionBy($"split").orderBy($"h", $"doc_id")))
        .filter($"rn" <= 5)
      heads.join(broadcast(counts), "split")
        .select($"split", $"rn", $"doc_id", $"h", $"n_split")
    })
}
