package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: print Spark-side values for cross-engine parity checks
  * (md5-prefix hash, regex split, regexp counts, fold hash). Compared
  * against DuckDB by tools/probe_parity.py. Not part of the library.
  */
object ProbeParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      "The quick brown fox, jumps! Over 2 lazy dogs.",
      "  leading and trailing  ",
      "punct... only!!!",
      "Der schnelle braune Fuchs springt über den faulen Hund",
      "你好世界 this has cjk 汉字",
      "a",
      "").toDF("text")
    val out = docs.select(
      $"text",
      conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("h60"),
      split(lower($"text"), "[^a-z0-9一-鿿]+").as("toks"),
      size(split(lower($"text"), "[^a-z0-9一-鿿]+")).as("n_toks_raw"),
      size(filter(split(lower($"text"), "[^a-z0-9一-鿿]+"),
        t => length(t) > 0)).as("n_toks"),
      size(regexp_extract_all($"text", lit("[0-9]"), lit(0))).as("n_digit"),
      size(regexp_extract_all($"text", lit("[.,!?;:]"), lit(0))).as("n_punct"),
      size(regexp_extract_all(lower($"text"),
        lit("\\b(the|and|of|to|in|is|a)\\b"), lit(0))).as("n_stop_en"),
      size(regexp_extract_all($"text", lit("[一-鿿]"), lit(0)))
        .as("n_cjk"),
      aggregate(
        filter(split(lower($"text"), "[^a-z0-9一-鿿]+"),
          t => length(t) > 0),
        lit(0L),
        (acc, tok) => pmod(
          acc * 31 + pmod(conv(substring(md5(tok), 1, 15), 16, 10)
            .cast("long"), lit(2147483647L)),
          lit(2147483647L))).as("fold_hash"))
    out.collect().foreach { r =>
      println("PROBE\t" + (0 until r.length).map(i =>
        String.valueOf(r.get(i)).replace("\t", " ")).mkString("\t"))
    }
    // negative-operand integer division: Spark's DIV truncates toward
    // zero; probe_parity.py asserts DuckDB's // does the same
    val neg = spark.sql(
      "SELECT -7 DIV 2, 7 DIV -2, -7 DIV -2, -1 DIV 3, 1 DIV -3").head()
    println("PROBE_NEG_INTDIV\t" + (0 until neg.length)
      .map(i => String.valueOf(neg.get(i))).mkString("\t"))
    spark.stop()
  }
}
