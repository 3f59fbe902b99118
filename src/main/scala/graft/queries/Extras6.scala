package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Sixth coverage wave: edit-distance fuzzy matching (entity-resolution
  * dedup on identifier-like strings) and the remaining string-function
  * family. */
object Extras6 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir)
  private val one = lit(1)

  val all: Seq[Qry] = Seq(

    // ---- fuzzy matching via edit distance ------------------------------
    // Supplier ids differ only in trailing digits, so small Levenshtein
    // radii produce real candidate sets — the entity-resolution shape of
    // dedup (vs. the content-hash shapes in q32/q36-q38).
    Qry(
      "q69_fuzzy_match",
      """SELECT dist, COUNT(*) AS n_pairs
        |FROM (
        |  SELECT levenshtein(a.s_name, b.s_name) AS dist
        |  FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey)
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val s = t(spark, dir).supplier
      val a = s.select($"s_suppkey".as("ka"), $"s_name".as("na"))
      val b = s.select($"s_suppkey".as("kb"), $"s_name".as("nb"))
      a.join(b, $"ka" < $"kb")
        .select(levenshtein($"na", $"nb").as("dist"))
        .groupBy($"dist").agg(count(one).as("n_pairs"))
    },

    // ---- remaining string-function family ------------------------------
    Qry(
      "q70_string_extra",
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  reverse(p_brand) AS rev_brand,
        |  repeat(substring(p_type, 1, 2), 3) AS rep2,
        |  left(p_name, 4) AS l4,
        |  right(p_name, 3) AS r3,
        |  trim('  ' || p_brand || ' ') AS trimmed,
        |  CAST(octet_length(encode(p_name)) AS BIGINT) AS utf8_bytes,
        |  md5(p_name || '#' || p_brand) AS combo_hash
        |FROM part WHERE p_partkey % 7 = 0""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir).part
        .filter($"p_partkey" % 7 === 0)
        .select($"p_partkey",
          translate($"p_name", "aeiou", "AEIOU").as("vowels_up"),
          reverse($"p_brand").as("rev_brand"),
          repeat(substring($"p_type", 1, 2), 3).as("rep2"),
          substring($"p_name", 1, 4).as("l4"),
          expr("right(p_name, 3)").as("r3"),
          trim(concat(lit("  "), $"p_brand", lit(" "))).as("trimmed"),
          octet_length(encode($"p_name", "UTF-8")).cast(LongType)
            .as("utf8_bytes"),
          md5(concat($"p_name", lit("#"), $"p_brand")).as("combo_hash"))
    }
  )
}
