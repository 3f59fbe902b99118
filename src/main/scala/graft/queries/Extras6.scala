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
    //
    // Candidates come from PassJoin-style segment blocking (Li et al.,
    // VLDB 2011), NOT an all-pairs product: each name is cut into 3
    // fixed 6-char segments and only pairs sharing a segment — an
    // EQUI-JOIN on (segment index, segment text) — are scored. For
    // equal-length strings, substitution distance <= 2 touches at most 2
    // of the 3 segments, so every such pair survives blocking
    // (pigeonhole); the oracle mirrors the identical blocking, so the
    // two sides agree by construction. Per-block fanout is bounded by
    // block size, never O(n²) over the table.
    Qry(
      "q69_fuzzy_match",
      """WITH seg AS (
        |  SELECT s_suppkey AS k, s_name AS nm, i AS si,
        |    substring(s_name, CAST(i*6+1 AS INTEGER), 6) AS sv
        |  FROM supplier, (SELECT unnest([0,1,2]) AS i)),
        |cand AS (
        |  SELECT DISTINCT a.k AS ka, b.k AS kb, a.nm AS na, b.nm AS nb
        |  FROM seg a JOIN seg b
        |    ON a.si = b.si AND a.sv = b.sv AND a.k < b.k)
        |SELECT levenshtein(na, nb) AS dist, COUNT(*) AS n_pairs
        |FROM cand
        |WHERE levenshtein(na, nb) <= 2
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val s = t(spark, dir).supplier
      val seg = s.select($"s_suppkey".as("k"), $"s_name".as("nm"),
          explode(array((0 until 3).map { i =>
            struct(lit(i).as("si"),
              substring($"s_name", i * 6 + 1, 6).as("sv"))
          }: _*)).as("b"))
        .select($"k", $"nm", $"b.si".as("si"), $"b.sv".as("sv"))
      val a = seg.select($"k".as("ka"), $"nm".as("na"), $"si", $"sv")
      val b = seg.select($"k".as("kb"), $"nm".as("nb"),
        $"si".as("si2"), $"sv".as("sv2"))
      a.join(b, $"si" === $"si2" && $"sv" === $"sv2" && $"ka" < $"kb")
        .select($"ka", $"kb", $"na", $"nb").distinct()
        .select(levenshtein($"na", $"nb").as("dist"))
        .filter($"dist" <= 2)
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
