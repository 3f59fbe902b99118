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
    // Candidates come from DELETION-NEIGHBORHOOD blocking (the SymSpell
    // scheme): each name emits every variant reachable by deleting <= d=2
    // characters (identity, 1-deletion, 2-deletion; duplicates collapse
    // heavily on repetitive strings). If lev(A,B) <= 2 then deleting the
    // edited positions from each side reaches a COMMON variant, so every
    // qualifying pair shares a variant key — candidate generation is an
    // EQUI-JOIN on the variant, COMPLETE for Levenshtein (subs + indels),
    // then exact levenshtein verifies. Unlike positional-segment or
    // rare-q-gram blocking — which this fixture defeats (the constant
    // "Supplier#0…" region makes those blocks span the whole table) —
    // block sizes here are bounded by how many strings are locally
    // similar (max block 271 at sf0.1), independent of corpus size: the
    // per-string variant count is O(L^d) and candidates scale with the
    // true near-pair count, not n². Assumes non-empty strings (a
    // 0-length name would make sequence(1, length) descend).
    Qry(
      "q69_fuzzy_match",
      """WITH s AS (SELECT s_suppkey AS k, s_name AS nm,
        |    len(s_name) AS L FROM supplier),
        |v AS (SELECT k, nm, unnest(list_distinct(
        |    [nm] ||
        |    list_transform(range(1, L+1),
        |      i -> substr(nm,1,i-1) || substr(nm,i+1,L)) ||
        |    flatten(list_transform(range(1, L), i ->
        |      list_transform(range(i+1, L+1), j ->
        |        substr(nm,1,i-1) || substr(nm,i+1,j-i-1)
        |          || substr(nm,j+1,L)))))) AS var
        |  FROM s),
        |cand AS (SELECT DISTINCT a.k AS ka, b.k AS kb,
        |    a.nm AS na, b.nm AS nb
        |  FROM v a JOIN v b ON a.var = b.var AND a.k < b.k)
        |SELECT levenshtein(na, nb) AS dist, COUNT(*) AS n_pairs
        |FROM cand
        |WHERE levenshtein(na, nb) <= 2
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Dedup
        .editDistancePairs(t(spark, dir).supplier,
          idCol = "s_suppkey", strCol = "s_name", maxDist = 2)
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
