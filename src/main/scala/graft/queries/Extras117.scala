package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.operators.TextOps
import graft.sources.Tables

/** Hundred-seventeenth coverage wave: entity resolution — dual-key
  * blocking + edit-distance matching, the record-linkage primitive
  * (Fellegi–Sunter blocking applied the way fuzzy-dedup pipelines
  * actually run it: candidate generation by cheap equi-joins, then the
  * expensive distance only inside blocks).
  *
  *  - q315: titles (first five tokens of each English document) are
  *    deterministically corrupted — ONE character deleted at a
  *    hash-chosen position — and resolved back against the clean
  *    title registry. Candidate generation is the union of TWO
  *    blocking passes: equal prefix-4 OR equal suffix-4. For a single
  *    deletion on a string of length ≥ 9 at least one of the two keys
  *    is provably unchanged (the deletion is either past the prefix or
  *    before the suffix), so dual-key blocking guarantees 100% recall
  *    while examining ~5% of the registry per probe — the lesson
  *    single-pass blocking misses. Within blocks, Levenshtein ≤ 1
  *    scores survivors; best match = min (distance, candidate id).
  *    Output: per-probe match, distance, candidates examined,
  *    entity-correctness (matched TITLE equals the probe's clean
  *    title — identical-title twins are the same entity), plus the
  *    corpus accuracy in ppm (exact integer division). The synthesis
  *    is self-validating: accuracy_ppm = 10^6 is part of the gated
  *    result, so a recall hole in either blocking pass fails the gate.
  *
  * Scale shape: two hash-partitioned equi-joins on block keys — never
  * an all-pairs product; Levenshtein runs only inside blocks. Natural-
  * language prefixes skew (many titles share "the …"), so a production
  * deployment adds the df-cap discipline of
  * [[graft.operators.Dedup.jaccardPairs]] on block keys; at fixture
  * scale the max block is 26 of 218 registry rows. ASCII-only titles
  * keep Levenshtein engine-portable (byte = character = codepoint in
  * both engines).
  */
object Extras117 {

  /** Oracle text shared VERBATIM with the streaming twin q319
    * (Extras120): the stream replays the same corpus once, so batch
    * and stream must produce the same resolved table. */
  private[queries] val ErOracle =
    s"""WITH toks AS (SELECT doc_id, lang,
         |  list_filter(string_split_regex(lower(text),
         |    '${TextOps.TokenReDuck}'), t -> len(t) > 0) AS tk
         |  FROM documents),
         |ent AS (SELECT doc_id, array_to_string(tk[1:5], ' ') AS t
         |  FROM toks
         |  WHERE lang = 'en' AND len(array_to_string(tk[1:5], ' ')) >= 9
         |    AND regexp_matches(array_to_string(tk[1:5], ' '),
         |                       '^[a-z0-9 ]+$$')),
         |dirty AS (SELECT doc_id, t,
         |    CAST(${TextOps.oracleHashSql("t")} % length(t) + 1 AS INT)
         |      AS pos FROM ent),
         |dd AS (SELECT doc_id, t, substring(t, 1, pos - 1)
         |    || substring(t, pos + 1, length(t)) AS d FROM dirty),
         |cand AS (SELECT d.doc_id, c.doc_id AS cid, d.d, c.t AS ct,
         |    d.t AS own
         |  FROM dd d JOIN ent c
         |    ON substring(d.d, 1, 4) = substring(c.t, 1, 4)
         |  UNION
         |  SELECT d.doc_id, c.doc_id, d.d, c.t, d.t
         |  FROM dd d JOIN ent c ON right(d.d, 4) = right(c.t, 4)),
         |scored AS (SELECT doc_id, cid,
         |    CAST(levenshtein(d, ct) AS BIGINT) AS dist, ct, own,
         |    COUNT(*) OVER (PARTITION BY doc_id) AS n_cand FROM cand),
         |best AS (SELECT doc_id, cid AS matched_doc, dist, n_cand,
         |    CASE WHEN ct = own THEN 1 ELSE 0 END AS correct,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY dist, cid)
         |      AS rn
         |  FROM scored WHERE dist <= 1)
         |SELECT doc_id, matched_doc, dist, CAST(n_cand AS BIGINT)
         |    AS n_cand, correct,
         |  CAST((1000000 * SUM(correct) OVER ()) // COUNT(*) OVER ()
         |    AS BIGINT) AS accuracy_ppm
         |FROM best WHERE rn = 1""".stripMargin

  /** Clean-title entity registry: (doc_id, t) — ASCII titles of length
    * ≥ 9 from the first five tokens of every English document. Shared
    * with the streaming twin q319. */
  private[queries] def entities(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val title = concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5))
    docs.filter(col("lang") === "en")
      .select(col("doc_id"), title.as("t"))
      .filter(length(col("t")) >= 9 && col("t").rlike("^[a-z0-9 ]+$"))
  }

  /** Deterministically corrupted probes: (doc_id, d, own) — one
    * character deleted at a hash-chosen position. */
  private[queries] def dirtyProbes(ent: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ent.withColumn("pos",
        (TextOps.hashMod(col("t")) % length(col("t")) + 1)
          .cast(IntegerType))
      .select(col("doc_id"),
        expr("substring(t, 1, pos - 1) || " +
          "substring(t, pos + 1, length(t))").as("d"),
        col("t").as("own"))

  val all: Seq[Qry] = Seq(

    Qry("q315_entity_resolution", ErOracle) { (spark, dir) =>
      import spark.implicits._
      val ent = entities(Tables(spark, dir).documents)
      val probe = dirtyProbes(ent)
      val reg = ent.select($"doc_id".as("cid"), $"t".as("ct"))
      val cand = probe.join(reg,
          substring($"d", 1, 4) === substring($"ct", 1, 4))
        .unionByName(probe.join(reg, expr("right(d, 4) = right(ct, 4)")))
        .distinct()
      val wCand = Window.partitionBy($"doc_id")
      val wBest = Window.partitionBy($"doc_id").orderBy($"dist", $"cid")
      // accuracy tail: a SCALAR aggregate crossJoin(broadcast(...))-ed
      // back onto the per-probe rows — NEVER an unpartitioned window
      // over the corpus-sized matched table, which would move every
      // probe row through one task at 100 TB (r12 verdict; q318's own
      // tot/est pattern 30 lines away in Extras120). The best table is
      // staged once: both the output rows and the accuracy scalar read
      // it, and unstaged the candidate joins + windows would run twice.
      val best = graft.operators.Staging.stage(
        cand
          .select($"doc_id", $"cid",
            levenshtein($"d", $"ct").cast(LongType).as("dist"),
            $"ct", $"own")
          .withColumn("n_cand", count(lit(1)).over(wCand))
          .filter($"dist" <= 1)
          .withColumn("correct",
            when($"ct" === $"own", 1).otherwise(0))
          .withColumn("rn", row_number().over(wBest))
          .filter($"rn" === 1),
        eager = false)
      val acc = best.agg(
        expr("CAST((1000000 * SUM(correct)) DIV COUNT(*) AS BIGINT)")
          .as("accuracy_ppm"))
      best.crossJoin(broadcast(acc))
        .select($"doc_id", $"cid".as("matched_doc"), $"dist",
          $"n_cand".cast(LongType).as("n_cand"), $"correct",
          $"accuracy_ppm")
    }
  )
}
