package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Staging, TextOps}
import graft.sources.Tables

/** Ninety-ninth coverage wave: delta substring-grain dedup — q261's
  * asymmetric twin (the q156/q234 delta discipline applied at the
  * W-token window grain).
  *
  *  - q290: an incoming delta batch (doc_id mod 7 = 3 plays the
  *    daily crawl) probes a STANDING window-hash index built from the
  *    corpus (all other docs); any delta window whose hash is already
  *    indexed is a duplicated span, spans merge into maximal islands
  *    with q261's exact machinery (shared package-private helpers —
  *    [[Extras84.islandAgg]]/[[Extras84.keepReport]] and their oracle
  *    twins, so batch and delta grains cannot drift). The corpus NEVER
  *    self-joins: its windows are hashed once into the distinct-h
  *    index; only delta windows shuffle to probe it. Within-batch
  *    duplication is deliberately out of scope here (the index
  *    refreshes after each batch lands; q261 covers the self-dedup
  *    grain). Scale shape: at 100 TB the index is a standing artifact
  *    bucketed by h — a daily batch probes it with a shuffle of
  *    DELTA-sized windows, while re-running q261 corpus-wide would
  *    re-rank every position every day.
  */
object Extras99 {

  private val W = Extras84.W

  val all: Seq[Qry] = Seq(

    Qry(
      "q290_delta_substring_dedup",
      s"""WITH ${TextOps.oracleToksCte},
         |sz AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens
         |       FROM toks WHERE doc_id % 7 = 3),
         |${Extras84.oracleOccCtes},
         |idx AS (SELECT DISTINCT h FROM occ WHERE doc_id % 7 <> 3),
         |dup AS (SELECT doc_id, p AS s, p + $W AS e FROM occ
         |  WHERE doc_id % 7 = 3 AND h IN (SELECT h FROM idx)),
         |${Extras84.oracleIslandCtes("dup")}
         |${Extras84.oracleKeepSelect}""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // one tokenize pass feeds the index side, the delta side, and
      // the delta sizes (the q261 staging discipline)
      val toks = Staging.stage(Tables(spark, dir).documents
        .select($"doc_id", TextOps.tokens($"text").as("tk")),
        eager = false)
      val occ = Extras84.occFrame(toks)
      // the standing index: corpus windows hashed ONCE, distinct —
      // in production a bucketed-by-h table maintained across batches
      val idx = occ.filter($"doc_id" % 7 =!= 3).select($"h").distinct()
      // the probe: delta windows semi-join the index — corpus rows
      // never pair with each other
      val dup = occ.filter($"doc_id" % 7 === 3)
        .join(idx, Seq("h"), "left_semi")
        .select($"doc_id", $"p".as("s"), ($"p" + W).as("e"))
      val sz = toks.filter($"doc_id" % 7 === 3)
        .select($"doc_id", size($"tk").cast(LongType).as("n_tokens"))
      Extras84.keepReport(sz, Extras84.islandAgg(dup))
    }
  )
}
