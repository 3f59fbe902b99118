package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{QDigest, Staging}
import graft.sources.Tables

/** Hundred-seventh coverage wave: the q-digest compression sweep —
  * (size, error) measured across thresholds, the q257-nprobe-curve
  * pattern applied to the quantile sketch.
  *
  *  - q301: q287's per-returnflag digest built at K ∈ {6, 48, 384}
  *    (threshold t = n/K — the sketch's one knob) in ONE compression
  *    chain: K rides as a group column, so the same ten window passes
  *    produce all three digests per flag and the quantile extraction
  *    emits per (flag, K, pct): digest size in nodes, the estimate,
  *    its exact rank error, and the theoretical bound check. The
  *    output IS the tuning table a deployment reads before fixing K —
  *    small K = a handful of nodes but rank error up to 2·levels·t,
  *    large K = near-exact at ~K·levels nodes — measured in-engine,
  *    not assumed from the paper's O(K·log U) claim. Scale shape
  *    identical to q287 (the sweep multiplies only the
  *    groups×2^levels-bounded compression frames by |Ks|, never the
  *    corpus): one corpus-sized leaf-count aggregate feeds everything.
  */
object Extras107 {

  private val one = lit(1)
  private val Levels = 10
  private val Nleaf = 1L << Levels
  private val CellW = 16384L
  private val Ks = Seq(6L, 48L, 384L)
  private val Pcts = Seq(50, 90, 99)

  private val bucketExpr =
    s"least(CAST(round(l_extendedprice * 100) AS BIGINT) DIV $CellW, " +
      s"${Nleaf - 1})"

  val all: Seq[Qry] = Seq(

    Qry(
      "q301_qdigest_sweep", {
        val (extCtes, extSel) = QDigest.oracleQuantileParts(
          "dig", "lfk", Seq("g", "kk"), Levels, CellW, Pcts)
        val kRows = Ks.map(k => s"($k)").mkString(", ")
        s"""WITH src AS (SELECT l_returnflag AS g,
           |    LEAST(CAST(round(l_extendedprice * 100) AS BIGINT)
           |      // $CellW, ${Nleaf - 1}) AS bucket
           |  FROM lineitem),
           |lf AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS lcnt
           |       FROM src GROUP BY 1, 2),
           |ks(kk) AS (VALUES $kRows),
           |lfk AS (SELECT g, CAST(kk AS BIGINT) AS kk, bucket, lcnt
           |        FROM lf, ks),
           |nt AS (SELECT g, kk, GREATEST(CAST(SUM(lcnt) AS BIGINT) // kk,
           |         CAST(1 AS BIGINT)) AS t FROM lfk GROUP BY 1, 2),
           |d$Levels AS (SELECT l.g, l.kk, $Nleaf + bucket AS node,
           |    $Levels AS lv, lcnt AS cnt, t
           |  FROM lfk l JOIN nt USING (g, kk)),
           |${QDigest.oracleCompressCtes(s"d$Levels", "dig", Levels,
              Seq("g", "kk"))},
           |$extCtes
           |$extSel""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val src = Tables(spark, dir).lineitem.select(
        $"l_returnflag".as("g"), expr(bucketExpr).as("bucket"))
      val leaf = Staging.stage(src.groupBy($"g", $"bucket")
        .agg(count(one).as("lcnt")), eager = false)
      // K as a group column: one compress chain sweeps all thresholds
      val lfk = leaf.crossJoin(broadcast(Ks.toDF("kk")))
      val nt = lfk.groupBy($"g", $"kk").agg(
        expr("greatest(CAST(sum(lcnt) AS BIGINT) DIV kk, " +
          "CAST(1 AS BIGINT))").as("t"))
      val dK = lfk.join(nt, Seq("g", "kk")).select($"g", $"kk",
        (lit(Nleaf) + $"bucket").as("node"), lit(Levels).as("lv"),
        $"lcnt".as("cnt"), $"t")
      val dig = QDigest.compress(dK, Seq("g", "kk"), Levels)
      QDigest.quantiles(dig, lfk, Seq("g", "kk"), Levels, CellW, Pcts)
    }
  )
}
