package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q-digest: the mergeable quantile sketch (Shrivastava, Buragohain,
  * Agrawal, Suri — "Medians and Beyond", SenSys 2004), completing the
  * engine's mergeable-sketch family (CMS q125/q268, HLL q220/q276,
  * Bloom q218, MinHash q156, KMV q285/q286) with the one member the
  * reference's own core analytic needs: percentiles
  * (`/root/reference/src/tests/integration_test.rs:359-364` prints a
  * P50/P95/P99 latency report; at 100 TB that report must come from
  * bounded mergeable state, not an exact sort).
  *
  * Why q-digest and not t-digest/KLL: construction here is
  * ORDER-INDEPENDENT — the digest is a pure function of the leaf-count
  * histogram and the threshold `t`, so the DuckDB oracle rebuilds the
  * sketch bit-for-bit from the same counts (the q125 CMS proof shape);
  * t-digest/KLL depend on insertion order / random coins and could only
  * be gated rows-only. The price is a bounded integer value domain
  * (2^levels buckets over a fixed range), which for money/latency
  * columns is a quantization the deployment already accepts.
  *
  * Structure: heap-numbered complete binary tree over a 2^L-leaf bucket
  * domain — node v at level lv occupies ids [2^lv, 2^(lv+1)); leaves sit
  * at level L (id = 2^L + bucket, covering bucket range [lo, hi] of
  * width 2^(L-lv)). The digest is a set of (node, cnt) entries.
  *
  * Compression rule (the single definition all three implementations —
  * DataFrame, local/streaming, oracle SQL — mirror): for level l from L
  * down to 1, group each parent p at level l-1 with its children at
  * level l; let w = child counts + parent count; if w <= t the children
  * collapse into p (p.cnt = w), else all rows stay. Every interior node
  * is therefore CREATED with cnt <= t, which is what bounds rank error:
  * the ancestors straddling any query point hold <= levels·t mass.
  *
  * Bounds: |digest| <= O(K·levels) nodes for t = n/K (each surviving
  * group witnesses > t mass); rank error of a quantile answer is at most
  * cnt(chosen) + 2·levels·t (prefix mass is exact; straddling/tied
  * ancestors are interior nodes <= t each, <= 2·levels of them). Both
  * are asserted in-gate (`bound_ok`) and in QDigestSpec.
  *
  * Merge = add counts node-wise, re-compress with the same t —
  * associative over shards; the streaming twin's per-key state IS the
  * compressed digest (q289).
  *
  * Scale shape: the ONLY corpus-sized stage is the leaf-count groupBy
  * (map-side partial aggregation); every compression pass is a window
  * over <= groups × 2^levels rows, and at 100 TB per-shard digests merge
  * with one tiny shuffle instead of re-scanning anything.
  */
object QDigest {

  /** One bottom-up compression pass for level `l` over a digest frame
    * with columns (gCols..., node, lv, cnt, t). Children at level l grab
    * grp = parent id; the parent row (level l-1) and any pass-through
    * row keep grp = node — parent and children share one window group,
    * everything else is a singleton. A merged group keeps exactly its
    * rn=1 row, rewritten to the parent. */
  private def pass(d: DataFrame, gCols: Seq[String], l: Int): DataFrame = {
    val pow = 1L << l
    val half = 1L << (l - 1)
    val d2 = d.withColumn("grp",
      when(col("node") >= pow && col("node") < 2 * pow,
        expr("node DIV 2")).otherwise(col("node")))
    val part = Window.partitionBy((gCols :+ "grp").map(col): _*)
    val d3 = d2
      .withColumn("w", sum("cnt").over(part))
      .withColumn("rn", row_number().over(part.orderBy("node")))
    val merged = col("grp") >= half && col("grp") < pow &&
      col("w") <= col("t")
    d3.filter(!merged || col("rn") === 1)
      .select(gCols.map(col) ++ Seq(
        when(merged, col("grp")).otherwise(col("node")).as("node"),
        when(merged, lit(l - 1)).otherwise(col("lv")).as("lv"),
        when(merged, col("w")).otherwise(col("cnt")).as("cnt"),
        col("t")): _*)
  }

  /** Compress a (gCols..., node, lv, cnt, t) frame bottom-up through all
    * `levels` passes. Input rows may sit at any mix of levels (leaf
    * histograms, or a digest unioned with new leaves for a merge) as
    * long as node ids are distinct per group — sum duplicates first. */
  def compress(d: DataFrame, gCols: Seq[String], levels: Int): DataFrame = {
    // one hash(gCols) exchange up front: every per-level window below
    // partitions by (gCols, grp_level), and hash(gCols) satisfies that
    // clustering (subset rule) — without it EnsureRequirements inserts
    // a fresh exchange per level because grp changes with the level,
    // so a `levels`-deep compress paid `levels` shuffles of the digest
    // instead of one. Per-group digest size is O(K·levels), so the
    // coarser keying never concentrates more than a digest per task.
    val d0 = if (gCols.nonEmpty) d.repartition(gCols.map(col): _*) else d
    (levels to 1 by -1).foldLeft(d0)((acc, l) => pass(acc, gCols, l))
  }

  /** The same compression as [[compress]], over an in-memory entry list
    * — the streaming state path (a per-key digest is O(K·levels)
    * entries, so local work per key per batch is trivial). Entries are
    * (node, lv, cnt) with distinct node ids (callers sum duplicates
    * when merging). Deterministic: group membership and the merge test
    * depend only on ids and counts, never on input order. */
  def compressLocal(entries: Seq[(Long, Int, Long)], t: Long,
      levels: Int): Seq[(Long, Int, Long)] = {
    val m = scala.collection.mutable.LongMap[(Int, Long)]()
    entries.foreach { case (node, lv, cnt) => m(node) = (lv, cnt) }
    var l = levels
    while (l >= 1) {
      val pow = 1L << l
      // children at level l, grouped by parent
      val byParent = m.keysIterator
        .filter(v => v >= pow && v < 2 * pow).toArray.groupBy(_ / 2)
      byParent.foreach { case (p, kids) =>
        val w = kids.map(m(_)._2).sum + m.get(p).map(_._2).getOrElse(0L)
        if (w <= t) {
          kids.foreach(m.remove)
          m(p) = (l - 1, w)
        }
      }
      l -= 1
    }
    m.iterator.map { case (node, (lv, cnt)) => (node, lv, cnt) }.toSeq
  }

  /** Quantile extraction: for each group and each pct in `pcts`, walk
    * the digest in (hi asc, lo desc, node asc) order — narrowest node
    * first among ties, so everything sorted after the answer is a
    * straddling interior ancestor (<= t each) — and report the first
    * node whose cumulative mass reaches target = ceil(pct·n/100).
    * `leaf` (gCols..., bucket, lcnt) is the AUDIT side: rank_le counts
    * the true mass at or below the answer, and bound_ok pins
    * 0 <= rank_le − target <= cnt_chosen + 2·levels·t. */
  def quantiles(digest: DataFrame, leaf: DataFrame, gCols: Seq[String],
      levels: Int, cellW: Long, pcts: Seq[Int]): DataFrame = {
    val spark = digest.sparkSession
    import spark.implicits._
    val nleaf = 1L << levels
    val gc = gCols.map(col)
    val partG = Window.partitionBy(gc: _*)
    val span = expr(s"shiftleft(CAST(1 AS BIGINT), $levels - lv)")
    val d = digest
      .withColumn("lo", col("node") * span - nleaf)
      .withColumn("hi", col("node") * span - nleaf + span - 1)
      .withColumn("n", sum("cnt").over(partG))
      .withColumn("digest_nodes", count(lit(1)).over(partG))
      .withColumn("cum", sum("cnt").over(
        partG.orderBy(col("hi"), col("lo").desc, col("node"))))
    val est = d.crossJoin(broadcast(pcts.toDF("pct")))
      .withColumn("target", expr("(pct * n + 99) DIV 100"))
      .filter(col("cum") >= col("target"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(gc :+ col("pct"): _*)
          .orderBy(col("hi"), col("lo").desc, col("node"))))
      .filter(col("rk") === 1)
      .select(gc ++ Seq(col("pct"), col("hi").as("est_hi"),
        col("cnt").as("cnt_chosen"), col("target"), col("t"),
        col("digest_nodes")): _*)
    // leaf and est share lineage (est derives from the digest built on
    // leaf) — re-alias BOTH sides to fresh ids, and carry est's payload
    // through the rank aggregation (it is functionally determined by
    // (g, pct)) instead of joining back, so no self-join ever forms
    val lf = leaf.select(gCols.map(c => col(c).as(s"__l_$c")) ++
      Seq(col("bucket").as("__l_bucket"), col("lcnt")): _*)
    val estR = est.select(gCols.map(c => col(c).as(s"__e_$c")) ++ Seq(
      col("pct").as("__e_pct"), col("est_hi").as("__e_hi"),
      col("cnt_chosen").as("__e_cc"), col("target").as("__e_tg"),
      col("t").as("__e_t"), col("digest_nodes").as("__e_dn")): _*)
    val cond = gCols.map(c => col(s"__l_$c") === col(s"__e_$c"))
      .reduce(_ && _) && col("__l_bucket") <= col("__e_hi")
    lf.join(broadcast(estR), cond)
      .groupBy((gCols.map(c => col(s"__e_$c")) :+ col("__e_pct")): _*)
      .agg(sum("lcnt").as("rank_le"), max("__e_hi").as("est_hi"),
        max("__e_cc").as("cnt_chosen"), max("__e_tg").as("target"),
        max("__e_t").as("t"), max("__e_dn").as("digest_nodes"))
      .select(gCols.map(c => col(s"__e_$c").as(c)) ++ Seq(
        col("__e_pct").as("pct"),
        ((col("est_hi") + 1) * cellW - 1).as("est_cents"),
        col("rank_le"), col("target"),
        (col("rank_le") - col("target")).as("rank_err"),
        (col("rank_le") >= col("target") &&
          col("rank_le") - col("target") <=
            col("cnt_chosen") + lit(2L * levels) * col("t"))
          .as("bound_ok"),
        col("digest_nodes")): _*)
  }

  // ---- oracle SQL generators ------------------------------------------
  // One template per stage, mirroring the DataFrame code structurally so
  // the two sides cannot drift (the TextOps.oracleToksCte discipline).

  /** CTE text for one compression pass: `outName` from `inName`.
    * `gSql` = group-key column names carried through. */
  def oraclePassCte(inName: String, outName: String, l: Int,
      gSql: Seq[String]): String = {
    val pow = 1L << l
    val half = 1L << (l - 1)
    val g = gSql.mkString(", ")
    s"""$outName AS (
       |  SELECT $g,
       |    CASE WHEN mrg THEN grp ELSE node END AS node,
       |    CASE WHEN mrg THEN ${l - 1} ELSE lv END AS lv,
       |    CAST(CASE WHEN mrg THEN w ELSE cnt END AS BIGINT) AS cnt, t
       |  FROM (
       |    SELECT $g, node, lv, cnt, t, grp, w,
       |      ROW_NUMBER() OVER (PARTITION BY $g, grp ORDER BY node) AS rn,
       |      (grp >= $half AND grp < $pow AND w <= t) AS mrg
       |    FROM (
       |      SELECT $g, node, lv, cnt, t, grp,
       |        SUM(cnt) OVER (PARTITION BY $g, grp) AS w
       |      FROM (
       |        SELECT $g, node, lv, cnt, t,
       |          CASE WHEN node >= $pow AND node < ${2 * pow}
       |               THEN node // 2 ELSE node END AS grp
       |        FROM $inName)))
       |  WHERE NOT mrg OR rn = 1)""".stripMargin
  }

  /** The full chain of compression CTEs from `inName` (a frame at any
    * level mix, e.g. the leaf histogram `d$levels`) down to `outName`. */
  def oracleCompressCtes(inName: String, outName: String, levels: Int,
      gSql: Seq[String]): String = {
    val steps = (levels to 1 by -1).map { l =>
      val in = if (l == levels) inName else s"${outName}_l$l"
      val out = if (l == 1) outName else s"${outName}_l${l - 1}"
      oraclePassCte(in, out, l, gSql)
    }
    steps.mkString(",\n")
  }

  /** Quantile-extraction CTEs + final SELECT over digest CTE `dig` and
    * leaf CTE `lf` (columns gSql..., bucket, lcnt), mirroring
    * [[quantiles]]. `tag` namespaces the CTE names so two extractions
    * can coexist in one statement (q288). Returns (ctes, finalSelect);
    * `est<tag>` exposes per-(g, pct) columns est_hi/target/... for
    * callers that join extractions side-by-side. */
  def oracleQuantileParts(dig: String, lf: String, gSql: Seq[String],
      levels: Int, cellW: Long, pcts: Seq[Int], tag: String = "")
      : (String, String) = {
    val nleaf = 1L << levels
    val g = gSql.mkString(", ")
    val pctRows = pcts.map(p => s"($p)").mkString(", ")
    val ctes =
      s"""geo$tag AS (
         |  SELECT $g, node, lv, cnt, t,
         |    node * (CAST(1 AS BIGINT) << ($levels - lv)) - $nleaf AS lo,
         |    node * (CAST(1 AS BIGINT) << ($levels - lv)) - $nleaf
         |      + (CAST(1 AS BIGINT) << ($levels - lv)) - 1 AS hi,
         |    SUM(cnt) OVER (PARTITION BY $g) AS n,
         |    COUNT(*) OVER (PARTITION BY $g) AS digest_nodes
         |  FROM $dig),
         |cum$tag AS (
         |  SELECT *, SUM(cnt) OVER (PARTITION BY $g
         |    ORDER BY hi ASC, lo DESC, node ASC) AS cum
         |  FROM geo$tag),
         |est$tag AS (
         |  SELECT $g, pct, est_hi, cnt_chosen, target, t, digest_nodes
         |  FROM (
         |    SELECT $g, pct, hi AS est_hi, cnt AS cnt_chosen, target, t,
         |      digest_nodes,
         |      ROW_NUMBER() OVER (PARTITION BY $g, pct
         |        ORDER BY hi, lo DESC, node) AS rk
         |    FROM (
         |      SELECT c.*, p.pct,
         |        CAST((p.pct * c.n + 99) // 100 AS BIGINT) AS target
         |      FROM cum$tag c
         |      CROSS JOIN (SELECT * FROM (VALUES $pctRows) AS v(pct)) p)
         |    WHERE cum >= target)
         |  WHERE rk = 1),
         |rank$tag AS (
         |  SELECT ${gSql.map(c => s"e.$c").mkString(", ")}, e.pct,
         |    CAST(SUM(l.lcnt) AS BIGINT) AS rank_le
         |  FROM $lf l JOIN est$tag e
         |    ON ${gSql.map(c => s"l.$c = e.$c").mkString(" AND ")}
         |      AND l.bucket <= e.est_hi
         |  GROUP BY ${gSql.map(c => s"e.$c").mkString(", ")}, e.pct)"""
        .stripMargin
    val sel =
      s"""SELECT ${gSql.map(c => s"e.$c").mkString(", ")}, e.pct,
         |  (e.est_hi + 1) * $cellW - 1 AS est_cents,
         |  r.rank_le, e.target,
         |  r.rank_le - e.target AS rank_err,
         |  CAST(r.rank_le >= e.target AND
         |    r.rank_le - e.target <= e.cnt_chosen + ${2L * levels} * e.t
         |    AS BOOLEAN) AS bound_ok,
         |  e.digest_nodes
         |FROM est$tag e JOIN rank$tag r
         |  ON ${gSql.map(c => s"r.$c = e.$c").mkString(" AND ")}
         |    AND r.pct = e.pct""".stripMargin
    (ctes, sel)
  }
}
