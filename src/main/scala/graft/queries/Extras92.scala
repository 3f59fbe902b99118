package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps
import graft.sources.Tables

/** Ninety-second coverage wave: HLL set intersection by register merge
  * and the partition-layout pruning advisor.
  *
  *  - q276: HLL intersection — the capability plain HLL lacks: sketches
  *    union losslessly (register max-merge) but cannot intersect, so
  *    the estimate is inclusion-exclusion est(A) + est(B) − est(A∪B),
  *    and A∪B's registers are MERGED FROM THE PER-SOURCE REGISTERS
  *    (full-join + greatest), never recomputed from rows — the
  *    distributed-merge property that lets 1000 shards intersect their
  *    source vocabularies by shipping 512 bytes each. Estimator
  *    arithmetic is Extras63's verbatim (same M/rho/K constants — one
  *    source of truth, no drift); the audit joins the exact
  *    intersection per source pair with signed error (inclusion-
  *    exclusion CAN undershoot — the audit shows it, unlike the pure
  *    union estimate whose bias is one-sided).
  *  - q277: partition-layout pruning advisor — the "would laying this
  *    table out by month make my scans cheaper?" question answered
  *    from data: chunks of ~4096 rows get (min, max) date fences in
  *    BOTH layouts (current = arrival order via dense o_orderkey DIV;
  *    proposed = partition-by-month, row-numbered within month only —
  *    no global sort, no unpartitioned window anywhere), and every
  *    monthly range predicate counts the chunks it cannot prune.
  *    saved_ppm per predicate is the number a table owner reads before
  *    paying for the rewrite. Scale shape: two corpus-sized passes
  *    (chunk assignment + fence aggregate); the fence tables are
  *    chunk-counted, the predicate join is fences x 12.
  */
object Extras92 {

  private val one = lit(1)
  /** q277 chunk size (a parquet row-group stand-in). */
  private val Chunk = 4096

  val all: Seq[Qry] = Seq(

    // ---- HLL intersection via register merge -------------------------------
    Qry(
      "q276_hll_intersect", {
        val rho = Extras63.rhoSql(
          s"((h // ${Extras63.M}) % ${1L << Extras63.RhoBits})")
        val est = (src: String) =>
          s"""SELECT grp, CAST(floor(${Extras63.KSql} / (zi0 +
             |    (${Extras63.M} - regs_used) *
             |    CAST(${1L << Extras63.RhoMax} AS BIGINT))) AS BIGINT)
             |    AS est_milli
             |  FROM (SELECT grp, COUNT(*) AS regs_used,
             |      SUM(1 << (${Extras63.RhoMax} - r)) AS zi0
             |    FROM $src GROUP BY 1)""".stripMargin
        s"""WITH ${TextOps.oracleToksCte},
           |${TextOps.oracleSh3Cte},
           |td AS (SELECT DISTINCT d.source AS grp, sh.h
           |  FROM sh JOIN documents d USING (doc_id)),
           |regs AS (SELECT grp, h % ${Extras63.M} AS idx,
           |    MAX($rho) AS r FROM td GROUP BY 1, 2),
           |fin AS (${est("regs")}),
           |pairs AS (SELECT a.grp AS sa, b.grp AS sb
           |  FROM (SELECT DISTINCT grp FROM td) a
           |  JOIN (SELECT DISTINCT grp FROM td) b ON a.grp < b.grp),
           |uregs AS (SELECT p.sa || '|' || p.sb AS grp, r.idx,
           |    MAX(r.r) AS r
           |  FROM pairs p JOIN regs r ON r.grp IN (p.sa, p.sb)
           |  GROUP BY 1, 2),
           |ufin AS (${est("uregs")}),
           |ex AS (SELECT a.grp AS sa, b.grp AS sb,
           |    CAST(COUNT(*) AS BIGINT) AS exact_inter
           |  FROM td a JOIN td b ON a.h = b.h AND a.grp < b.grp
           |  GROUP BY 1, 2)
           |SELECT p.sa, p.sb, fa.est_milli AS est_a, fb.est_milli AS est_b,
           |  fu.est_milli AS est_union,
           |  fa.est_milli + fb.est_milli - fu.est_milli AS inter_milli,
           |  COALESCE(ex.exact_inter, 0) AS exact_inter,
           |  CASE WHEN COALESCE(ex.exact_inter, 0) = 0 THEN NULL
           |    ELSE CAST(abs(fa.est_milli + fb.est_milli - fu.est_milli
           |        - 1000 * ex.exact_inter) * 1000000
           |      // (1000 * ex.exact_inter) AS BIGINT) END AS err_ppm
           |FROM pairs p
           |  JOIN fin fa ON fa.grp = p.sa
           |  JOIN fin fb ON fb.grp = p.sb
           |  JOIN ufin fu ON fu.grp = p.sa || '|' || p.sb
           |  LEFT JOIN ex ON ex.sa = p.sa AND ex.sb = p.sb""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val td = graft.operators.Dedup.shingleHashes(
        Tables(spark, dir).documents, "doc_id", "text",
        carry = Seq("source"))
        .select($"source".as("grp"), $"h").distinct()
      val regs = td
        .select($"grp", ($"h" % Extras63.M).as("idx"),
          expr(Extras63.rhoSql(
            s"((h div ${Extras63.M}) % ${1L << Extras63.RhoBits})"))
            .as("rho"))
        .groupBy($"grp", $"idx").agg(max($"rho").as("r"))
      def est(df: org.apache.spark.sql.DataFrame) = df
        .groupBy($"grp")
        .agg(count(one).as("regs_used"),
          sum(expr(s"shiftleft(CAST(1 AS BIGINT)," +
            s" ${Extras63.RhoMax} - r)")).as("zi0"))
        .select($"grp", expr(
          s"CAST(floor(${Extras63.KSql} / (zi0 + (${Extras63.M} -" +
            s" regs_used) * CAST(${1L << Extras63.RhoMax} AS BIGINT)))" +
            " AS BIGINT)").as("est_milli"))
      val fin = est(regs)
      val srcs = td.select($"grp").distinct()
      val pairs = srcs.select($"grp".as("sa"))
        .join(srcs.select($"grp".as("sb")), $"sa" < $"sb")
      // union registers MERGED from the per-source registers: the
      // 512-cells-per-shard merge, not a recompute from rows
      val uregs = pairs.join(regs,
          $"grp" === $"sa" || $"grp" === $"sb")
        .groupBy(concat($"sa", lit("|"), $"sb").as("grp"), $"idx")
        .agg(max($"r").as("r"))
      val ufin = est(uregs)
        .select($"grp".as("ugrp"), $"est_milli".as("est_union"))
      val ex = td.select($"grp".as("ga"), $"h")
        .join(td.select($"grp".as("gb"), $"h".as("h2")),
          $"h" === $"h2" && $"ga" < $"gb")
        .groupBy($"ga", $"gb").agg(count(one).as("exact_inter"))
      pairs
        .join(fin.select($"grp".as("fga"), $"est_milli".as("est_a")),
          $"sa" === $"fga")
        .join(fin.select($"grp".as("fgb"), $"est_milli".as("est_b")),
          $"sb" === $"fgb")
        .join(ufin, concat($"sa", lit("|"), $"sb") === $"ugrp")
        .join(ex, $"sa" === $"ga" && $"sb" === $"gb", "left")
        .select($"sa", $"sb", $"est_a", $"est_b", $"est_union",
          ($"est_a" + $"est_b" - $"est_union").as("inter_milli"),
          coalesce($"exact_inter", lit(0L)).as("exact_inter"),
          when(coalesce($"exact_inter", lit(0L)) === 0, lit(null))
            .otherwise(expr(
              "CAST(abs(est_a + est_b - est_union - 1000 * exact_inter)" +
                " * 1000000 DIV (1000 * exact_inter) AS BIGINT)"))
            .as("err_ppm"))
    },

    // ---- partition-layout pruning advisor ----------------------------------
    Qry(
      "q277_layout_advisor",
      s"""WITH o AS (SELECT o_orderkey AS ok,
         |    CAST(o_orderdate AS DATE) AS d,
         |    date_trunc('month', CAST(o_orderdate AS DATE)) AS mo
         |  FROM orders),
         |cur AS (SELECT ok // $Chunk AS chunk, MIN(d) AS lo, MAX(d) AS hi
         |        FROM o GROUP BY 1),
         |mrn AS (SELECT mo, d, row_number() OVER (PARTITION BY mo
         |    ORDER BY d, ok) AS rn FROM o),
         |prt AS (SELECT mo, (rn - 1) // $Chunk AS sub,
         |    MIN(d) AS lo, MAX(d) AS hi FROM mrn GROUP BY 1, 2),
         |months AS (SELECT DISTINCT mo FROM o),
         |hits AS (SELECT m.mo,
         |    (SELECT COUNT(*) FROM cur
         |      WHERE cur.hi >= m.mo
         |        AND cur.lo < m.mo + INTERVAL 1 MONTH) AS hit_cur,
         |    (SELECT COUNT(*) FROM prt
         |      WHERE prt.hi >= m.mo
         |        AND prt.lo < m.mo + INTERVAL 1 MONTH) AS hit_part,
         |    (SELECT COUNT(*) FROM cur) AS n_cur,
         |    (SELECT COUNT(*) FROM prt) AS n_part
         |  FROM months m)
         |SELECT CAST(mo AS DATE) AS month,
         |  CAST(n_cur AS BIGINT) AS n_chunks_cur,
         |  CAST(n_part AS BIGINT) AS n_chunks_part,
         |  CAST(hit_cur AS BIGINT) AS hit_cur,
         |  CAST(hit_part AS BIGINT) AS hit_part,
         |  CASE WHEN hit_cur = 0 THEN 0
         |    ELSE 1000000 * (hit_cur - hit_part) // hit_cur END
         |    AS saved_ppm
         |FROM hits""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val o = Tables(spark, dir).orders
        .select($"o_orderkey".as("ok"), $"o_orderdate".cast("date").as("d"),
          date_trunc("month", $"o_orderdate").cast("date").as("mo"))
      val cur = o.groupBy(expr(s"ok DIV $Chunk").as("chunk"))
        .agg(min($"d").as("lo"), max($"d").as("hi"))
      // proposed layout: partition by month, chunk within month — a
      // per-month window (bounded), NEVER a global sort
      val wM = org.apache.spark.sql.expressions.Window
        .partitionBy($"mo").orderBy($"d", $"ok")
      val prt = o.withColumn("rn", row_number().over(wM))
        .groupBy($"mo".as("pmo"), expr(s"(rn - 1) DIV $Chunk").as("sub"))
        .agg(min($"d").as("lo"), max($"d").as("hi"))
      val months = o.select($"mo").distinct()
      val nCur = cur.agg(count(one).as("n_chunks_cur"))
      val nPrt = prt.agg(count(one).as("n_chunks_part"))
      val hitCur = months.join(cur,
          $"hi" >= $"mo" && $"lo" < add_months($"mo", 1))
        .groupBy($"mo").agg(count(one).as("hit_cur"))
      val hitPrt = months.join(prt,
          $"hi" >= $"mo" && $"lo" < add_months($"mo", 1))
        .groupBy($"mo".as("mo2")).agg(count(one).as("hit_part"))
      months.join(hitCur, Seq("mo"), "left")
        .join(hitPrt, $"mo" === $"mo2", "left")
        .crossJoin(broadcast(nCur)).crossJoin(broadcast(nPrt))
        .select($"mo".as("month"), $"n_chunks_cur", $"n_chunks_part",
          coalesce($"hit_cur", lit(0L)).as("hit_cur"),
          coalesce($"hit_part", lit(0L)).as("hit_part"),
          when(coalesce($"hit_cur", lit(0L)) === 0, 0L)
            .otherwise(expr(
              "1000000 * (hit_cur - hit_part) DIV hit_cur"))
            .as("saved_ppm"))
    }
  )
}
