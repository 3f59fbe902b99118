package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.Tables
import graft.streaming.Streams

/** Hundred-sixteenth coverage wave: corpus-composition independence
  * audit — the exact chi-square statistic over the source × lang
  * contingency table, batch + streaming twin.
  *
  *  - q313: Pearson's chi-square test of independence between a
  *    document's source and its language — the "is my corpus mix
  *    shifting by provenance" audit every multi-crawl training
  *    pipeline runs before blending. Per cell of the FULL grid
  *    (including structurally-possible-but-empty cells, which
  *    contribute their whole expectation): observed count, expected
  *    count (ppm), the cell's chi-square contribution (ppm), plus the
  *    grid-constant total statistic, degrees of freedom and Cramér's
  *    V² (ppm) — every OPERAND exact integer arithmetic
  *    (DECIMAL(38,0) / HUGEINT: d = O·N − R·C and N·R·C are exact),
  *    with the one final cell ratio 10⁶·d²/(N·R·C) computed through
  *    the q342 device — one correctly-rounded decimal→double
  *    conversion per operand, then IEEE division and round, identical
  *    in both engines. (The all-integral DIV form needs ~10⁶·N⁴
  *    headroom and silently NULLs past DECIMAL(38,0) once N > ~4·10⁷
  *    rows — the r12 advisory; the device keeps the statistic
  *    overflow-free at any corpus size.)
  *
  *  - q314: the same audit as a STREAMING monitor (q245/q248's
  *    proof shape): the (source, lang) count table is a complete-mode
  *    streaming aggregation over the documents stream; the chi-square
  *    tail — margins, full grid, exact cell statistics — runs
  *    post-sink over the grid-bounded counts, through the SAME tail
  *    function and against the SAME oracle text as q313, so a
  *    batch/stream divergence anywhere in the statistic is in-gate.
  *
  * Scale shape: the only corpus-sized stage is the (source, lang)
  * count groupBy (map-side partial agg). Margins, the grid cross join
  * (broadcast, dims-bounded) and the windowed total all run over the
  * r×c cell table — thousands of rows when sources×languages, never
  * corpus rows. The streaming twin's state is the same bounded grid.
  */
object Extras116 {

  private val one = lit(1)
  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(38, 0))

  /** Oracle text shared VERBATIM by q313 (batch) and q314 (stream). */
  private val ChiSquareOracle =
    """WITH o AS (SELECT source, lang, CAST(COUNT(*) AS HUGEINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, SUM(o) AS r FROM o GROUP BY 1),
      |c AS (SELECT lang, SUM(o) AS c FROM o GROUP BY 1),
      |n AS (SELECT SUM(o) AS n FROM o),
      |cell0 AS (SELECT r.source, c.lang, COALESCE(o.o, 0) AS o,
      |    r.r, c.c, n.n,
      |    (1000000 * r.r * c.c) // n.n AS e_ppm,
      |    COALESCE(o.o, 0) * n.n - r.r * c.c AS d
      |  FROM r CROSS JOIN c CROSS JOIN n
      |  LEFT JOIN o ON o.source = r.source AND o.lang = c.lang),
      |cell AS (SELECT source, lang, o, e_ppm, n,
      |    CAST(round((1000000 * (CAST(d AS DOUBLE) * CAST(d AS DOUBLE)))
      |      / CAST(n * r * c AS DOUBLE)) AS BIGINT) AS cell_chi2_ppm
      |  FROM cell0),
      |tot AS (SELECT SUM(cell_chi2_ppm) AS t,
      |    (COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1)
      |      AS dof,
      |    LEAST(COUNT(DISTINCT source), COUNT(DISTINCT lang)) - 1 AS mind,
      |    MAX(n) AS n FROM cell)
      |SELECT cell.source, cell.lang, CAST(cell.o AS BIGINT) AS o,
      |  CAST(cell.e_ppm AS BIGINT) AS e_ppm,
      |  CAST(cell.cell_chi2_ppm AS BIGINT) AS cell_chi2_ppm,
      |  CAST(tot.t AS BIGINT) AS total_chi2_ppm,
      |  CAST(tot.dof AS BIGINT) AS dof,
      |  CAST(tot.t // (tot.n * tot.mind) AS BIGINT) AS v2_ppm
      |FROM cell CROSS JOIN tot""".stripMargin

  /** Chi-square tail over a (source, lang, o) count table — margins,
    * full grid (empty cells included), exact integral statistics.
    * Shared verbatim between q313 and the streaming twin q314. */
  private[graft] def chiSquareTail(counts: DataFrame): DataFrame = {
    val r = counts.groupBy(col("source")).agg(sum(col("o")).as("r"))
    val c = counts.groupBy(col("lang")).agg(sum(col("o")).as("c"))
    val n = counts.agg(sum(col("o")).as("n"))
    // full grid: dims-bounded cross join (sources × languages), every
    // side broadcast; empty cells carry o = 0 and contribute e
    val cell = r.crossJoin(broadcast(c)).crossJoin(broadcast(n))
      .join(counts.withColumnRenamed("o", "obs"), Seq("source", "lang"),
        "left_outer")
      .select(col("source"), col("lang"),
        coalesce(col("obs"), lit(0L)).cast(LongType).as("o"),
        dec(col("r")).as("r"), dec(col("c")).as("c"), dec(col("n")).as("n"))
      .withColumn("d", dec(col("o")) * col("n") - col("r") * col("c"))
      // final cell ratio via the q342 device: d and n·r·c stay
      // DECIMAL(38,0)-exact; ONE correctly-rounded conversion of each
      // to double (engine-identical), then an IEEE division — the
      // integral 10⁶·d² DIV (n·r·c) form would overflow 38 digits
      // (silent NULL under non-ANSI decimal overflow) once the corpus
      // count N passes ~4·10⁷ rows (r12 advisory)
      .select(col("source"), col("lang"), col("o"),
        expr("CAST((1000000 * r * c) DIV n AS BIGINT)").as("e_ppm"),
        expr("CAST(round((1000000 * (CAST(d AS DOUBLE) " +
          "* CAST(d AS DOUBLE))) / CAST(n * r * c AS DOUBLE)) " +
          "AS BIGINT)").as("cell_chi2_ppm"),
        col("n"))
    // grid-constant totals: one tiny window over the bounded cell table
    val w = Window.partitionBy()
    cell
      .withColumn("total_chi2_ppm",
        sum(col("cell_chi2_ppm")).over(w).cast(LongType))
      .withColumn("dof",
        ((size(collect_set(col("source")).over(w)) - 1) *
          (size(collect_set(col("lang")).over(w)) - 1)).cast(LongType))
      .withColumn("mind",
        least(size(collect_set(col("source")).over(w)),
          size(collect_set(col("lang")).over(w))) - 1)
      .withColumn("v2_ppm",
        expr("CAST(CAST(total_chi2_ppm AS DECIMAL(38,0)) " +
          "DIV (n * CAST(mind AS DECIMAL(38,0))) AS BIGINT)"))
      .select(col("source"), col("lang"), col("o"), col("e_ppm"),
        col("cell_chi2_ppm"), col("total_chi2_ppm"), col("dof"),
        col("v2_ppm"))
  }

  val all: Seq[Qry] = Seq(

    Qry("q313_chi_square_independence", ChiSquareOracle) { (spark, dir) =>
      import spark.implicits._
      chiSquareTail(
        Tables(spark, dir).documents
          .groupBy($"source", $"lang")
          .agg(count(one).cast(LongType).as("o")))
    },

    Qry("q314_stream_chi_square", ChiSquareOracle) { (spark, dir) =>
      import spark.implicits._
      val counts = Streams.fileStream(spark, dir, "documents")
        .groupBy($"source", $"lang")
        .agg(count(one).cast(LongType).as("o"))
      chiSquareTail(Streams.runToMemory(counts, "complete"))
    }
  )
}
