package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.operators.TextOps
import graft.sources.Tables

/** Hundred-thirtieth coverage wave: degree assortativity and the
  * source-redundancy map.
  *
  *  - q338: degree assortativity of the trade graph — the Pearson
  *    correlation of endpoint degrees across edges (Newman 2002), the
  *    "do hubs trade with hubs" mixing signal completing the graph
  *    profile's STRUCTURAL row (degree → coreness → clustering →
  *    assortativity). Pearson needs a square root, so the query
  *    reports the exact rational pieces instead: the sign of the
  *    covariance numerator and r² in ppm —
  *    10⁶·(mΣxy−ΣxΣy)²/((mΣx²−(Σx)²)·(mΣy²−(Σy)²)) — the moments
  *    accumulate exactly in DECIMAL(38,0) (they square past int64);
  *    the final ratio's numerator exceeds 38 digits at sf0.1 edge
  *    counts, so it alone converts to double (q342's device: one
  *    correctly-rounded conversion per operand, identical in both
  *    engines — caught by the bench's sf0.1 run, not the sf0.01
  *    gate). On
  *    the bipartite trade graph this reads customer-degree vs
  *    supplier-degree mixing.
  *
  *  - q339: pairwise source similarity — each source's top-20 tokens
  *    by exact (count, token) ranking, then Jaccard over the 190
  *    source pairs: 10⁶·|A∩B| DIV (|A|+|B|−|A∩B|). The corpus
  *    redundancy map ("which crawls duplicate each other") that
  *    decides deduplication ORDER in a multi-source pipeline. The
  *    corpus collapses map-side to (source, token) counts; ranking
  *    and the pair join run on the sources×20 sliver.
  */
object Extras130 {

  private val TopK = 20

  val all: Seq[Qry] = Seq(

    Qry(
      "q338_degree_assortativity",
      """WITH b AS (SELECT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT CAST(2 * c AS BIGINT) AS src,
        |    CAST(2 * s + 1 AS BIGINT) AS dst FROM b
        |  UNION ALL SELECT CAST(2 * s + 1 AS BIGINT),
        |    CAST(2 * c AS BIGINT) FROM b),
        |d AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS deg
        |  FROM e GROUP BY 1),
        |ed AS (SELECT dx.deg AS x, dy.deg AS y FROM e
        |  JOIN d dx ON dx.node = e.src JOIN d dy ON dy.node = e.dst),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(x) AS sx,
        |    SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
        |    SUM(y * y) AS syy FROM ed)
        |SELECT CAST(m AS BIGINT) AS n_edges,
        |  CAST(CASE WHEN m * sxy - sx * sy > 0 THEN 1
        |    WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INTEGER)
        |    AS sign,
        |  CAST(round(1000000 * (CAST(m * sxy - sx * sy AS DOUBLE)
        |      * CAST(m * sxy - sx * sy AS DOUBLE))
        |    / (CAST(m * sxx - sx * sx AS DOUBLE)
        |      * CAST(m * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS r2_ppm
        |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = Extras115.tradeEdges(spark, dir)
      val d = e.groupBy($"src".as("node"))
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("deg"))
      val ed = e
        .join(d.select($"node".as("nx"), $"deg".as("x")), $"src" === $"nx")
        .join(d.select($"node".as("ny"), $"deg".as("y")), $"dst" === $"ny")
      ed.agg(count(lit(1)).cast(DecimalType(38, 0)).as("m"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          sum(expr("y * y")).as("syy"))
        .select($"m".cast(LongType).as("n_edges"),
          expr("CAST(CASE WHEN m * sxy - sx * sy > 0 THEN 1 " +
            "WHEN m * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INT)")
            .as("sign"),
          expr("CAST(round(1000000 * (CAST(m * sxy - sx * sy " +
            "AS DOUBLE) * CAST(m * sxy - sx * sy AS DOUBLE)) " +
            "/ (CAST(m * sxx - sx * sx AS DOUBLE) " +
            "* CAST(m * syy - sy * sy AS DOUBLE))) AS BIGINT)")
            .as("r2_ppm"))
    },

    Qry(
      "q339_source_similarity",
      s"""WITH toks AS (SELECT source,
         |  unnest(list_filter(string_split_regex(lower(text),
         |    '${TextOps.TokenReDuck}'), t -> len(t) > 0)) AS t
         |  FROM documents),
         |cnt AS (SELECT source, t, COUNT(*) AS c FROM toks
         |        GROUP BY 1, 2),
         |top AS (SELECT source, t FROM (SELECT source, t,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY c DESC, t) AS rn FROM cnt) WHERE rn <= $TopK),
         |sz AS (SELECT source, COUNT(*) AS k FROM top GROUP BY 1),
         |inter AS (SELECT a.source AS src_a, b.source AS src_b,
         |    COUNT(*) AS shared
         |  FROM top a JOIN top b ON a.t = b.t AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.src_a, i.src_b, CAST(i.shared AS BIGINT) AS shared,
         |  CAST((1000000 * i.shared)
         |    // (za.k + zb.k - i.shared) AS BIGINT) AS jaccard_ppm
         |FROM inter i JOIN sz za ON za.source = i.src_a
         |JOIN sz zb ON zb.source = i.src_b""".stripMargin) {
      (spark, dir) =>
      import spark.implicits._
      val cnt = Tables(spark, dir).documents
        .select($"source", explode(TextOps.tokens($"text")).as("t"))
        .groupBy($"source", $"t").agg(count(lit(1)).as("c"))
      val top = cnt
        .withColumn("rn", row_number().over(
          Window.partitionBy($"source").orderBy($"c".desc, $"t")))
        .filter($"rn" <= TopK).select($"source", $"t")
      val sz = top.groupBy($"source").agg(count(lit(1)).as("k"))
      val inter = top.as("a")
        .join(top.select($"source".as("sb"), $"t".as("tb")),
          $"t" === $"tb" && $"source" < $"sb")
        .groupBy($"source".as("src_a"), $"sb".as("src_b"))
        .agg(count(lit(1)).as("shared"))
      inter
        .join(broadcast(sz.select($"source".as("za"), $"k".as("ka"))),
          $"src_a" === $"za")
        .join(broadcast(sz.select($"source".as("zb"), $"k".as("kb"))),
          $"src_b" === $"zb")
        .select($"src_a", $"src_b", $"shared".cast(LongType).as("shared"),
          expr("CAST((1000000 * shared) DIV (ka + kb - shared) " +
            "AS BIGINT)").as("jaccard_ppm"))
    }
  )
}
