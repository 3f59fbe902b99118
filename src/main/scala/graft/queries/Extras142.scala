package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact.{dsum, dsumSql}
import graft.operators.{DagLevels, Scc, Staging}
import graft.sources.Tables

/** Hundred-forty-second coverage wave: the condensation's causal
  * depth, and the row-group-layout round trip gated.
  *
  *  - q358: per-component topological depth of the trade graph's SCC
  *    condensation ([[graft.operators.DagLevels]]): lvl = longest
  *    chain of acyclic trade/return dependency feeding each
  *    mutually-cyclic group — the causality/scheduling depth question
  *    (which rings are upstream of which). Integer fixed point
  *    (levels only increase; monotone decimal-sum convergence), so
  *    the oracle unrolls 6 relaxation rounds over the same
  *    condensation CTEs as q349 — all provably no-ops past the
  *    longest path (2 levels at every tested SF). Output: one row per
  *    component with its size and depth; components outside every
  *    condensation arc sit at level 0 by definition (the relaxation's
  *    own base case).
  *
  *  - q359: the sorted/bloom row-group LAYOUT round trip gated —
  *    lineitem rewritten the way `ParquetSkippingSpec` pins skipping
  *    for (sorted by l_orderkey, 64 KB row groups,
  *    parquet.bloom.filter.enabled#l_partkey), read back through the
  *    point-lookup path, and the filtered aggregate hash-matched
  *    against the ORIGINAL table: the layout rewrite must be
  *    value-lossless while its pruning behavior is spec-pinned (scan
  *    metrics can't be oracle'd; values can). Probe key = the largest
  *    orderkey at or below the key-range midpoint — deterministic
  *    integer arithmetic on both engines.
  *
  * Scale shape: q358's loop runs entirely on the condensation (4
  * nodes at sf0.01); q359 writes once, reads one row group back.
  */
object Extras142 {

  // q359's layout rewrite is a deterministic pure function of the
  // fixture dir — memoize the written directory per dir for the
  // session (bench warm + timed + 10x fold runs reuse one write, and
  // deleteOnExit reclaims the copies; the Streams.partedDir
  // convention — r13 advisory).
  private val layoutDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def layoutDir(dir: String,
      li: org.apache.spark.sql.DataFrame): String =
    layoutDirs.computeIfAbsent(dir, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft_q359_")
      d.toFile.deleteOnExit()
      li.sort(col("l_orderkey")).coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString)
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .parquet(d.toString)
      new java.io.File(d.toString).listFiles()
        .foreach(_.deleteOnExit())
      d.toString
    })

  val all: Seq[Qry] = Seq(

    Qry(
      "q358_condensation_depth", {
        def lvlRound(name: String, prev: String): String =
          s"""$name AS MATERIALIZED (SELECT p.node,
             |    GREATEST(p.lvl, COALESCE(m.ml, 0)) AS lvl
             |  FROM $prev p LEFT JOIN (
             |    SELECT c.cdst AS node, MAX(pl.lvl) + 1 AS ml
             |    FROM cond c JOIN $prev pl ON pl.node = c.csrc
             |    GROUP BY 1) m ON m.node = p.node)""".stripMargin
        val rounds = (1 to 6)
          .map(k => lvlRound(s"lv$k", s"lv${k - 1}")).mkString(",\n")
        // composes Extras136.SccOracleCtes structurally (r13 advisory
        // retired the stripPrefix/split string surgery); the lv6=lv5
        // sentinel is the same bound-guard device — an insufficient
        // relaxation unroll fires an impossible row, loudly blaming
        // the oracle's depth rather than the engine
        s"""WITH ${Extras136.SccOracleCtes}
           |SELECT node % 2 AS kind, node // 2 AS key, csize, lvl
           |FROM (
           |  WITH cond AS MATERIALIZED (
           |    SELECT DISTINCT sa.scc AS csrc, sb.scc AS cdst
           |    FROM e0 t JOIN asg sa ON sa.node = t.src
           |      JOIN asg sb ON sb.node = t.dst
           |    WHERE sa.scc <> sb.scc),
           |  lv0 AS (SELECT scc AS node, CAST(0 AS BIGINT) AS lvl
           |          FROM (SELECT DISTINCT scc FROM asg)),
           |  $rounds
           |  SELECT l.node, sz.csize, l.lvl
           |  FROM lv6 l JOIN sz ON sz.scc = l.node
           |  UNION ALL SELECT CAST(-2 AS BIGINT), CAST(-2 AS BIGINT),
           |    CAST(-2 AS BIGINT)
           |  WHERE EXISTS (SELECT 1 FROM lv6 a JOIN lv5 p
           |    ON p.node = a.node AND p.lvl <> a.lvl))""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val tt = Tables(spark, dir)
      // staged once: the SCC run and the condensation pass both read
      // the edge leaf — unstaged, the corpus join+groupBy ran twice
      val e = Staging.stage(
        Extras136.tradeFlowEdges(tt.orders, tt.lineitem), eager = true)
      val labels = Scc.run(e, "src", "dst", edgesClean = true)
      val cond = Scc.condensationEdges(e, labels, "src", "dst")
      val sz = labels.groupBy($"scc")
        .agg(count(lit(1)).cast(LongType).as("csize"))
      // every component seeds at level 0; arcs raise the reachable —
      // mirror the oracle's full-node base table via a left join
      val lv = DagLevels.run(cond, "csrc", "cdst")
        .select($"id".as("__lid"), $"lvl")
      sz.join(lv, $"scc" === $"__lid", "left_outer")
        .select(($"scc" % 2).as("kind"), expr("scc DIV 2").as("key"),
          $"csize", coalesce($"lvl", lit(0L)).as("lvl"))
    },

    Qry(
      "q359_rowgroup_roundtrip",
      s"""WITH b AS (SELECT MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi
         |  FROM lineitem),
         |k AS (SELECT MAX(l_orderkey) AS k FROM lineitem, b
         |      WHERE l_orderkey <= (lo + hi) // 2)
         |SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${dsumSql("l_extendedprice")} AS price_sum,
         |  CAST(SUM(l_partkey) AS BIGINT) AS partkey_sum
         |FROM lineitem, k WHERE l_orderkey = k.k
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = Tables(spark, dir).lineitem
        .select($"l_orderkey".cast(LongType).as("l_orderkey"),
          $"l_partkey".cast(LongType).as("l_partkey"),
          $"l_extendedprice")
      // the ParquetSkippingSpec layout contract, written for real:
      // sorted on the lookup key, small row groups, bloom on partkey
      val out = layoutDir(dir, li)
      val mm = li.agg(min($"l_orderkey"), max($"l_orderkey")).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      val k = li.filter($"l_orderkey" <= mid)
        .agg(max($"l_orderkey")).head().getLong(0)
      spark.read.parquet(out).filter($"l_orderkey" === k)
        .groupBy($"l_orderkey".as("orderkey"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          dsum($"l_extendedprice").as("price_sum"),
          sum($"l_partkey").cast(LongType).as("partkey_sum"))
    }
  )
}
