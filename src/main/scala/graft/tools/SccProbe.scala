package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.GraftSession
import graft.sources.Tables

/** Scratch probe: peel/round structure of the directed trade graph at a
  * given SF (dev tool, not part of the library surface). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.build("scc-probe")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators", org.apache.logging.log4j.Level.INFO)
    import spark.implicits._
    val tt = Tables(spark, dir)
    val b = tt.orders.join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey".cast(LongType).as("c"),
        $"l_suppkey".cast(LongType).as("s"))
      .agg(max(when($"l_returnflag" === "R", 1).otherwise(0)).as("ret"))
    val fwd = b.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"))
    val back = b.filter($"ret" === 1)
      .select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst"))
    val e = fwd.unionByName(back)
    println(s"[probe] edges fwd=${fwd.count()} back=${back.count()}")
    // mirror Scc.run but with printed rounds
    val res = graft.operators.Scc.run(e, "src", "dst")
    val sizes = res.groupBy($"scc").count().orderBy($"count".desc)
    println("[probe] top components:")
    sizes.show(5, false)
    println(s"[probe] n_nodes=${res.count()} n_sccs=${sizes.count()}")
    spark.stop()
  }
}
