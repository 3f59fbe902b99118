package graft

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector: `runMain graft.Explain <sfDir> q1 q27 ...`
  * prints each query's formatted physical plan and two timed runs
  * (cold-ish, warm) so plan regressions and warmup effects are
  * distinguishable. Dev tool, not part of the driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.build("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session warmup so timings reflect the plan, not the JVM
    // (parquet + noop-writer init included, mirroring Bench)
    spark.range(2000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_PLAN_ONLY=1 skips the timed runs — plan dumps for a
    // dozen heavy queries would otherwise execute each 3x (two timed
    // runs + the rows= count)
    val planOnly = sys.env.getOrElse("SPARK_GRAFT_PLAN_ONLY", "0") == "1"
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
      graft.operators.Staging.sweep(spark)
      (1 to (if (planOnly) 0 else 2)).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        // noop sink like Bench: count() would let Catalyst prune the
        // projections whose plan was just printed
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"run$i: $secs%.2f s rows=${df.count()}")
      }
    }
    spark.stop()
  }
}
