package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.ArrowIpc

/** The Arrow IPC interchange contract (sources/ArrowIpc.scala): every
  * supported type round-trips bit-exact (doubles included), nulls and
  * unicode survive, schema inference reads the writer's schema back,
  * and the read plans one task per file.
  */
class ArrowIpcSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("i", IntegerType),
    StructField("s", StringType), StructField("d", DoubleType)))

  test("round-trip: types, nulls, unicode, awkward doubles") {
    val rows = Seq(
      Row(1L, 42, "plain", 1.5),
      Row(-9007199254740993L, -2147483648, "unicode: 你好 ñ €", -0.0),
      Row(null, null, null, null),
      Row(3L, 7, "", 1.7976931348623157e308),
      Row(4L, 0, "tab\tnewline\n", java.lang.Double.MIN_VALUE))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val dir = java.nio.file.Files.createTempDirectory("arrow_rt_").toString
    ArrowIpc.write(df, dir)
    val back = spark.read.format("graft-arrow").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    def canon(r: Row) = (0 until r.length).map { j =>
      if (r.isNullAt(j)) "<null>"
      else r.get(j) match {
        case d: Double =>
          java.lang.Long.toHexString(
            java.lang.Double.doubleToRawLongBits(d))
        case v => v.toString
      }
    }
    assert(back.collect().map(canon).toSet ==
      df.collect().map(canon).toSet)
  }

  test("one read task per file; empty partitions write no file") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 100).map(i => Row(i.toLong, i, s"r$i", i / 2.0)), 4),
      schema)
    val dir = java.nio.file.Files.createTempDirectory("arrow_np_").toString
    ArrowIpc.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(files.length == 4)
    val back = spark.read.format("graft-arrow").load(dir)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    // an empty partition must not leave a zero-row file behind
    val dir2 = java.nio.file.Files.createTempDirectory("arrow_e_").toString
    ArrowIpc.write(df.filter($"k" <= 25).repartition(8), dir2)
    val back2 = spark.read.format("graft-arrow").load(dir2)
    assert(back2.count() == 25)
  }

  test("unsupported type fails loudly at write time") {
    // float/double arrays are supported since r12 — string arrays are
    // the representative still-unsupported case
    val df = Seq((1L, Seq("a"))).toDF("k", "arr")
    val dir = java.nio.file.Files.createTempDirectory("arrow_u_").toString
    val e = intercept[Exception] { ArrowIpc.write(df, dir) }
    assert(e.getMessage != null)
  }

  test("embedding columns: float/double arrays, null row, empty list") {
    val sch = StructType(Seq(
      StructField("k", LongType),
      StructField("fv", ArrayType(FloatType, containsNull = false)),
      StructField("dv", ArrayType(DoubleType, containsNull = false))))
    val rows = Seq(
      Row(1L, Seq(1.5f, -0.0f, Float.MinPositiveValue), Seq(1.5, 2.5)),
      Row(2L, Seq.empty[Float], Seq(-1.7976931348623157e308)),
      Row(3L, null, null),
      Row(4L, Seq(Float.MaxValue, -3.4e-38f), Seq.empty[Double]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), sch)
    for (fileFormat <- Seq(false, true)) {
      val dir = java.nio.file.Files
        .createTempDirectory("arrow_emb_").toString
      ArrowIpc.write(df, dir, fileFormat)
      val back = spark.read.format("graft-arrow").load(dir)
      assert(back.schema("fv").dataType.asInstanceOf[ArrayType]
        .elementType == FloatType)
      assert(back.schema("dv").dataType.asInstanceOf[ArrayType]
        .elementType == DoubleType)
      def canon(r: Row): (Long, String, String) = (
        r.getLong(0),
        if (r.isNullAt(1)) "<null>"
        else r.getSeq[Float](1).map(f => java.lang.Integer.toHexString(
          java.lang.Float.floatToRawIntBits(f))).mkString(","),
        if (r.isNullAt(2)) "<null>"
        else r.getSeq[Double](2).map(d => java.lang.Long.toHexString(
          java.lang.Double.doubleToRawLongBits(d))).mkString(","))
      assert(back.collect().map(canon).toSet ==
        df.collect().map(canon).toSet)
    }
  }

  test("chunk boundaries preserve list offsets (multi-batch file)") {
    // > one 4096-row batch per partition, varying lengths — a broken
    // offsets reset between batches would mis-slice every later vector
    val df = spark.range(0, 9000, 1, 1).selectExpr("id as k",
      "transform(sequence(1, CAST(id % 7 AS INT)), " +
        "x -> CAST(x * 0.5 AS FLOAT)) AS fv")
    val dir = java.nio.file.Files.createTempDirectory("arrow_mb_").toString
    ArrowIpc.write(df, dir)
    val back = spark.read.format("graft-arrow").load(dir)
    val got = back.selectExpr("sum(k)", "sum(size(fv))",
      "sum(CAST(aggregate(fv, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE)) * 2 AS BIGINT))")
      .head()
    val want = df.selectExpr("sum(k)", "sum(size(fv))",
      "sum(CAST(aggregate(fv, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE)) * 2 AS BIGINT))")
      .head()
    assert(got == want)
  }
}
