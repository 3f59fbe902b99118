package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.functions._

/** Wire-format expressions: SQL surface, codegen path, interpreted path,
  * bounds behavior, and seeded-random roundtrip properties (the
  * reference's encode/decode convention, /root/reference/src/main.rs:46-62). */
class LittleEndianSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL roundtrip through the registered functions") {
    val r = spark.sql(
      """SELECT le_f64(le_encode_f64(3.25), 0) AS d,
        |  le_u64(le_encode_u64(-1), 0) AS l,
        |  le_u32(le_encode_u32(-1), 0) AS u32max,
        |  le_u8(le_encode_u8(300), 0) AS b
        |""".stripMargin).head()
    assert(r.getDouble(0) == 3.25)
    assert(r.getLong(1) == -1L)
    assert(r.getLong(2) == 0xFFFFFFFFL) // u32 stays unsigned in a long
    assert(r.getInt(3) == 44)           // 300 & 0xFF
  }

  test("reference record layout: pack 5 fields, decode at offsets") {
    // market_data record: symbol u32, price f64, qty u32, ts u64, exch u8
    // (offsets 0, 4, 12, 16, 24; total 25 bytes).
    val out = Seq((101, 1000.25, 57, 1700000000123456789L, 3))
      .toDF("symbol", "price", "qty", "ts", "exch")
      .selectExpr(
        """concat(le_encode_u32(symbol), le_encode_f64(price),
          |  le_encode_u32(qty), le_encode_u64(ts), le_encode_u8(exch))
          |  AS rec""".stripMargin)
      .selectExpr("length(rec) AS len", "le_u32(rec, 0) AS symbol",
        "le_f64(rec, 4) AS price", "le_u32(rec, 12) AS qty",
        "le_u64(rec, 16) AS ts", "le_u8(rec, 24) AS exch")
      .head()
    assert(out.getInt(0) == 25)
    assert(out.getLong(1) == 101L && out.getDouble(2) == 1000.25)
    assert(out.getLong(3) == 57L && out.getLong(4) == 1700000000123456789L)
    assert(out.getInt(5) == 3)
  }

  test("out-of-bounds and null inputs decode to null") {
    val r = spark.sql(
      """SELECT le_f64(le_encode_u32(7), 0) AS short_buf,
        |  le_u32(le_encode_u64(7), 5) AS past_end,
        |  le_u32(le_encode_u64(7), -1) AS neg_off,
        |  le_u32(CAST(NULL AS BINARY), 0) AS null_bin""".stripMargin).head()
    assert((0 until 4).forall(r.isNullAt))
  }

  test("interpreted eval matches codegen results") {
    val enc = LeEncodeF64(Literal(math.Pi)).eval(null).asInstanceOf[Array[Byte]]
    val dec = LeDecodeF64(Literal(enc), Literal(0)).eval(null)
    assert(dec == math.Pi)
  }

  test("property: u64/f64/u32 roundtrip for arbitrary values") {
    val rnd = new scala.util.Random(42)
    val longs = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong())
    longs.foreach { l =>
      assert(LeDecodeU64(
        Literal(LeEncodeU64(Literal(l)).eval(null)), Literal(0)).eval(null) == l)
    }
    val ints = Seq(0, 1, -1, Int.MinValue, Int.MaxValue) ++
      Seq.fill(200)(rnd.nextInt())
    ints.foreach { i =>
      assert(LeDecodeU32(
        Literal(LeEncodeU32(Literal(i)).eval(null)), Literal(0)).eval(null) ==
        java.lang.Integer.toUnsignedLong(i))
    }
    val doubles = Seq(0.0, -0.0, 1.5, Double.MinPositiveValue,
      Double.MaxValue, Double.NegativeInfinity) ++
      Seq.fill(200)(rnd.nextDouble() * math.pow(10, rnd.nextInt(600) - 300))
    doubles.foreach { d =>
      assert(LeDecodeF64(
        Literal(LeEncodeF64(Literal(d)).eval(null)), Literal(0)).eval(null) == d)
    }
  }
}
