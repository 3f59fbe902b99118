package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.functions._

/** Bounded gzip inflate/compress expressions: round-trip fidelity, the
  * NULL contract for every damage class (truncation, magic, trailer
  * CRC/ISIZE damage), the zip-bomb bound firing exactly at max+1, and
  * codegen/interpreted parity on the DataFrame surface.
  */
class InflateSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val payload =
    ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")
  private val gz = GzipCodec.compress(payload)

  private def inflate(b: Array[Byte], max: Int): Any =
    GzipInflate(Literal(b), Literal(max)).eval()

  test("round-trip: inflate(compress(x), len) == x at the tightest bound") {
    val out = inflate(gz, payload.length)
    assert(out != null &&
      java.util.Arrays.equals(out.asInstanceOf[Array[Byte]], payload))
  }

  test("empty payload round-trips; negative bound is NULL") {
    val egz = GzipCodec.compress(Array.empty[Byte])
    assert(inflate(egz, 0).asInstanceOf[Array[Byte]].length == 0)
    assert(inflate(egz, -1) == null)
  }

  test("zip-bomb guard: one byte below the payload size is NULL") {
    assert(inflate(gz, payload.length - 1) == null)
    assert(inflate(gz, 0) == null)
  }

  test("corrupt classes are NULL, never throw") {
    // magic byte damaged
    val badMagic = gz.clone(); badMagic(0) = 'X'.toByte
    assert(inflate(badMagic, payload.length) == null)
    // trailer cut entirely (EOF mid-trailer)
    assert(inflate(gz.dropRight(8), payload.length) == null)
    // ISIZE overwritten: deflate stream intact, trailer check must fire
    val badSize = gz.clone()
    (1 to 4).foreach(i => badSize(badSize.length - i) = 0xFF.toByte)
    assert(inflate(badSize, payload.length) == null)
    // deflate stream bytes damaged mid-member
    val badBody = gz.clone()
    badBody(gz.length / 2) = (badBody(gz.length / 2) ^ 0x55).toByte
    assert(inflate(badBody, payload.length) == null)
    // not even close to a gzip stream
    assert(inflate(Array[Byte](1, 2, 3), 10) == null)
  }

  test("zstd: round-trip at the tightest bound; bound/magic/truncation NULL") {
    val z = ZstdCodec.compress(payload)
    def zinf(b: Array[Byte], max: Int): Any =
      ZstdInflate(Literal(b), Literal(max)).eval()
    val out = zinf(z, payload.length)
    assert(out != null &&
      java.util.Arrays.equals(out.asInstanceOf[Array[Byte]], payload))
    assert(zinf(z, payload.length - 1) == null) // bomb guard
    assert(zinf(z, -1) == null)
    val badMagic = z.clone(); badMagic(0) = 'X'.toByte
    assert(zinf(badMagic, payload.length) == null)
    assert(zinf(z.dropRight(6), payload.length) == null) // truncated frame
    assert(zinf(Array[Byte](9, 9, 9), 10) == null)
    // empty payload round-trips at bound 0
    val ez = ZstdCodec.compress(Array.empty[Byte])
    assert(zinf(ez, 0).asInstanceOf[Array[Byte]].length == 0)
  }

  test("codegen path agrees with interpreted on the DataFrame surface") {
    val r = Seq(("abc" * 100, 300), ("abc" * 100, 299))
      .toDF("t", "cap")
      .selectExpr(
        "gzip_inflate(gzip_compress(CAST(t AS BINARY)), cap) AS b",
        "zstd_inflate(zstd_compress(CAST(t AS BINARY)), cap) AS z")
      .selectExpr("CAST(b AS STRING) AS s", "CAST(z AS STRING) AS zs")
      .collect()
    assert(r(0).getString(0) == "abc" * 100)
    assert(r(1).isNullAt(0))
    assert(r(0).getString(1) == "abc" * 100)
    assert(r(1).isNullAt(1))
  }
}
