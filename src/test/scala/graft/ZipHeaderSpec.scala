package graft

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions._

/** Edge pins for the PKZIP LFH walk (q228's expressions). */
class ZipHeaderSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def lfh(name: String, data: Array[Byte], flags: Int = 0,
      extra: Array[Byte] = Array.empty): Array[Byte] = {
    val n = name.getBytes("UTF-8")
    val b = java.nio.ByteBuffer.allocate(30 + n.length + extra.length +
      data.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x04034B50).putShort(20).putShort(flags.toShort)
      .putShort(0).putShort(0).putShort(0).putInt(0)
    b.putInt(data.length).putInt(data.length)
    b.putShort(n.length.toShort).putShort(extra.length.toShort)
    b.put(n).put(extra).put(data)
    b.array()
  }
  private val eocd: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x06054B50); b.array()
  }
  private val cdSig: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x02014B50); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.reduce(_ ++ _)

  test("empty archive: bare EOCD = 0 entries, NULL name") {
    assert(ZipEntries(Literal(eocd)).eval() == 0)
    assert(ZipCompBytes(Literal(eocd)).eval() == 0L)
    assert(ZipFirstName(Literal(eocd)).eval() == null)
  }

  test("entries, extra-field skip, central-directory terminator") {
    val a = cat(
      lfh("x.txt", Array.fill[Byte](10)(1), extra = Array.fill[Byte](4)(9)),
      lfh("y.bin", Array.fill[Byte](7)(2)),
      cdSig) // CD record follows: terminator even without EOCD bytes
    assert(ZipEntries(Literal(a)).eval() == 2)
    assert(ZipCompBytes(Literal(a)).eval() == 17L)
    assert(ZipFirstName(Literal(a)).eval().toString == "x.txt")
  }

  test("data-descriptor flag (bit 3) -> NULL: streaming zips unwalkable") {
    val a = cat(lfh("s", Array.fill[Byte](5)(3), flags = 8), eocd)
    assert(ZipEntries(Literal(a)).eval() == null)
  }

  test("corrupt: unknown signature, truncated header, truncated data") {
    val ok = cat(lfh("t", Array.fill[Byte](20)(4)), eocd)
    assert(ZipEntries(Literal("junkjunkjunk".getBytes)).eval() == null)
    assert(ZipEntries(Literal(ok.take(20))).eval() == null)
    assert(ZipEntries(Literal(ok.take(40))).eval() == null)
    assert(ZipEntries(Literal(ok)).eval() == 1)
  }

  test("entry budget: 16 walk, a 17th -> NULL") {
    val e = lfh("m", Array.empty[Byte])
    val sixteen = cat((Seq.fill(16)(e) :+ eocd): _*)
    val seventeen = cat((Seq.fill(17)(e) :+ eocd): _*)
    assert(ZipEntries(Literal(sixteen)).eval() == 16)
    assert(ZipEntries(Literal(seventeen)).eval() == null)
  }

  test("codecSniffed: zip joins the facade; bare EOCD stays corrupt") {
    import graft.Graft._
    val a = cat(lfh("z.txt", Array.fill[Byte](11)(6)), eocd)
    val r = Seq(("z", a), ("e", eocd)).toDF("k", "b").codecSniffed("b")
      .select("k", "codec", "declared_size").collect()
      .map(x => x.getString(0) ->
        ((x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2)))).toMap
    assert(r("z") == (("zip", 11L)))
    assert(r("e")._1 == "corrupt")
  }

  test("codegen agrees with interpreted on the DataFrame surface") {
    val a = cat(lfh("w.dat", Array.fill[Byte](9)(5)), eocd)
    val r = Seq(Tuple1(a)).toDF("b")
      .selectExpr("zip_entries(b) AS e", "zip_comp_bytes(b) AS c",
        "zip_first_name(b) AS n").head()
    assert((r.getInt(0), r.getLong(1), r.getString(2)) == ((1, 9L, "w.dat")))
  }
}
