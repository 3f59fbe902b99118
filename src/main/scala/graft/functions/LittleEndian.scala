package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the reference's wire format: fields
  * are raw little-endian bytes (`/root/reference/src/main.rs:46-62`
  * encodes `u32`/`f64`/`u64`/`u8` with `to_le_bytes`; consumers decode
  * with `from_le_bytes`, `/root/reference/src/main.rs:86`,
  * `/root/reference/src/tests/integration_test.rs:248-261`).
  *
  * Implemented as codegen'd expressions (not UDFs) so decode sits inside
  * whole-stage codegen with zero boxing — at 100 TB the decode path is
  * the scan's hot loop. Each expression is null-intolerant (null in →
  * null out) and pure.
  */
/** Encode a numeric value to its little-endian byte representation. */
abstract class LeEncode(val width: Int) extends UnaryExpression with Serializable
    with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  protected def putJava(buf: String, v: String): String
  protected def put(buf: java.nio.ByteBuffer, v: Any): Unit

  override def nullSafeEval(v: Any): Any = {
    val buf = java.nio.ByteBuffer.allocate(width)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    put(buf, v)
    buf.array()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val buf = ctx.freshName("buf")
      s"""java.nio.ByteBuffer $buf = java.nio.ByteBuffer.allocate($width)
         |  .order(java.nio.ByteOrder.LITTLE_ENDIAN);
         |${putJava(buf, v)};
         |${ev.value} = $buf.array();""".stripMargin
    })
}

case class LeEncodeU32(child: Expression) extends LeEncode(4) {
  override def inputTypes = Seq(IntegerType)
  override protected def put(b: java.nio.ByteBuffer, v: Any): Unit =
    b.putInt(v.asInstanceOf[Int])
  override protected def putJava(buf: String, v: String): String =
    s"$buf.putInt($v)"
  override protected def withNewChildInternal(c: Expression): LeEncodeU32 =
    copy(child = c)
  override def prettyName: String = "le_encode_u32"
}

case class LeEncodeU64(child: Expression) extends LeEncode(8) {
  override def inputTypes = Seq(LongType)
  override protected def put(b: java.nio.ByteBuffer, v: Any): Unit =
    b.putLong(v.asInstanceOf[Long])
  override protected def putJava(buf: String, v: String): String =
    s"$buf.putLong($v)"
  override protected def withNewChildInternal(c: Expression): LeEncodeU64 =
    copy(child = c)
  override def prettyName: String = "le_encode_u64"
}

case class LeEncodeF64(child: Expression) extends LeEncode(8) {
  override def inputTypes = Seq(DoubleType)
  override protected def put(b: java.nio.ByteBuffer, v: Any): Unit =
    b.putDouble(v.asInstanceOf[Double])
  override protected def putJava(buf: String, v: String): String =
    s"$buf.putDouble($v)"
  override protected def withNewChildInternal(c: Expression): LeEncodeF64 =
    copy(child = c)
  override def prettyName: String = "le_encode_f64"
}

case class LeEncodeU8(child: Expression) extends LeEncode(1) {
  override def inputTypes = Seq(IntegerType)
  override protected def put(b: java.nio.ByteBuffer, v: Any): Unit =
    b.put((v.asInstanceOf[Int] & 0xFF).toByte)
  override protected def putJava(buf: String, v: String): String =
    s"$buf.put((byte)($v & 0xFF))"
  override protected def withNewChildInternal(c: Expression): LeEncodeU8 =
    copy(child = c)
  override def prettyName: String = "le_encode_u8"
}

/** Decode little-endian bytes at a 0-based offset within a binary column
  * (a whole record is the concatenation of its field encodings, so
  * decode-at-offset reads one field of a packed record). */
abstract class LeDecode(val width: Int) extends BinaryExpression with Serializable
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  protected def getJava(buf: String): String
  protected def get(buf: java.nio.ByteBuffer): Any

  override def nullSafeEval(bytes: Any, off: Any): Any = {
    val arr = bytes.asInstanceOf[Array[Byte]]
    val o = off.asInstanceOf[Int]
    // `o > length - width`, NOT `o + width > length`: the addition can
    // overflow Int for offsets near Int.MaxValue and wrap "in bounds"
    if (o < 0 || o > arr.length - width) null
    else get(java.nio.ByteBuffer.wrap(arr, o, width)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o) =>
      s"""if ($o < 0 || $o > $b.length - $width) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = java.nio.ByteBuffer.wrap($b, $o, $width)
         |    .order(java.nio.ByteOrder.LITTLE_ENDIAN).${getJava("")};
         |}""".stripMargin)
  override def nullable: Boolean = true
}

case class LeDecodeU8(left: Expression, right: Expression)
    extends LeDecode(1) {
  override def dataType: DataType = IntegerType
  override protected def get(b: java.nio.ByteBuffer): Any =
    java.lang.Byte.toUnsignedInt(b.get)
  override protected def getJava(buf: String): String = "get() & 0xFF"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : LeDecodeU8 = copy(left = l, right = r)
  override def prettyName: String = "le_u8"
}

/** u32 decoded into a non-negative LongType (no sign clipping). */
case class LeDecodeU32(left: Expression, right: Expression)
    extends LeDecode(4) {
  override def dataType: DataType = LongType
  override protected def get(b: java.nio.ByteBuffer): Any =
    java.lang.Integer.toUnsignedLong(b.getInt)
  override protected def getJava(buf: String): String =
    "getInt() & 0xFFFFFFFFL"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : LeDecodeU32 = copy(left = l, right = r)
  override def prettyName: String = "le_u32"
}

case class LeDecodeU64(left: Expression, right: Expression)
    extends LeDecode(8) {
  override def dataType: DataType = LongType
  override protected def get(b: java.nio.ByteBuffer): Any = b.getLong
  override protected def getJava(buf: String): String = "getLong()"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : LeDecodeU64 = copy(left = l, right = r)
  override def prettyName: String = "le_u64"
}

case class LeDecodeF64(left: Expression, right: Expression)
    extends LeDecode(8) {
  override def dataType: DataType = DoubleType
  override protected def get(b: java.nio.ByteBuffer): Any = b.getDouble
  override protected def getJava(buf: String): String = "getDouble()"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : LeDecodeF64 = copy(left = l, right = r)
  override def prettyName: String = "le_f64"
}
