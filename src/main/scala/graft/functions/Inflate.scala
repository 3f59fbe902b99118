package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bounded gzip payload (de)compression — the piece that closes the
  * transport family's decode loop: q202/q209 parse gzip MEMBER HEADERS
  * and declared sizes; these expressions actually move the payload
  * bytes, so a WARC.gz / jsonl.gz path runs end-to-end in-engine.
  *
  * Both are codegen'd Catalyst expressions over one static codec
  * helper (the [[MediaHeader]] discipline: the hot loop stays inside
  * whole-stage codegen, the byte-twiddling lives in ONE audited static
  * method used by both the interpreted and generated paths). The codec
  * is the JDK's RFC 1952 implementation — public platform API, no new
  * dependency.
  *
  * `gzip_inflate(blob, max_bytes)` applies the media-family corruption
  * contract: corrupt input (bad magic, truncation, CRC/ISIZE trailer
  * damage) and inflated output EXCEEDING max_bytes both decode to NULL,
  * never throw. The bound is the zip-bomb guard a 100 TB ingest
  * pipeline cannot ship without: memory per row is capped at
  * max_bytes + one 8 KiB chunk regardless of what the payload claims,
  * and a hostile member degrades to NULL metadata instead of an
  * executor OOM.
  */
object GzipCodec {

  /** RFC 1952 compress (one member, JDK default deflate level). Only
    * used engine-side to synthesize fixtures and round-trip — the
    * exact compressed bytes are a zlib implementation detail, so no
    * oracle ever predicts them; oracles predict the INFLATED side. */
  def compress(a: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(a.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(a)
    gz.close()
    bos.toByteArray
  }

  /** Bounded inflate: null on corrupt input, on a negative bound, or
    * when the inflated size exceeds `maxBytes` (checked incrementally —
    * the loop aborts as soon as the bound is crossed, it never
    * materializes an unbounded payload first). */
  def inflate(a: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (maxBytes < 0) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(a))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(maxBytes, 8192).max(16))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size() + n > maxBytes) return null
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch {
      // ZipException (magic/CRC/ISIZE), EOFException (truncation),
      // any other IO failure: the corrupt-payload contract is NULL
      case _: java.io.IOException => null
    }
  }
}

/** Zstandard twin of [[GzipCodec]] over the zstd-jni library Spark
  * already ships on its classpath (the engine adds NO dependency —
  * Spark itself uses it for shuffle/parquet codecs). Same bounded
  * contract: corrupt frames and outputs exceeding the bound are NULL,
  * checked incrementally through the streaming decoder. Note zstd
  * frames carry no mandatory checksum (unlike gzip's CRC32), so the
  * deterministic damage classes are magic/truncation/bound — a
  * mid-frame bit flip is NOT guaranteed to be detected, which is why
  * the q256-family queries never use that class for zstd. */
object ZstdCodec {

  /** One zstd frame (default level). Engine-side synthesis only — no
    * oracle predicts compressed bytes. */
  def compress(a: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(a)

  /** Bounded streaming inflate: null on corrupt input, negative bound,
    * or output exceeding `maxBytes` (abort on crossing, never
    * materialize an unbounded payload). */
  def inflate(a: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (maxBytes < 0) return null
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(a))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(maxBytes, 8192).max(16))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size() + n > maxBytes) return null
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch {
      case _: java.io.IOException => null
    }
  }
}

/** `gzip_compress(binary)` → one-member gzip stream. */
case class GzipCompress(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    GzipCodec.compress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.compress($c)")
  override protected def withNewChildInternal(c: Expression): GzipCompress =
    copy(child = c)
  override def prettyName: String = "gzip_compress"
}

/** `gzip_inflate(binary, max_bytes)` → inflated payload, or NULL when
  * corrupt or larger than the bound (the zip-bomb guard). */
case class GzipInflate(blob: Expression, maxBytes: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = blob
  override def right: Expression = maxBytes
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, m: Any): Any =
    GzipCodec.inflate(b.asInstanceOf[Array[Byte]], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, m) =>
      s"""${ev.value} = graft.functions.GzipCodec.inflate($b, $m);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): GzipInflate = copy(blob = l, maxBytes = r)
  override def prettyName: String = "gzip_inflate"
}

/** `zstd_compress(binary)` → one zstd frame. */
case class ZstdCompress(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ZstdCodec.compress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdCodec.compress($c)")
  override protected def withNewChildInternal(c: Expression): ZstdCompress =
    copy(child = c)
  override def prettyName: String = "zstd_compress"
}

/** `zstd_inflate(binary, max_bytes)` → inflated frame, or NULL when
  * corrupt or larger than the bound. */
case class ZstdInflate(blob: Expression, maxBytes: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = blob
  override def right: Expression = maxBytes
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, m: Any): Any =
    ZstdCodec.inflate(b.asInstanceOf[Array[Byte]], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, m) =>
      s"""${ev.value} = graft.functions.ZstdCodec.inflate($b, $m);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ZstdInflate = copy(blob = l, maxBytes = r)
  override def prettyName: String = "zstd_inflate"
}
