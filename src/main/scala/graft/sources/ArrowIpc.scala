package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float4Vector, Float8Vector, IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowReader, ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Arrow IPC interchange: write a DataFrame as Arrow *stream-format*
  * files (`.arrows`, one per partition) or *file-format* files
  * (`.arrow` — the random-access variant with a footer, what
  * memory-mapped readers and Feather v2 consumers open), read either
  * back distributed through a DataSource V2 batch source
  * (`format("graft-arrow").load(dir)` — the reader picks
  * stream/file decoding per file by extension).
  *
  * Arrow IPC is the interchange layer the ML data stacks the engine
  * feeds actually speak (pandas/polars/Ray/torch dataloaders consume
  * Arrow streams zero-copy); the interchange family (CSV q183,
  * JSON-lines q184, Avro q188) stopped one format short of it. The
  * reference has no columnar interchange at all — its wire format is
  * little-endian structs (`/root/reference/src/storage/table.rs:27`);
  * this is the Spark-native equivalent surface.
  *
  * Scale shape: the WRITE is one pass — each task serializes its own
  * partition to one `.arrows` file in batches of `ChunkRows` rows
  * (bounded memory; no driver collect anywhere). The READ plans one
  * input partition per file, so a 1000-file dataset fans out to 1000
  * parallel readers; per-task memory is one Arrow record batch.
  * Supported Spark types: BIGINT, INT, DOUBLE, STRING, and (round 12)
  * ARRAY&lt;FLOAT&gt; / ARRAY&lt;DOUBLE&gt; — embedding columns, the
  * payload a torch/Ray dataloader actually pulls over Arrow (Arrow
  * `ListVector` of `Float4`/`Float8`); unsupported types (and NULL
  * elements inside a list — Arrow allows them, no fixture produces
  * them) fail loudly at write time.
  */
object ArrowIpc {

  private val ChunkRows = 4096

  private def arrowField(f: StructField): Field = {
    def flat(dt: DataType): ArrowType = dt match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case FloatType => new ArrowType.FloatingPoint(
        FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(
        FloatingPointPrecision.DOUBLE)
      case StringType => new ArrowType.Utf8
      case other => throw new IllegalArgumentException(
        s"graft-arrow: unsupported type $other for column ${f.name}")
    }
    f.dataType match {
      case ArrayType(et @ (FloatType | DoubleType), _) =>
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          Seq(new Field("item", FieldType.nullable(flat(et)), null)).asJava)
      case ArrayType(other, _) => throw new IllegalArgumentException(
        s"graft-arrow: unsupported array element type $other for " +
          s"column ${f.name}")
      case dt => new Field(f.name, FieldType.nullable(flat(dt)), null)
    }
  }

  private[sources] def toArrow(st: StructType): ArrowSchema =
    new ArrowSchema(st.fields.map(arrowField).toSeq.asJava)

  private def flatFromArrow(t: ArrowType): DataType = t match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case _: ArrowType.Utf8 => StringType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE =>
      DoubleType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE =>
      FloatType
    case other => throw new IllegalArgumentException(
      s"graft-arrow: unsupported Arrow type $other")
  }

  private[sources] def fromArrow(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.map { f =>
      val dt = f.getType match {
        case _: ArrowType.List =>
          ArrayType(flatFromArrow(f.getChildren.get(0).getType),
            containsNull = false)
        case t => flatFromArrow(t)
      }
      StructField(f.getName, dt, nullable = true)
    }.toSeq)

  /** Write `df` as Arrow stream files under `dir` (one file per
    * non-empty partition, named by partition id). Distributed: each
    * task streams its rows through a fixed-size VectorSchemaRoot. */
  def write(df: DataFrame, dir: String,
      fileFormat: Boolean = false): Unit = {
    val schema = df.schema // StructType is serializable; build the
    df.foreachPartition { (it: Iterator[Row]) => // Arrow schema per task
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val allocator = new RootAllocator()
        val root = VectorSchemaRoot.create(toArrow(schema), allocator)
        val ext = if (fileFormat) "arrow" else "arrows"
        val ch = new java.io.FileOutputStream(
          f"$dir/part-$pid%05d.$ext").getChannel
        val w =
          if (fileFormat) new ArrowFileWriter(root, null, ch)
          else new ArrowStreamWriter(root, null, ch)
        try {
          w.start()
          it.grouped(ChunkRows).foreach { chunk =>
            root.allocateNew()
            var i = 0
            chunk.foreach { row =>
              schema.fields.zipWithIndex.foreach { case (f, j) =>
                val v = root.getVector(j)
                if (row.isNullAt(j)) v match {
                  case x: BigIntVector => x.setNull(i)
                  case x: IntVector => x.setNull(i)
                  case x: Float4Vector => x.setNull(i)
                  case x: Float8Vector => x.setNull(i)
                  case x: VarCharVector => x.setNull(i)
                  case x: ListVector => x.setNull(i)
                } else v match {
                  case x: BigIntVector => x.setSafe(i, row.getLong(j))
                  case x: IntVector => x.setSafe(i, row.getInt(j))
                  case x: Float4Vector => x.setSafe(i, row.getFloat(j))
                  case x: Float8Vector => x.setSafe(i, row.getDouble(j))
                  case x: VarCharVector => x.setSafe(i,
                    row.getString(j).getBytes(
                      java.nio.charset.StandardCharsets.UTF_8))
                  case x: ListVector =>
                    // embedding column: one offsets entry + the
                    // elements appended to the shared child vector;
                    // setSafe on the child grows it as needed. NULL
                    // elements are a loud error (scaladoc contract).
                    val seq = row.getAs[scala.collection.Seq[Any]](j)
                    val start = x.startNewValue(i)
                    var k = 0
                    x.getDataVector match {
                      case dv: Float4Vector => seq.foreach { e =>
                        require(e != null, "graft-arrow: NULL list " +
                          s"element in column ${schema.fields(j).name}")
                        dv.setSafe(start + k, e.asInstanceOf[Float])
                        k += 1
                      }
                      case dv: Float8Vector => seq.foreach { e =>
                        require(e != null, "graft-arrow: NULL list " +
                          s"element in column ${schema.fields(j).name}")
                        dv.setSafe(start + k, e.asInstanceOf[Double])
                        k += 1
                      }
                      case other => throw new IllegalArgumentException(
                        s"graft-arrow: unsupported list child $other")
                    }
                    x.endValue(i, k)
                }
              }
              i += 1
            }
            root.setRowCount(chunk.size)
            w.writeBatch()
          }
          w.end()
        } finally {
          w.close(); root.close(); allocator.close(); ch.close()
        }
      }
    }
  }

  // Session-cached round-trip dirs (the Streams.partedDir discipline:
  // bench warm + timed runs reuse one write instead of leaking dirs).
  private val cachedDirs = new ConcurrentHashMap[String, String]()

  /** Write once per (key) for the session; returns the directory. */
  def writeCached(key: String, df: => DataFrame,
      fileFormat: Boolean = false): String =
    cachedDirs.computeIfAbsent(key, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft_arrow_")
      d.toFile.deleteOnExit()
      write(df, d.toString, fileFormat)
      d.toString
    })

  /** Open a per-file reader: `.arrow` = random-access file format
    * (footer), `.arrows` = stream format. */
  private[sources] def openReader(path: String,
      allocator: RootAllocator): ArrowReader =
    if (path.endsWith(".arrow"))
      new ArrowFileReader(
        new java.io.FileInputStream(path).getChannel, allocator)
    else new ArrowStreamReader(new java.io.FileInputStream(path), allocator)

  private[sources] def listFiles(dir: String): Array[String] = {
    val fs = new java.io.File(dir).listFiles()
    require(fs != null && fs.nonEmpty, s"graft-arrow: no files under $dir")
    fs.filter(f => f.getName.endsWith(".arrows") ||
        f.getName.endsWith(".arrow"))
      .map(_.getPath).sorted
  }
}

/** One Arrow stream file = one read task. */
private[sources] case class ArrowFilePartition(path: String)
  extends InputPartition

private[sources] class ArrowReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val allocator = new RootAllocator()
      private val reader = ArrowIpc.openReader(
        p.asInstanceOf[ArrowFilePartition].path, allocator)
      private val root = reader.getVectorSchemaRoot
      private var i = 0
      private var n = 0

      override def next(): Boolean = {
        while (i >= n) { // skips empty batches
          if (!reader.loadNextBatch()) return false
          n = root.getRowCount
          i = 0
        }
        true
      }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(schema.length)
        var j = 0
        while (j < schema.length) {
          val v = root.getVector(j)
          if (v.isNull(i)) row.update(j, null)
          else v match {
            case x: BigIntVector => row.setLong(j, x.get(i))
            case x: IntVector => row.setInt(j, x.get(i))
            case x: Float4Vector => row.setFloat(j, x.get(i))
            case x: Float8Vector => row.setDouble(j, x.get(i))
            case x: VarCharVector =>
              row.update(j, UTF8String.fromBytes(x.get(i)))
            case x: ListVector =>
              val s = x.getElementStartIndex(i)
              val e = x.getElementEndIndex(i)
              val out = new Array[Any](e - s)
              x.getDataVector match {
                case dv: Float4Vector =>
                  var k = s
                  while (k < e) { out(k - s) = dv.get(k); k += 1 }
                case dv: Float8Vector =>
                  var k = s
                  while (k < e) { out(k - s) = dv.get(k); k += 1 }
                case other => throw new IllegalArgumentException(
                  s"graft-arrow: unsupported list child $other")
              }
              row.update(j, new GenericArrayData(out))
          }
          j += 1
        }
        i += 1
        row
      }

      override def close(): Unit = {
        reader.close(); allocator.close()
      }
    }
}

private[sources] class ArrowTable(dir: String) extends Table
    with SupportsRead {
  override def name(): String = s"graft_arrow_$dir"
  override def schema(): StructType = {
    val allocator = new RootAllocator()
    val r = ArrowIpc.openReader(ArrowIpc.listFiles(dir).head, allocator)
    try ArrowIpc.fromArrow(r.getVectorSchemaRoot.getSchema)
    finally { r.close(); allocator.close() }
  }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      private val s = schema()
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = s
        override def description(): String = s"GraftArrow($dir)"
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            ArrowIpc.listFiles(dir)
              .map(ArrowFilePartition(_): InputPartition)
          override def createReaderFactory(): PartitionReaderFactory =
            new ArrowReaderFactory(s)
        }
      }
    }
}

/** `spark.read.format("graft-arrow").load(dir)` */
class ArrowSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-arrow"
  private def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-arrow source requires a path")
    p
  }
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new ArrowTable(dir(options)).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrowTable(properties.get("path"))
}
