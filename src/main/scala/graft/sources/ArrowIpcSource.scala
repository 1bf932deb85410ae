package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}
import org.apache.hadoop.fs.{FileSystem, Path}
import java.util.OptionalLong

/** Arrow IPC (Feather v2) batch file source as a DataSource V2 —
  * `spark.read.format("graft.sources.ArrowIpcSource").load(glob)` (SURVEY §2
  * row S7; the reference reads the same files via DuckDB's nanoarrow
  * extension, y-logcli:210-213).
  *
  * Read path is **columnar**: each Arrow record batch becomes a Spark
  * `ColumnarBatch` wrapping `ArrowColumnVector`s — zero per-value copying,
  * dictionary-encoded columns (the reference's int8-dict `stream`/`logtag`)
  * decode lazily through Arrow's dictionary machinery. Files at the
  * reference's design size (~1 MB, fluent-bit.conf:42) are read whole per
  * task; one `InputPartition` per file preserves data locality at scale.
  *
  * (Deliberately supports the schema the engine writes — µs timestamps,
  * int64, utf8, dict<int8,utf8>. Raw Timestamp(ns) columns from the
  * reference's own compact stage surface as int64 nanos, matching SURVEY
  * §7.4's lossless-long design.)
  */
class ArrowIpcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrow-ipc"
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(_.split(","))
    require(p.nonEmpty, "arrow-ipc source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ArrowIpcSource.listFiles(paths(options))
    require(files.nonEmpty, s"no .arrow files under ${paths(options).mkString(",")}")
    val base = ArrowIpcSource.readSchema(files.head)
    // Mixed-directory guard: the head file's schema speaks for the glob, so
    // verify the rest agree. Footer reads are driver-side — bounded here
    // (schemaCheckFiles, default 32) for huge globs; EVERY file is still
    // verified at read time by the partition reader, so a mismatch past the
    // bound fails with a clear error rather than silent misreads.
    val checkN = Option(options.get("schemaCheckFiles")).map(_.toInt).getOrElse(32)
    // compare names+types, not nullability (normalized recursively — nested
    // array-element/struct-field nullability too): writers legitimately mark
    // a column non-nullable when their chunk happens to contain no nulls
    def norm(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f => StructField(f.name, norm(f.dataType))))
      case a: ArrayType => ArrayType(norm(a.elementType), containsNull = true)
      case m: MapType => MapType(norm(m.keyType), norm(m.valueType), valueContainsNull = true)
      case other => other
    }
    def shape(s: StructType) = s.fields.map(f => (f.name, norm(f.dataType))).toSeq
    files.tail.take(math.max(0, checkN - 1)).foreach { f =>
      val s = ArrowIpcSource.readSchema(f)
      require(shape(s) == shape(base),
        s"arrow-ipc schema mismatch under ${paths(options).mkString(",")}: $f reads as " +
          s"${s.simpleString} but ${files.head} (schema source) reads as ${base.simpleString}")
    }
    // opt-in hidden-ish file path column (the positional layout carries label
    // columns in the path — SURVEY §1.3)
    if (options.getBoolean("withFilePath", false))
      base.add(StructField(ArrowIpcSource.FilePathColumn, StringType, nullable = false))
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ArrowIpcTable(schema,
      ArrowIpcSource.listFiles(paths(new CaseInsensitiveStringMap(properties))))
}

object ArrowIpcSource {
  val FilePathColumn = "_file_path"

  def listFiles(globs: Seq[String]): Seq[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    globs.flatMap { g =>
      val p = new Path(g)
      val fs = p.getFileSystem(conf)
      val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.getPath.getName.endsWith(".arrow")).map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.sorted
  }

  /** Spark schema from an Arrow file footer (dictionary columns surface with
    * their VALUE type — string — like the reference's query side sees them).
    */
  def readSchema(file: String): StructType = {
    withReader(file) { reader =>
      StructType(reader.getVectorSchemaRoot.getSchema.getFields.toArray.map {
        case f: org.apache.arrow.vector.types.pojo.Field =>
          StructField(f.getName, sparkType(f), nullable = true)
      })
    }
  }

  private[sources] def sparkType(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    // dictionary-encoded fields carry the INDEX type in the schema message;
    // readers surface the VALUE domain (strings here and in the reference's
    // compact stage, compact_columns.c:245-330)
    if (f.getDictionary != null) return StringType
    val t = f.getType
    t match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case i: ArrowType.Int if i.getBitWidth == 16 => ShortType
      case i: ArrowType.Int if i.getBitWidth == 8 => ByteType
      case _: ArrowType.Utf8 => StringType
      case fp: ArrowType.FloatingPoint =>
        if (fp.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)
          DoubleType else FloatType
      case ts: ArrowType.Timestamp =>
        ts.getUnit match {
          case org.apache.arrow.vector.types.TimeUnit.MICROSECOND => TimestampType
          // lossless-ns contract (SURVEY §7.4): nanos surface as raw longs
          case org.apache.arrow.vector.types.TimeUnit.NANOSECOND => LongType
          case _ => TimestampType
        }
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case other => throw new UnsupportedOperationException(s"arrow type $other")
    }
  }

  def withReader[A](file: String)(f: ArrowFileReader => A): A = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    // seekable channel, not a whole-file buffer: the footer lives at the
    // file's tail, so a driver-side schema read touches a few KB of a
    // possibly scan-sized compacted file — and a file past 2 GB no longer
    // overflows an Int-sized array
    val ch = openChannel(file, conf)
    val alloc = new RootAllocator()
    val reader = new ArrowFileReader(ch, alloc)
    try f(reader) finally { reader.close(); alloc.close(); ch.close() }
  }

  private[sources] def openChannel(file: String,
      conf: org.apache.hadoop.conf.Configuration): HadoopSeekableChannel = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    new HadoopSeekableChannel(fs.open(path), fs.getFileStatus(path).getLen)
  }
}

/** Read-only `SeekableByteChannel` over a Hadoop `FSDataInputStream` — lets
  * Arrow's file reader seek straight to the footer / record-batch offsets
  * instead of the file being staged in a heap byte array. Close is
  * idempotent (ArrowFileReader closes the channel it was handed, and the
  * opener closes it again defensively).
  */
private[sources] final class HadoopSeekableChannel(
    in: org.apache.hadoop.fs.FSDataInputStream, length: Long)
    extends java.nio.channels.SeekableByteChannel {
  private var closed = false
  // Arrow's record-batch buffers are DIRECT (hasArray=false), so the staging
  // branch is the hot path: reuse one bounded array instead of allocating a
  // full-remaining-size one per read call (a 256 MB batch body would churn
  // 256 MB of transient heap per retry otherwise).
  private var staging: Array[Byte] = _
  override def read(dst: java.nio.ByteBuffer): Int = {
    val pos = in.getPos
    if (pos >= length) return -1
    val toRead = math.min(dst.remaining().toLong, length - pos).toInt
    if (dst.hasArray) {
      val n = in.read(dst.array(), dst.arrayOffset() + dst.position(), toRead)
      if (n > 0) dst.position(dst.position() + n)
      n
    } else {
      val chunk = math.min(toRead, 1 << 20)
      if (staging == null || staging.length < chunk) staging = new Array[Byte](chunk)
      val n = in.read(staging, 0, chunk)
      if (n > 0) dst.put(staging, 0, n)
      n
    }
  }
  override def write(src: java.nio.ByteBuffer): Int =
    throw new java.nio.channels.NonWritableChannelException
  override def position(): Long = in.getPos
  override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
    in.seek(newPosition); this
  }
  override def size(): Long = length
  override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
    throw new java.nio.channels.NonWritableChannelException
  override def isOpen: Boolean = !closed
  override def close(): Unit = if (!closed) { closed = true; in.close() }
}

class ArrowIpcTable(schema: StructType, files: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"arrow-ipc(${files.size} files)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(schema, files)
}

class ArrowIpcScanBuilder(schema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var pruned: StructType = schema
  // column pruning pushdown: a projection over two of six columns must only
  // decompress those two columns' buffers (Arrow IPC is columnar — skipping
  // a vector skips its ZSTD body entirely)
  override def pruneColumns(requiredSchema: StructType): Unit =
    pruned = StructType(schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ArrowIpcScan(pruned, files)
}

case class ArrowFilePartition(file: String) extends InputPartition

class ArrowIpcScan(schema: StructType, files: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(ArrowFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val withFilePath = schema.fields.lastOption.exists(_.name == ArrowIpcSource.FilePathColumn)
    new ArrowIpcReaderFactory(withFilePath,
      // captured on the DRIVER at plan time: executors have no active session
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration),
      // data columns the pruned schema still needs, in schema order (with
      // types, so the reader can reject a mixed-schema file it was handed)
      StructType(schema.fields.filterNot(_.name == ArrowIpcSource.FilePathColumn)))
  }
}

class ArrowIpcReaderFactory(withFilePath: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration,
    required: StructType) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("columnar only")
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    new ArrowIpcColumnarReader(partition.asInstanceOf[ArrowFilePartition].file,
      withFilePath, conf, Some(required))
}

/** Streams a file's record batches as Spark ColumnarBatches. The whole file
  * is buffered (reference-design objects are ~1 MB) and decompressed
  * batch-by-batch by Arrow (ZSTD bodies).
  */
class ArrowIpcColumnarReader(file: String, withFilePath: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration,
    required: Option[StructType] = None)
    extends PartitionReader[ColumnarBatch] {
  private val alloc = new RootAllocator()
  private val channel = ArrowIpcSource.openChannel(file, conf.value)
  private val reader = new ArrowFileReader(channel, alloc,
    org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
  private var batch: ColumnarBatch = _
  // decode() allocates fresh vectors; track and free them per batch or the
  // allocator reports a leak on close
  private var decoded: List[org.apache.arrow.vector.ValueVector] = Nil

  private def closeDecoded(): Unit = { decoded.foreach(_.close()); decoded = Nil }

  override def next(): Boolean = {
    closeDecoded()
    if (!reader.loadNextBatch()) return false
    val root = reader.getVectorSchemaRoot
    // per-file schema guard: the plan's schema came from the glob's head
    // file — a mixed-schema directory must fail loudly here, not misread
    val selected = required match {
      case Some(fields) => fields.fields.map { f =>
        val v = root.getVector(f.name)
        if (v == null) throw new IllegalStateException(
          s"arrow-ipc schema mismatch: $file has no column '${f.name}' " +
            s"(file columns: ${root.getSchema.getFields.toArray.map { case g: org.apache.arrow.vector.types.pojo.Field => g.getName }.mkString(", ")}); " +
            "mixed-schema directory?")
        val got = ArrowIpcSource.sparkType(v.getField)
        if (got != f.dataType) throw new IllegalStateException(
          s"arrow-ipc schema mismatch: $file column '${f.name}' reads as $got, " +
            s"plan expects ${f.dataType}; mixed-schema directory?")
        v
      }
      case None => root.getFieldVectors.toArray
    }
    val dataCols: Array[ColumnVector] = selected.map {
      case v: org.apache.arrow.vector.FieldVector =>
        val enc = v.getField.getDictionary
        if (enc != null) {
          // materialize dict<int8> -> values (the reference's query side sees
          // plain strings too, y-logcli DESCRIBE shows VARCHAR)
          val dict = reader.getDictionaryVectors.get(enc.getId)
          val d = org.apache.arrow.vector.dictionary.DictionaryEncoder.decode(v, dict)
          decoded ::= d
          new ArrowColumnVector(d)
        } else v match {
          case ns: org.apache.arrow.vector.TimeStampNanoVector =>
            // the reference's raw Timestamp(ns) (compact_columns.c:69-93):
            // surface as epoch-nano longs (SURVEY §7.4) — Spark has no
            // accessor for nano vectors, so copy into a BigIntVector
            // (reference-design files are ~1 MB; the copy is batch-bounded)
            val b = new org.apache.arrow.vector.BigIntVector(ns.getName, alloc)
            b.allocateNew(ns.getValueCount)
            var i = 0
            while (i < ns.getValueCount) {
              if (ns.isNull(i)) b.setNull(i) else b.setSafe(i, ns.get(i))
              i += 1
            }
            b.setValueCount(ns.getValueCount)
            decoded ::= b
            new ArrowColumnVector(b)
          case other => new ArrowColumnVector(other)
        }
    }
    val cols: Array[ColumnVector] =
      if (withFilePath) {
        val c = new org.apache.spark.sql.execution.vectorized.ConstantColumnVector(
          root.getRowCount, StringType)
        c.setUtf8String(org.apache.spark.unsafe.types.UTF8String.fromString(file))
        dataCols :+ c
      } else dataCols
    batch = new ColumnarBatch(cols, root.getRowCount)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    closeDecoded(); reader.close(); alloc.close(); channel.close()
  }
}
