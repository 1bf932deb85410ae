package graft.sources

import graft.logs.{LogPathLayout, LogSchema}
import org.apache.hadoop.fs.Path
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.nio.channels.Channels
import java.util.Collections

/** Arrow IPC (Feather v2) log sink — the reference's second storage format
  * (SURVEY §1.5; reference fluent-bit.conf:32-45). Faithful to the compact
  * stage's physical choices:
  *  - `stream`/`logtag` dictionary-encoded with **int8 indices**
  *    (compact_columns.c:245-330; −3 bytes/row vs int32,
  *    compact_columns.c:193-196);
  *  - **ZSTD body compression** — the one codec the reference's readers
  *    support (compact_columns.c:399-402);
  *  - timestamps without timezone annotation (compact_columns.c:69-93) —
  *    here as `time` µs + lossless `time_ns` int64 (SURVEY §7.4).
  *
  * Scale: rows are written per Spark partition grouped by label key, so each
  * task streams its groups once; no driver-side data movement.
  */
object ArrowLogWriter {

  /** Write a log DataFrame into the positional layout with `.arrow` files
    * (one file per label-combination per Spark partition). Rows are first
    * repartitioned by the label key so each combination lands in exactly one
    * task → one file (at the reference's 1 MB-object scale, one file per
    * flush batch, fluent-bit.conf:42).
    *
    * Null handling: null `time_ns`/`stream`/`logtag`/`message` values are
    * written as Arrow nulls; a null LABEL column renders as the literal
    * `null` path segment (label columns are expected non-null — the CRI
    * ingest path guarantees it).
    */
  def writePositional(df: DataFrame, root: String,
      uploadTime: java.time.Instant = java.time.Instant.now()): Unit = {
    val t = uploadTime.atZone(java.time.ZoneOffset.UTC)
    def f2(i: Int) = f"$i%02d"
    val pathTime = Seq(t.getYear.toString, f2(t.getMonthValue), f2(t.getDayOfMonth))
    val hourMin = Seq(f2(t.getHour), f2(t.getMinute))
    // Hadoop conf captured on the driver (no active session on executors);
    // keys are clustered AND sorted within partitions, so groups stream
    // through one bounded buffer instead of materializing the partition.
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val keyCols = Seq("cluster", "namespace", "node", "pod", "container")
    val keyed = df.select(
      (keyCols.map(col) ++ Seq(col("time"), col("time_ns"), col("stream"),
        col("logtag"), col("message"))): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    keyed.foreachPartition { (rows: Iterator[Row]) =>
      def keyOf(r: Row) = (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))
      def flush(key: (String, String, String, String, String), group: Seq[Row]): Unit = {
        val (cluster, ns, node, pod, container) = key
        val dir = (Seq(root.stripSuffix("/"), cluster, ns) ++ pathTime ++
          Seq(node, pod, container) ++ hourMin).mkString("/")
        val fs = new Path(dir).getFileSystem(conf.value)
        fs.mkdirs(new Path(dir))
        val out = fs.create(new Path(dir,
          java.util.UUID.randomUUID().toString + ".arrow"), false)
        try writeFile(group, java.nio.channels.Channels.newChannel(out))
        finally out.close()
      }
      var current: Option[(String, String, String, String, String)] = None
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { r =>
        val k = keyOf(r)
        if (!current.contains(k)) {
          current.foreach(flush(_, buf.toSeq))
          buf.clear()
          current = Some(k)
        }
        buf += r
      }
      current.foreach(flush(_, buf.toSeq))
    }
  }

  /** Serialize one row group as a Feather v2 file (ZSTD, dict<int8>). */
  def writeFile(group: Seq[Row], file: java.io.File): Unit = {
    val out = new java.io.FileOutputStream(file)
    try writeFile(group, Channels.newChannel(out)) finally out.close()
  }

  /** Serialize one row group to any byte channel (local file, HDFS, S3A). */
  def writeFile(group: Seq[Row], channel: java.nio.channels.WritableByteChannel): Unit = {
    val alloc = new RootAllocator()
    try {
      // dictionaries for stream/logtag (domain {stdout,stderr} / {F,P})
      val streamDictVec = new VarCharVector("stream_dict", alloc)
      val logtagDictVec = new VarCharVector("logtag_dict", alloc)
      // null label values stay out of the dictionary domain (they are encoded
      // as null indices below); the CRI ingest path never produces them, but
      // writePositional is a public API over arbitrary DataFrames
      val streamVals = group.map(_.getString(7)).filter(_ != null).distinct.sorted
      val logtagVals = group.map(_.getString(8)).filter(_ != null).distinct.sorted
      streamDictVec.allocateNew(streamVals.size)
      streamVals.zipWithIndex.foreach { case (v, i) => streamDictVec.setSafe(i, v.getBytes("UTF-8")) }
      streamDictVec.setValueCount(streamVals.size)
      logtagDictVec.allocateNew(logtagVals.size)
      logtagVals.zipWithIndex.foreach { case (v, i) => logtagDictVec.setSafe(i, v.getBytes("UTF-8")) }
      logtagDictVec.setValueCount(logtagVals.size)
      val int8 = new ArrowType.Int(8, true)
      val streamDict = new Dictionary(streamDictVec, new DictionaryEncoding(1L, false, int8))
      val logtagDict = new Dictionary(logtagDictVec, new DictionaryEncoding(2L, false, int8))
      val provider = new DictionaryProvider.MapDictionaryProvider(streamDict, logtagDict)

      val timeVec = new TimeStampMicroVector("time", alloc)          // no tz, like the reference
      val timeNsVec = new BigIntVector("time_ns", alloc)
      val streamIdx = new TinyIntVector(new Field("stream",
        new FieldType(true, int8, streamDict.getEncoding), Collections.emptyList()), alloc)
      val logtagIdx = new TinyIntVector(new Field("logtag",
        new FieldType(true, int8, logtagDict.getEncoding), Collections.emptyList()), alloc)
      val messageVec = new VarCharVector("message", alloc)
      val n = group.size
      Seq[ValueVector](timeVec, timeNsVec, streamIdx, logtagIdx, messageVec)
        .foreach(_.setInitialCapacity(n))
      val streamIndex = streamVals.zipWithIndex.toMap
      val logtagIndex = logtagVals.zipWithIndex.toMap
      group.zipWithIndex.foreach { case (r, i) =>
        if (r.isNullAt(6)) { timeVec.setNull(i); timeNsVec.setNull(i) }
        else {
          timeVec.setSafe(i, Math.floorDiv(r.getLong(6), 1000L)) // µs from lossless ns
          timeNsVec.setSafe(i, r.getLong(6))
        }
        if (r.isNullAt(7)) streamIdx.setNull(i)
        else streamIdx.setSafe(i, streamIndex(r.getString(7)).toByte)
        if (r.isNullAt(8)) logtagIdx.setNull(i)
        else logtagIdx.setSafe(i, logtagIndex(r.getString(8)).toByte)
        if (r.isNullAt(9)) messageVec.setNull(i)
        else messageVec.setSafe(i, r.getString(9).getBytes("UTF-8"))
      }
      Seq[ValueVector](timeVec, timeNsVec, streamIdx, logtagIdx, messageVec)
        .foreach(_.setValueCount(n))

      val root = new VectorSchemaRoot(
        Seq(timeVec, timeNsVec, streamIdx, logtagIdx, messageVec)
          .map(_.asInstanceOf[FieldVector]).asJava)
      val writer = new ArrowFileWriter(root, provider, channel,
        new java.util.HashMap[String, String](),
        org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
        CompressionUtil.CodecType.ZSTD)
      try { writer.start(); writer.writeBatch(); writer.end() }
      finally { writer.close(); root.close()
        streamDictVec.close(); logtagDictVec.close() }
    } finally alloc.close()
  }

  implicit private class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
