package graft.streaming

import graft.logs.GraftStore
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftSqlAccess, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructType}

/** `spark.readStream.format("graft")` — tail a versioned store's commits as
  * a structured stream (the Delta streaming-source shape). Together with the
  * store SINK ([[graft.logs.LogStreamIngest.startStoreSink]]) this closes
  * the loop: one job commits batches into the store, another tails those
  * commits — the store is the durable, replayable bus between pipeline
  * stages (ingest → dedup → training-mix), which is how a crawl pipeline
  * that never stops feeds consumers that restart at will.
  *
  * Offsets ARE store versions: `getOffset` reports the live version,
  * `getBatch(a, b)` emits the rows ADDED between snapshots `a` and `b`,
  * computed by [[GraftStore.rowDiff]] — the file-diff-pruned CDC, so a
  * micro-batch over a 10⁴-partition store reads the files the commits
  * touched, never the store. Exactly-once follows from the offset contract:
  * versions are immutable snapshots, so `(a, b]` is the same multiset on
  * every replay of a checkpointed batch.
  *
  * Options:
  *   - `startingVersion`: `"latest"` (default — tail only commits after the
  *     stream starts), a version number N (deltas since snapshot N), or `0`
  *     (bootstrap: first batch is the full live snapshot, then deltas).
  *   - `cdc=true`: emit a `_change` column (`added` | `removed`) instead of
  *     filtering to additions — deletion-vector commits then surface their
  *     removed rows, the readChangeFeed shape.
  *
  * Retention contract: `getBatch` needs BOTH endpoint snapshots on disk.
  * Commits retain a grace snapshot by default; a consumer that may lag k
  * commits needs `retainSnapshots >= k` on the writer side — the same
  * deal Delta's log retention strikes with its streaming readers. A
  * reclaimed endpoint fails the stream fast with the versions still
  * retained, rather than silently dropping the gap.
  */
class GraftStreamSource(
    spark: SparkSession,
    root: String,
    dataSchema: StructType,
    startingVersion: String,
    cdc: Boolean,
    metadataPath: String) extends Source with Logging {

  override val schema: StructType =
    if (cdc) StructType(dataSchema.fields :+
      org.apache.spark.sql.types.StructField("_change", StringType, nullable = false))
    else dataSchema

  /** Version already consumed when the stream starts (exclusive base).
    * 0 = nothing consumed → first batch is the full live snapshot.
    *
    * `latest` resolves against the LIVE store exactly once per CHECKPOINT,
    * not once per source incarnation: the first incarnation writes the
    * resolved version under `metadataPath` (Delta's initial-offset pattern)
    * and every later one reads it back. Without the file, a restart that
    * replays a not-yet-committed batch 0 would re-resolve `latest` to a
    * version >= that batch's end and return it empty — silently dropping
    * every row in (originalBase, end].
    */
  private val baseVersion: Long = startingVersion match {
    case "latest" => resolveLatestOnce()
    case n => n.trim.toLong
  }

  private def resolveLatestOnce(): Long = {
    val dir = new org.apache.hadoop.fs.Path(metadataPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = new org.apache.hadoop.fs.Path(dir, "graft-initial-version")
    def read(): Long = {
      val in = fs.open(file)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
    if (fs.exists(file)) read()
    else {
      val v = GraftStore.liveVersionOf(spark, root).toLong
      fs.mkdirs(dir)
      // write-then-rename: the published file is never partial, and losing
      // the publish race to a concurrent incarnation just means adopting
      // the winner's value (both resolved the same checkpoint's start)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s".graft-initial-version.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, file)) v
      else { fs.delete(tmp, false); read() }
    }
  }

  override def getOffset: Option[Offset] = {
    // ALWAYS the live version, independent of baseVersion: on a checkpoint
    // restart this source is recreated after the commits it must deliver,
    // and the execution engine decides novelty by comparing against its
    // checkpointed offset, not ours. A first batch at (base, base] is
    // simply empty.
    Some(LongOffset(GraftStore.liveVersionOf(spark, root).toLong))
  }

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case so: SerializedOffset => LongOffset(so).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(baseVersion)
    val to = versionOf(end)
    logInfo(s"graft stream batch $root: versions ($from, $to]")
    val rdd =
      if (to <= from ||
          // bootstrapping a dataless snapshot (fresh store): nothing to
          // read and no parquet schema to infer — an empty batch of the
          // declared schema, not an inference error
          (from == 0L &&
            GraftStore.compositeEntries(spark, root, to.toInt).isEmpty))
        spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else {
        val batch: DataFrame =
          if (from == 0L) {
            // bootstrap: the full snapshot at `to` is, by definition, the
            // rows added since "nothing"
            val snap = GraftStore.readVersion(spark, root, to.toInt)
            if (cdc) snap.withColumn("_change", lit("added")) else snap
          } else {
            val diff = GraftStore.rowDiff(spark, root, from.toInt, to.toInt)
            if (cdc) diff
            else diff.filter(col("_change") === "added").drop("_change")
          }
        // project in declared order; rows are copied out of the unsafe
        // buffers the scan reuses
        batch.select(schema.fieldNames.map(col).toIndexedSeq: _*)
          .queryExecution.toRdd.map(_.copy())
      }
    // wrap ONCE as a streaming frame (the DSv1 Source contract: getBatch
    // results must carry isStreaming=true; everything above stays a plain
    // batch plan so it can be planned and executed normally)
    GraftSqlAccess.streamingFrame(spark, rdd, schema)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$root, base=$baseVersion]"

  /** Exposed for the restart spec: the base this incarnation settled on. */
  private[graft] def resolvedBaseVersion: Long = baseVersion
}
