package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Consumer for the close-write events produced by
  * [[graft.streaming.CloseWriteDetector]] (K5): in the reference, the
  * `_flb_close_write` sentinel triggers a per-tag force flush
  * (close-write-flush.patch:106-156) and the compact stage later merges the
  * stream's ~1 MB objects. Here the close event triggers the merge directly:
  * a closed (cluster, namespace, pod, container) stream has no writer
  * anymore, so its positional subtree can be rewritten into scan-sized files
  * with no coordination.
  *
  * Scale design: each closed stream is bounded by one container lifetime of
  * logs, so per-stream compaction is a small independent job; open streams
  * are never touched (their directories are not globbed). A processed-event
  * ledger under `<closeEventsRoot>/_finalized` makes the job idempotent —
  * re-runs and crashes re-converge. During the swap a concurrent reader can
  * transiently see the compacted file alongside not-yet-deleted originals
  * (at-least-once visibility, the same guarantee the reference's compact
  * stage gives); it never sees an empty stream.
  */
object StreamFinalize {

  private val streamKey = Seq("cluster", "namespace", "pod", "container")

  /** Compact every closed stream recorded under `closeEventsRoot` that the
    * ledger has not seen yet. Returns the finalized stream keys.
    */
  def finalizeClosed(spark: SparkSession, closeEventsRoot: String,
      storeRoot: String, maxRecordsPerFile: Long = 4000000L): Seq[(String, String, String, String)] = {
    val fs = new Path(closeEventsRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledgerPath = s"${closeEventsRoot.stripSuffix("/")}/_finalized"
    def keysOf(df: DataFrame) = df.select(streamKey.map(col): _*).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val closedFiles = Option(fs.globStatus(new Path(closeEventsRoot, "*.parquet")))
      .map(_.toSeq).getOrElse(Seq.empty)
    if (closedFiles.isEmpty) return Seq.empty
    val closed = keysOf(spark.read.parquet(closeEventsRoot))
    val done: Set[(String, String, String, String)] =
      if (fs.exists(new Path(ledgerPath))) keysOf(spark.read.parquet(ledgerPath)).toSet
      else Set.empty
    val pending = closed.filterNot(done)
    pending.foreach { case (cluster, ns, pod, container) =>
      compactPositionalStream(spark, storeRoot, cluster, ns, pod, container, maxRecordsPerFile)
      // ledger append AFTER the stream is compacted: a crash in between just
      // re-compacts (idempotent), never skips
      import spark.implicits._
      Seq((cluster, ns, pod, container)).toDF(streamKey: _*)
        .coalesce(1).write.mode("append").parquet(ledgerPath)
    }
    pending.toSeq
  }

  /** Rewrite one closed stream's positional parquet files (under
    * `<root>/<cluster>/<ns>/Y/M/D/<node>/<pod>/<container>/H/M/`)
    * into files capped at `maxRecordsPerFile`, placed in the stream's latest
    * minute directory (the path time is upload time, never queried —
    * y-logcli:166 filters on the time column). Returns the number of small
    * files replaced; 0 or 1 existing files are left as-is.
    */
  def compactPositionalStream(spark: SparkSession, root: String, cluster: String,
      ns: String, pod: String, container: String,
      maxRecordsPerFile: Long = 4000000L): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val glob = new Path(s"${root.stripSuffix("/")}/$cluster/$ns/*/*/*/*/$pod/$container/*/*/*.parquet")
    val files = Option(fs.globStatus(glob)).map(_.toSeq).getOrElse(Seq.empty).map(_.getPath)
    if (files.size <= 1) return 0
    val df = spark.read.parquet(files.map(_.toString): _*)
    val scratch = new Path(s"${root.stripSuffix("/")}/.finalize-$cluster-$ns-$pod-$container")
    fs.delete(scratch, true)
    // one writer task: the stream is one container's bounded lifetime;
    // maxRecordsPerFile still splits a genuinely large stream into several
    // scan-sized files
    df.coalesce(1)
      .sortWithinPartitions(col("time_ns"))
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(scratch.toString)
    val destDir = new Path(files.map(_.getParent.toString).max)
    fs.listStatus(scratch).filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (st, i) =>
        require(fs.rename(st.getPath,
          new Path(destDir, s"compact-$i-${java.util.UUID.randomUUID()}.parquet")),
          s"rename of compacted file into $destDir failed")
      }
    files.foreach(f => fs.delete(f, false))
    fs.delete(scratch, true)
    files.size
  }
}
