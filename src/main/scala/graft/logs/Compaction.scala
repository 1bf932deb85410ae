package graft.logs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Small-files compaction (SURVEY §7.8): the reference's 1 MB-object design
  * (`total_file_size 1M`, fluent-bit.conf:42) produces ~10⁸ objects at
  * 100 TB; scan efficiency needs periodic rewrite into scan-sized files.
  *
  * Strategy: read the hive store, re-write each partition's rows into files
  * capped by `maxRecordsPerFile` with one task per output partition
  * (repartition on the partition key — no global shuffle of unrelated
  * partitions, and AQE coalesces the tiny ones). Readers see the swap
  * atomically per partition thanks to dynamic partition overwrite.
  *
  * Crash safety: an in-flight marker (`<root>.compact-inflight`, holding the
  * expected row count) brackets the swap. If a run dies inside job commit —
  * the one window where a partition can exist in neither tree — the next run
  * finds the marker and re-applies the verified staging tree (the surviving
  * full copy) instead of re-staging from the possibly-truncated live store.
  */
object Compaction {

  def compactHive(spark: SparkSession, root: String,
      maxRecordsPerFile: Long = 4000000L,
      partitionCols: Seq[String] = LogSchema.hivePartitionColumns,
      convertStreamingStore: Boolean = false): Unit = {
    // keep partition dir names byte-identical: type inference would read
    // 'hour=00' back as int 0 and rewrite the dir as 'hour=0', forking the
    // partition from future string-valued appends
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(root)
    val staging = new Path(root + ".compact-staging")
    val marker = new Path(root + ".compact-inflight")
    try {
      if (fs.exists(marker)) {
        // A previous run crashed between swap start and verified cleanup.
        // Staging was verified complete before the marker was written, so it
        // is authoritative — re-apply it rather than re-staging from a live
        // tree that may have lost a partition mid-commit.
        require(fs.exists(staging),
          s"$marker exists but $staging is gone — a previous swap crashed and " +
            "its staging tree was removed; restore from backup/upstream")
        val expected = readMarker(fs, marker)
        applyStaging(spark, live, staging, marker, fs, partitionCols,
          maxRecordsPerFile, expected)
        return
      }
      // staging without a marker is derived data from an attempt that died
      // BEFORE the swap started — the live tree is still complete; re-stage
      if (fs.exists(staging)) fs.delete(staging, true)
      // A store written by the STREAMING sink carries a _spark_metadata commit
      // log: spark.read.parquet(root) then trusts the log, so files appended
      // by batch writers (not in the log) would be INVISIBLE to this read —
      // and the swap below would delete them permanently. Mirror
      // Retention.enforceHive: require an explicit opt-in that drops the log
      // (converting the store to listing-based; only safe with no live
      // streaming writer), otherwise refuse.
      val sinkLog = new Path(live, "_spark_metadata")
      if (fs.exists(sinkLog)) {
        require(convertStreamingStore,
          s"$root was written by the streaming sink (_spark_metadata present); " +
            "compacting through the commit log would drop any batch-appended " +
            "files. Stop the streaming query and pass convertStreamingStore=true " +
            "to drop the log and compact the full listing")
        fs.delete(sinkLog, true)
      }
      val input = spark.read.parquet(root)
      val expectedRows = input.count() // parquet footer metadata, not a data scan
      input
        .repartition(partitionCols.map(col): _*)
        .write
        .partitionBy(partitionCols: _*)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite")
        .parquet(staging.toString)
      // verify the rewrite BEFORE touching the live tree — a short row count
      // means lost data and must abort while the original is still in place
      val stagedRows = spark.read.parquet(staging.toString).count()
      require(stagedRows == expectedRows,
        s"compaction wrote $stagedRows rows, expected $expectedRows; aborting with $live untouched")
      writeMarker(fs, marker, expectedRows)
      applyStaging(spark, live, staging, marker, fs, partitionCols,
        maxRecordsPerFile, expectedRows)
    } finally spark.conf.set(inferKey, prevInfer)
  }

  /** Swap per partition via dynamic partition overwrite: the live root is
    * never renamed away, so concurrent readers always have a store — every
    * partition is either its old files or its compacted replacement (the
    * only unreadable window is the per-partition delete+rename inside job
    * commit, milliseconds, vs the whole-rewrite window a root-rename swap
    * had). A crash anywhere in here leaves the marker + staging in place for
    * the recovery path above. Requires no concurrent WRITER (appends racing
    * the swap into an overwritten partition would be dropped).
    */
  private def applyStaging(spark: SparkSession, live: Path, staging: Path,
      marker: Path, fs: FileSystem, partitionCols: Seq[String],
      maxRecordsPerFile: Long, expectedRows: Long): Unit = {
    spark.read.parquet(staging.toString)
      .write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(live.toString)
    val liveRows = spark.read.parquet(live.toString).count()
    require(liveRows == expectedRows,
      s"post-swap count $liveRows != expected $expectedRows — inspect $live against $staging")
    // marker FIRST: leftover staging without a marker is just re-staged on
    // the next run, but a leftover marker without staging reads as an
    // unrecoverable crash and blocks compaction on a healthy store
    fs.delete(marker, false)
    fs.delete(staging, true)
  }

  /** Atomic marker write (temp + rename): a torn marker would wedge every
    * future run inside the recovery branch.
    */
  private def writeMarker(fs: FileSystem, marker: Path, rows: Long): Unit = {
    val tmp = new Path(marker.getParent, marker.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(rows.toString.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, marker), s"atomic rename $tmp -> $marker failed")
  }

  private def readMarker(fs: FileSystem, marker: Path): Long = {
    val in = fs.open(marker)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
    finally in.close()
  }
}
