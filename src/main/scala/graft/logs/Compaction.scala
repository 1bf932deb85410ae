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
  * partitions, and AQE coalesces the tiny ones), then swap.
  *
  * Swap, two tiers:
  *  - [[VersionedStore]] roots (engine-created; root is a symlink to the
  *    current version dir): promote staging to the next version dir and
  *    atomically retarget the symlink — ONE rename, readers see the whole
  *    old tree or the whole new tree, no missing-partition window at all.
  *  - legacy plain-dir roots: swap each leaf partition dir with two
  *    metadata-only renames (old leaf → hidden trash, staged leaf → live);
  *    the per-partition window is two rename syscalls, not the multi-file
  *    delete+rename of a dynamic-overwrite job commit.
  * On object stores (no atomic rename) run the same marker protocol over a
  * pointer object readers resolve; rename-based swaps are local/HDFS tiers.
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
    if (GraftStore.isPointerStore(spark, root)) {
      compactPointerStore(spark, root, maxRecordsPerFile, partitionCols,
        convertStreamingStore)
      return
    }
    // the rename-based tiers below require an atomic rename primitive;
    // object-store "rename" is copy+delete, so a plain (pre-pointer) store
    // there must be migrated, not silently swapped with a seconds-long
    // partition-missing window per leaf
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse("file")
    val objectStoreSchemes =
      Set("s3", "s3a", "s3n", "s3l", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")
    require(!objectStoreSchemes.contains(scheme),
      s"$root is a plain directory on an object store ($scheme), where rename " +
        "is non-atomic copy+delete. Create the store with LogIngest.writeHive " +
        "(pointer-versioned) or migrate it: copy the tree under <root>/v000001 " +
        "and GraftStore.init-style-write <root>/_current")
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
        val expected = readMarker(fs, marker)
        if (VersionedStore.isVersioned(root)) {
          recoverVersioned(spark, root, staging, marker, fs, expected)
        } else {
          require(fs.exists(staging),
            s"$marker exists but $staging is gone — a previous swap crashed and " +
              "its staging tree was removed; restore from backup/upstream")
          applyStaging(spark, live, staging, marker, fs, expected)
        }
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
      if (VersionedStore.isVersioned(root))
        commitVersioned(spark, root, staging, marker, fs, expectedRows)
      else
        applyStaging(spark, live, staging, marker, fs, expectedRows)
    } finally spark.conf.set(inferKey, prevInfer)
  }

  /** Object-store (pointer) tier: stage the rewrite under the NEXT version
    * prefix — readers only ever list the pointed-at prefix, so staging is
    * invisible without any rename — verify it, persist the marker, then
    * commit by overwriting `_current` with ONE atomic PUT. No rename
    * anywhere in the protocol, which is what object stores (rename =
    * copy+delete, non-atomic) require. The marker's presence certifies that
    * the newest version prefix is a verified complete rewrite, so recovery
    * after a crash is: finish the flip, re-verify, clean up.
    */
  private def compactPointerStore(spark: SparkSession, root: String,
      maxRecordsPerFile: Long, partitionCols: Seq[String],
      convertStreamingStore: Boolean): Unit = {
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prevInfer = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, "_compact-inflight")
    try {
      if (fs.exists(marker)) {
        val expected = readMarker(fs, marker)
        val prev = GraftStore.currentVersion(spark, root)
        val newest = GraftStore.listVersions(spark, root).max
        if (newest > prev) GraftStore.writePointer(spark, root, newest)
        val liveRows = spark.read.parquet(GraftStore.resolve(spark, root)).count()
        require(liveRows == expected,
          s"recovered count $liveRows != expected $expected — inspect $root")
        fs.delete(marker, false)
        GraftStore.dropVersionsExcept(spark, root, Set(prev, newest))
        return
      }
      // version prefixes AHEAD of the pointer without a marker are debris
      // from an attempt that died mid-stage; versions BEHIND it are grace
      // snapshots for in-flight readers and die only at commit below
      val cur = GraftStore.currentVersion(spark, root)
      GraftStore.listVersions(spark, root).filter(_ > cur).foreach { n =>
        fs.delete(new Path(root, GraftStore.versionPrefix(n)), true)
      }
      val dataRoot = s"$root/${GraftStore.versionPrefix(cur)}"
      val sinkLog = new Path(dataRoot, "_spark_metadata")
      if (fs.exists(sinkLog)) {
        require(convertStreamingStore,
          s"$root was written by the streaming sink (_spark_metadata present); " +
            "stop the streaming query and pass convertStreamingStore=true")
        fs.delete(sinkLog, true)
      }
      val input = spark.read.parquet(dataRoot)
      val expectedRows = input.count()
      val next = cur + 1
      val nextDir = s"$root/${GraftStore.versionPrefix(next)}"
      input.repartition(partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").parquet(nextDir)
      val stagedRows = spark.read.parquet(nextDir).count()
      require(stagedRows == expectedRows,
        s"compaction wrote $stagedRows rows, expected $expectedRows; aborting with $dataRoot live")
      writeMarker(fs, marker, expectedRows)
      GraftStore.writePointer(spark, root, next) // THE commit: one atomic PUT
      val liveRows = spark.read.parquet(GraftStore.resolve(spark, root)).count()
      require(liveRows == expectedRows,
        s"post-commit count $liveRows != expected $expectedRows — inspect $root")
      fs.delete(marker, false)
      // keep the replaced version as a grace snapshot for in-flight readers
      GraftStore.dropVersionsExcept(spark, root, Set(cur, next))
    } finally spark.conf.set(inferKey, prevInfer)
  }

  /** Versioned-store commit: promote the verified staging tree to the next
    * version directory (one rename — readers never look there), then retarget
    * the root symlink atomically. A reader resolving the root at ANY instant
    * sees the complete old version or the complete new one; there is no
    * missing-partition window at all, unlike the per-leaf swap below.
    */
  private def commitVersioned(spark: SparkSession, root: String, staging: Path,
      marker: Path, fs: FileSystem, expectedRows: Long): Unit = {
    val prev = VersionedStore.currentVersion(root)
    val next = VersionedStore.listVersions(root).max + 1
    val versionDir = new Path(VersionedStore.versionName(root, next))
    require(fs.rename(staging, versionDir), s"rename $staging -> $versionDir failed")
    VersionedStore.retarget(root, next)
    val liveRows = spark.read.parquet(root).count()
    require(liveRows == expectedRows,
      s"post-swap count $liveRows != expected $expectedRows — inspect $root")
    fs.delete(marker, false)
    // keep the replaced version as a grace snapshot for in-flight readers;
    // it is reclaimed by the NEXT commit
    VersionedStore.dropVersionsExcept(root, Set(prev, next))
  }

  /** Versioned-store crash recovery: if staging survived, the commit never
    * promoted it — finish the commit. Otherwise a version dir ahead of the
    * pointer holds the verified rewrite — retarget to it. Both paths are
    * idempotent: re-running after a second crash converges.
    */
  private def recoverVersioned(spark: SparkSession, root: String, staging: Path,
      marker: Path, fs: FileSystem, expectedRows: Long): Unit = {
    if (fs.exists(staging)) {
      commitVersioned(spark, root, staging, marker, fs, expectedRows)
    } else {
      val prev = VersionedStore.currentVersion(root)
      val newest = VersionedStore.listVersions(root).max
      if (newest > prev) VersionedStore.retarget(root, newest)
      val liveRows = spark.read.parquet(root).count()
      require(liveRows == expectedRows,
        s"recovered count $liveRows != expected $expectedRows — inspect $root")
      fs.delete(marker, false)
      VersionedStore.dropVersionsExcept(root, Set(prev, newest))
    }
  }

  /** Swap each leaf partition directory with two single renames: the old
    * leaf moves to a hidden `.compact-trash` dir inside the live root (names
    * starting with `.` are pruned by Spark's file listing, so readers never
    * see trash as a partition), then the staged leaf renames in. The live
    * root is never renamed away, and a partition's unreadable window is two
    * metadata operations — not the per-file delete+rename a job commit does.
    *
    * Idempotent for recovery: a leaf already swapped is gone from staging
    * and is skipped; a leaf whose old dir was trashed but whose replacement
    * never landed (crash between the two renames) still has its staged copy,
    * which renames straight in. A crash anywhere in here leaves the marker +
    * staging in place for the recovery path above. Requires no concurrent
    * WRITER (appends racing the swap into a replaced partition would be
    * trashed with the old files).
    */
  private def applyStaging(spark: SparkSession, live: Path, staging: Path,
      marker: Path, fs: FileSystem, expectedRows: Long): Unit = {
    val trashRoot = new Path(live, ".compact-trash")
    for (rel <- leafPartitionDirs(fs, staging)) {
      val stagedLeaf = new Path(staging, rel)
      val liveLeaf = new Path(live, rel)
      val trashLeaf = new Path(trashRoot, rel)
      // a trash leaf surviving a crashed attempt is superseded: the staged
      // copy (verified complete before the marker was written) is authoritative
      if (fs.exists(trashLeaf)) fs.delete(trashLeaf, true)
      fs.mkdirs(trashLeaf.getParent)
      fs.mkdirs(liveLeaf.getParent)
      if (fs.exists(liveLeaf))
        require(fs.rename(liveLeaf, trashLeaf), s"rename $liveLeaf -> $trashLeaf failed")
      require(fs.rename(stagedLeaf, liveLeaf), s"rename $stagedLeaf -> $liveLeaf failed")
    }
    val liveRows = spark.read.parquet(live.toString).count()
    require(liveRows == expectedRows,
      s"post-swap count $liveRows != expected $expectedRows — inspect $live against $staging")
    // marker FIRST: leftover staging without a marker is just re-staged on
    // the next run, but a leftover marker without staging reads as an
    // unrecoverable crash and blocks compaction on a healthy store
    fs.delete(marker, false)
    fs.delete(staging, true)
    fs.delete(trashRoot, true)
  }

  /** Relative paths of the hive leaf partition dirs under `root`: the
    * deepest directories whose every path component is `col=value` AND that
    * actually hold data files. The file check is load-bearing for recovery:
    * a crashed swap leaves intermediate staging dirs whose leaves were
    * already renamed out — without it, recovery would mistake such an
    * EMPTIED intermediate dir for a leaf and swap it over a populated live
    * subtree. Hidden/metadata names (`_SUCCESS`, `.compact-trash`) are
    * skipped at both levels.
    */
  private def leafPartitionDirs(fs: FileSystem, root: Path): Seq[String] = {
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    def walk(dir: Path, rel: String): Seq[String] = {
      val entries = fs.listStatus(dir)
      val subDirs = entries.filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.contains("=") && visible(p.getName))
      val hasData = entries.exists(e => e.isFile && visible(e.getPath.getName))
      if (subDirs.isEmpty) { if (rel.nonEmpty && hasData) Seq(rel) else Seq.empty }
      else subDirs.toSeq.flatMap(p =>
        walk(p, if (rel.isEmpty) p.getName else s"$rel/${p.getName}"))
    }
    walk(root, "")
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
