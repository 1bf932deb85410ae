package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Batch ingestion: CRI log files → partitioned parquet (SURVEY §2 rows
  * S1-S5, K1, K7; §3.2).
  *
  * Scale notes: parsing is one `split` pass + one codegen timestamp
  * expression per line (whole-stage codegen end to end, no UDFs); the write
  * partitions on low-cardinality columns first (cluster/namespace/date/hour)
  * so directory fan-out stays bounded and namespace queries prune at the
  * listing level; `maxRecordsPerFile` bounds file size like the reference's
  * `total_file_size 1M` (fluent-bit.conf:42,59).
  */
object LogIngest {

  /** Kubernetes CRI pod-log path grammar (reference fluent-bit.conf:12-14
    * `Tag_Regex`): `/var/log/pods/<namespace>_<pod>_<pod_uid>/<container>/N.log`.
    */
  val podPathRegex = ".*/pods/([^_/]+)_([^_/]+)_([^_/]+)/([^/]+)/[^/]+\\.log$"

  /** Path exclusion — fluent-bit excludes its own logs to avoid a feedback
    * loop (fluent-bit.conf:15-16).
    */
  val defaultExcludeRegex = ".*/pods/[^/]*fluent-bit[^/]*/.*"

  /** Max line length guard ≙ `Skip_Long_Lines On` + 2M buffer cap
    * (fluent-bit.conf:18-20).
    */
  val defaultMaxLineBytes = 2 * 1024 * 1024

  /** Read raw CRI files and produce the canonical log DataFrame with path
    * metadata columns. `_metadata.file_path` is the hidden file-source column
    * (stable under task retries, unlike `input_file_name` in some plans).
    */
  def readCri(spark: SparkSession, glob: String, clusterName: String,
      nodeName: String = "local-node",
      excludeRegex: String = defaultExcludeRegex,
      maxLineBytes: Int = defaultMaxLineBytes): DataFrame = {
    val raw = spark.read.text(glob)
      .withColumn("file_path", col("_metadata.file_path"))
      .filter(!col("file_path").rlike(excludeRegex))
      .filter(octet_length(col("value")) < maxLineBytes)
    CriFunctions.parsed(raw, clusterName)
      .withColumn("namespace", regexp_extract(col("file_path"), podPathRegex, 1))
      .withColumn("pod", regexp_extract(col("file_path"), podPathRegex, 2))
      // group 3 = the pod UID (Tag_Regex captures it, fluent-bit.conf:12-14):
      // distinguishes two incarnations of one StatefulSet pod name — the
      // rebirth case the close-write ledger handles — so it rides as a
      // data column (high-cardinality: never a partition dir)
      .withColumn("pod_id", regexp_extract(col("file_path"), podPathRegex, 3))
      .withColumn("container", regexp_extract(col("file_path"), podPathRegex, 4))
      .withColumn("node", lit(nodeName))
      .withColumn("date", date_format(col("time"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("time"), "HH"))
      .drop("file_path")
  }

  /** Primary (idiomatic hive-layout) writer: partition pruning and partition
    * columns come free from Spark's `PartitioningAwareFileIndex` (SURVEY §1.3).
    *
    * Rows are repartitioned on the partition key first so each output
    * directory is written by one task — without this, every writer task that
    * sees every partition emits its own file, multiplying file count by the
    * task count (the small-files storm the compaction job exists to undo).
    * Partition granularity is a knob: hour-level prunes best when each hour
    * holds file-sized data (the 100 TB case); batch fixtures coarsen to date.
    */
  def writeHive(df: DataFrame, root: String,
      maxRecordsPerFile: Long = 1000000L,
      partitionCols: Seq[String] = LogSchema.hivePartitionColumns,
      atomic: Boolean = true): Unit = {
    // Fresh stores are created versioned so maintenance rewrites can swap
    // the whole tree atomically under readers: symlink-rooted when the path
    // RESOLVES to the local filesystem (VersionedStore — symlinks are a
    // local-FS primitive), pointer-file stores everywhere else, HDFS
    // included (GraftStore — appends resolve through `_current`). The tier
    // decision comes from the Hadoop FileSystem the path actually maps to,
    // NOT the URI scheme: a scheme-less path on a cluster whose
    // fs.defaultFS is HDFS must get the pointer tier, never a driver-local
    // symlink. Existing plain roots are appended to as-is. A concurrent
    // first writer can lose the init race — benign, the store the winner
    // created is exactly the one the loser wanted.
    //
    // APPENDS to an existing versioned store commit atomically through
    // [[AppendCommit]] (stage invisibly, publish by manifest-add/pointer
    // flip or hardlink/retarget): readers polling mid-append see none or
    // all of the batch, a crashed writer leaves zero visible rows, and the
    // commit bumps the version (grace snapshot + time travel apply). The
    // FIRST write of a fresh store still lands directly in v1: no reader
    // can hold a reference to a store that does not exist yet, so there is
    // no torn-read window to defend. `atomic=false` forces the legacy
    // in-place append (torn-visible; compaction's conflict detection is the
    // only guard) — for layouts the commit protocol cannot stage, e.g.
    // appends deeper than the store's partition column depth.
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isLocal = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    val existingVersioned =
      GraftStore.isPointerStore(spark, root) ||
        (isLocal && VersionedStore.isVersioned(rootPath.toUri.getPath))
    if (existingVersioned && atomic) {
      AppendCommit.commit(df, root, partitionCols, maxRecordsPerFile)
      return
    }
    ensureStore(spark, root)
    val dataDir = GraftStore.resolve(spark, root)
    df.repartition(partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .options(LogSchema.parquetBloomOptions)
      .mode("append")
      .parquet(dataDir)
    // stamp the pruning sidecar ([[FileStats]]): pre-existing files reuse
    // their lines by (key, len), so repeated appends footer-read only the
    // files this write added
    FileStats.refreshDir(spark, dataDir, FileStats.read(spark, dataDir))
  }

  /** Create the versioned store for `root` if nothing exists there yet —
    * symlink tier on the local filesystem, pointer tier everywhere else
    * (tier decision from the resolved Hadoop FileSystem, not the URI
    * scheme). Idempotent; losing a concurrent-creation race is benign.
    * A fresh store is EMPTY (v1 holds no data): the streaming sink relies
    * on this so its first micro-batch goes through the same atomic
    * [[AppendCommit]] as every later one — replayable by commit id.
    */
  def ensureStore(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isLocal = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    // stale-index cleanup runs ONLY when THIS process created the store:
    // losing the create race means a concurrent creator's stream may
    // already be bootstrapping its sibling index, and deleting it from the
    // loser would silently discard a freshly built index (self-healing via
    // the dataless guard, but at the cost of a full corpus rescan)
    if (isLocal) {
      val p = java.nio.file.Paths.get(rootPath.toUri.getPath)
      if (!java.nio.file.Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val created =
          try { VersionedStore.init(p.toString); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case e: IllegalArgumentException if e.getMessage.contains("already exists") => false
          }
        if (created) dropStaleSiblingIndexes(spark, root)
      }
    } else if (!fs.exists(rootPath)) {
      val created =
        try { GraftStore.init(spark, root); true }
        catch {
          case e: IllegalArgumentException if e.getMessage.contains("already") => false
        }
      if (created) dropStaleSiblingIndexes(spark, root)
    }
  }

  /** A FRESH store has no seen documents, so any surviving sibling dedup
    * index at the same path is a deleted store's ghost state — trusting it
    * would silently drop the new store's first documents as duplicates of
    * the dead corpus (the `.txns`-ledger resurrection hazard, one layer
    * out; [[graft.ext.StreamingDedup]] keeps a dataless-store guard as
    * defense in depth for stores created outside this path).
    */
  private def dropStaleSiblingIndexes(spark: SparkSession, root: String): Unit =
    Seq(GraftStore.DedupIndexSuffix, GraftStore.NearDupIndexSuffix).foreach { s =>
      val p = new Path(root.stripSuffix("/") + s)
      val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (pfs.exists(p)) pfs.delete(p, true)
    }

  /** Reference-compatible positional-layout writer (SURVEY §1.3; layout
    * y-logcli:5). Spark can only emit `k=v` directories, so this writes
    * hive-style into a scratch dir and renames directories to the positional
    * form — a metadata-only operation on any filesystem (and a server-side
    * copy on S3). Intended for fixtures and compat export; the hive layout is
    * the at-scale primary.
    */
  def writePositional(df: DataFrame, root: String,
      uploadTime: java.time.Instant = java.time.Instant.now()): Unit = {
    val spark = df.sparkSession
    val scratch = root.stripSuffix("/") + "/.graft-staging"
    // Path time segments come from UPLOAD wall-clock, exactly like the
    // reference (s3_key_format strftime evaluates at flush time,
    // fluent-bit.conf:45,67) — queries filter on the time COLUMN, never the
    // path time (y-logcli:166). This also bounds directory fan-out: one
    // minute bucket per batch, so files-per-batch = label combinations.
    val t = uploadTime.atZone(java.time.ZoneOffset.UTC)
    def f2(i: Int) = f"$i%02d"
    val full = df
      // pod_id is engine-side metadata; reference positional files carry
      // exactly the reference schema (fluent-bit.conf:66 contract)
      .drop("date", "hour", "pod_id")
      .withColumn("year", lit(t.getYear.toString))
      .withColumn("month", lit(f2(t.getMonthValue)))
      .withColumn("day", lit(f2(t.getDayOfMonth)))
      .withColumn("hour", lit(f2(t.getHour)))
      .withColumn("minute", lit(f2(t.getMinute)))
    full.write
      .partitionBy("cluster", "namespace", "year", "month", "day", "node",
        "pod", "container", "hour", "minute")
      .mode("overwrite")
      .parquet(scratch)

    val fs = FileSystem.get(new java.net.URI(scratch), spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val it = GraftStore.walkFiles(fs, new Path(scratch))
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toUri.getPath
      if (p.endsWith(".parquet")) {
        val rel = p.stripPrefix(new Path(scratch).toUri.getPath).stripPrefix("/")
        val segs = rel.split("/").toSeq
        val dirs = segs.init.map(_.split("=", 2)(1))
        val dest = new Path((rootPath.toUri.getPath +: dirs :+ segs.last).mkString("/"))
        fs.mkdirs(dest.getParent)
        fs.rename(f.getPath, dest)
      }
    }
    fs.delete(new Path(scratch), true)
  }
}
