package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Small-files compaction (SURVEY §7.8): the reference's 1 MB-object design
  * (`total_file_size 1M`, fluent-bit.conf:42) produces ~10⁸ objects at
  * 100 TB; scan efficiency needs periodic rewrite into scan-sized files.
  *
  * INCREMENTAL since round 6: a commit rewrites ONLY the dirty partitions
  * (more than `dirtyMaxFiles` files, or multiple files averaging under
  * `dirtyMinAvgBytes`) and carries every untouched partition into the next
  * version without data I/O — so maintenance cost is proportional to dirty
  * data, not store size, which is the difference between "correct at sf1"
  * and "operable at 100 TB" (the same economics as Delta/Iceberg OPTIMIZE).
  * How a partition is carried depends on the tier:
  *  - pointer stores: by REFERENCE — a `_graft_manifest` beside the new
  *    version's data maps each carried partition to the version prefix that
  *    physically holds it ([[GraftStore.readManifest]]); zero bytes move.
  *  - symlink ([[VersionedStore]]) roots: by HARD LINK into the staged next
  *    version — metadata-only, same inodes, and the version dir stays
  *    self-contained so plain `spark.read.parquet(root)` keeps working.
  *  - legacy plain roots: untouched leaves are simply never swapped.
  *
  * Rewritten partitions are `sortWithinPartitions(time_ns)` (when present),
  * matching the finalize path (StreamFinalize.scala:142): near-disjoint
  * row-group time ranges keep the engine's `--since` row-group pruning
  * effective after compaction destroys ingest order.
  *
  * Swap protocol per tier (unchanged from round 5, all snapshot-isolated):
  *  - [[VersionedStore]] roots: promote staging to the next version dir and
  *    atomically retarget the symlink — ONE rename.
  *  - [[GraftStore]] pointer roots: stage under the next version prefix,
  *    flip `_current` with ONE atomic PUT (no rename on object stores).
  *  - legacy plain-dir roots: two metadata-only renames per dirty leaf.
  *
  * Crash safety: an in-flight marker (holding the expected TOTAL row count)
  * brackets the swap; recovery re-applies the verified staging tree /
  * staged version. Mutual exclusion: the whole operation holds the root's
  * [[MaintenanceLease]], so two compactors (or compaction racing retention
  * or vacuum) cannot interleave — the loser aborts before touching
  * anything.
  *
  * WRITERS are a separate discipline: appends land in the live version
  * directory, so rows appended after this job's inventory but before its
  * pointer/symlink flip could survive only in the grace snapshot, not the
  * new live tree. Like Delta/Iceberg OPTIMIZE under optimistic concurrency,
  * the commit DETECTS this instead of assuming it away: immediately before
  * the marker/flip it re-inventories the partitions whose files the commit
  * would replace (dirty partitions everywhere; every partition on the
  * hardlink-carry tier, where the carry is physical; plus the partition-dir
  * set on the pointer tier, where a brand-new partition would miss the
  * carry manifest) and ABORTS cleanly on any change — staged data is
  * removed, the live tree is untouched, and the writer's rows are safe.
  * Appends to partitions carried BY REFERENCE on the pointer tier are no
  * conflict at all: the new version lists the same physical directory, so
  * the appended files stay visible.
  */
/** How a compaction rewrite orders rows inside each rewritten partition. */
sealed trait ClusterSpec
object ClusterSpec {
  /** `time_ns` ascending (default): near-disjoint row-group time ranges,
    * best for the dominant `--since` range probe.
    */
  case object TimeMajor extends ClusterSpec
  /** Lexicographic by the given columns (e.g. `pod, time_ns`): the leading
    * column gets the narrowest per-row-group ranges; later columns stay
    * ordered within it.
    */
  final case class Lexicographic(cols: Seq[String]) extends ClusterSpec
  /** Morton-interleaved over the given columns: balanced stat narrowing
    * across all of them when no single probe dominates.
    */
  final case class ZOrder(cols: Seq[String]) extends ClusterSpec
  /** Hash-bucketed on `key` into `buckets` files per partition dir, rows
    * sorted by `key` within each bucket file — the STORE-level layout for a
    * dominant large-×-large join: `format("graft")` reads the rewritten
    * snapshot with a [[org.apache.spark.sql.catalyst.catalog.BucketSpec]]
    * (validated against the file names, see
    * [[graft.logs.GraftStore.readBucketSpec]]), so joins and aggregates on
    * `key` plan WITHOUT a shuffle exchange — the co-location is paid once
    * at maintenance time, not per query. The spec sidecar is fail-open: any
    * snapshot file without a parseable bucket id (a later plain append, a
    * partition carried from an unbucketed version) silently disables it and
    * the store reads like any other.
    */
  final case class BucketBy(key: String, buckets: Int) extends ClusterSpec
}

object Compaction {

  def compactHive(spark: SparkSession, root: String,
      maxRecordsPerFile: Long = 4000000L,
      partitionCols: Seq[String] = LogSchema.hivePartitionColumns,
      convertStreamingStore: Boolean = false,
      dirtyMaxFiles: Int = 4,
      dirtyMinAvgBytes: Long = 32L << 20,
      full: Boolean = false,
      retainSnapshots: Int = 1,
      cluster: ClusterSpec = ClusterSpec.TimeMajor): Unit =
    MaintenanceLease.withLease(spark, root, "compact") {
      if (GraftStore.isPointerStore(spark, root))
        compactPointerStore(spark, root, maxRecordsPerFile, partitionCols,
          convertStreamingStore, dirtyMaxFiles, dirtyMinAvgBytes, full,
          retainSnapshots, cluster)
      else
        compactRenameTiers(spark, root, maxRecordsPerFile, partitionCols,
          convertStreamingStore, dirtyMaxFiles, dirtyMinAvgBytes, full,
          retainSnapshots, cluster)
    }

  /** A partition needs rewrite when its file count exceeds `dirtyMaxFiles`,
    * or it holds several files averaging under `dirtyMinAvgBytes`. A
    * single-file partition is never dirty — rewriting it buys nothing.
    */
  private def isDirty(files: Seq[FileStatus], dirtyMaxFiles: Int,
      dirtyMinAvgBytes: Long): Boolean = {
    val n = files.size
    n > dirtyMaxFiles || (n > 1 && files.map(_.getLen).sum / n < dirtyMinAvgBytes)
  }

  /** The one data-moving step: shuffle the dirty rows onto their partition
    * keys (one task per output partition; AQE coalesces small ones) and
    * sort within tasks by the partition prefix + the clustering key, so
    * every rewritten file has narrow row-group stats on the clustered
    * columns — the explicit sort also satisfies the dynamic-partition
    * writer's required ordering, so Spark adds no second sort of its own.
    *
    * The clustering key is a maintenance knob ([[ClusterSpec]]):
    * time-major by default (near-disjoint `time_ns` row groups — `--since`
    * pruning), selector-major lexicographic (e.g. `pod, time_ns`: pod
    * equality prunes via narrow per-row-group pod ranges AND each pod's
    * rows stay time-ordered), or z-order interleaved (balanced pruning on
    * several dimensions at once when no single probe dominates).
    */
  private def rewrite(input: DataFrame, partitionCols: Seq[String],
      maxRecordsPerFile: Long, dest: String,
      cluster: ClusterSpec = ClusterSpec.TimeMajor): Unit = {
    cluster match {
      case ClusterSpec.BucketBy(key, buckets) =>
        rewriteBucketed(input, partitionCols, maxRecordsPerFile, dest, key, buckets)
        return
      case _ =>
    }
    val sortKey: Seq[org.apache.spark.sql.Column] = cluster match {
      case ClusterSpec.TimeMajor =>
        Seq("time_ns").filter(input.columns.contains).map(col)
      case ClusterSpec.Lexicographic(cols) =>
        cols.map(col)
      case ClusterSpec.ZOrder(cols) =>
        // bounds for integral dims come from one bounded agg over the data
        // being rewritten — the same measure-then-encode shape Delta uses
        val schema = input.schema
        val dims = cols.map(c => (col(c), schema(c).dataType))
        val numeric = cols.filter(c =>
          schema(c).dataType != org.apache.spark.sql.types.StringType)
        val stats: Map[String, (Long, Long)] =
          if (numeric.isEmpty) Map.empty
          else {
            val row = input.agg(
              numeric.flatMap(c => Seq(min(col(c)).cast("long"),
                max(col(c)).cast("long"))).head,
              numeric.flatMap(c => Seq(min(col(c)).cast("long"),
                max(col(c)).cast("long"))).tail: _*).head()
            numeric.zipWithIndex.map { case (c, i) =>
              val mn = if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)
              val mx = if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1)
              (c, (mn, mx))
            }.toMap
          }
        val bounds = cols.map(c => stats.getOrElse(c, (0L, 0L)))
        Seq(graft.expr.ZOrderFunctions.zorder64(dims, bounds))
    }
    input
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols.map(col) ++ sortKey): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      // rewrites preserve the write path's physical contracts: selector-
      // column bloom filters survive compaction like the clustering sort
      .options(LogSchema.parquetBloomOptions)
      .mode("overwrite")
      .parquet(dest)
  }

  /** Bucketed rewrite ([[ClusterSpec.BucketBy]]): Spark's bucketed-table
    * writer is the only code path that names files with the bucket-id
    * suffix the scan's parser recognizes, and it is catalog-routed — so the
    * rewrite registers a throwaway EXTERNAL table at `dest` under a unique
    * name and drops it immediately (the files stay; only the catalog entry
    * goes). The pre-write `repartition(buckets, key)` maps each bucket to
    * exactly one task (`HashPartitioning.partitionIdExpression` is the same
    * `pmod(murmur3, n)` the bucket id uses), so every (partition dir,
    * bucket) is one file and the write adds no extra sort pass beyond the
    * per-file `sortBy`. The `_graft_bucketspec` sidecar committed beside
    * the data is what `format("graft")` validates and honors.
    */
  private def rewriteBucketed(input: DataFrame, partitionCols: Seq[String],
      maxRecordsPerFile: Long, dest: String, key: String, buckets: Int): Unit = {
    val spark = input.sparkSession
    val tmp = s"graft_bucket_rewrite_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    try {
      input
        .repartition(buckets, col(key))
        .write
        .partitionBy(partitionCols: _*)
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", dest)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .options(LogSchema.parquetBloomOptions)
        .mode("overwrite")
        .saveAsTable(tmp)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tmp")
  }

  /** Commit the `_graft_bucketspec` claim for a staged snapshot — but only
    * when it is TRUE of every file the snapshot will hold: either nothing
    * was carried (full bucketed rewrite), or the carried files came from a
    * version claiming the SAME (key, buckets) — files bucketed under a
    * different modulus carry parseable ids that mean the wrong thing, and a
    * name-level check cannot tell (`pmod(hash, 8)` vs `pmod(hash, 16)` both
    * name `_00003`), so the claim must be provenance-gated here, not
    * validated away on the read side.
    */
  private def commitBucketSpec(spark: SparkSession, cluster: ClusterSpec,
      priorDir: String, destDir: String, anyCarried: Boolean): Unit =
    cluster match {
      case ClusterSpec.BucketBy(key, buckets) =>
        if (!anyCarried ||
            GraftStore.readBucketSpec(spark, priorDir).contains((key, buckets)))
          GraftStore.writeBucketSpec(spark, destDir, key, buckets)
      case _ =>
    }

  private[logs] def visible(n: String) = GraftStore.visibleName(n)

  /** Test seam: runs after staging is verified, immediately before the
    * concurrent-writer re-inventory — the only way to deterministically
    * exercise the conflict window in a spec.
    */
  private[graft] var onBeforeCommit: () => Unit = () => ()

  /** Identity of a file set for conflict detection: path + length + mtime.
    * An append, replace, or delete by a concurrent writer changes the set;
    * source files this job never touches keep theirs.
    */
  private def fileIdentity(files: Seq[FileStatus]): Set[(String, Long, Long)] =
    files.map(f => (f.getPath.toString, f.getLen, f.getModificationTime)).toSet

  private[logs] def dataFilesUnder(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    if (!fs.exists(dir)) return Seq.empty
    val it = GraftStore.walkFiles(fs, dir)
    val out = Seq.newBuilder[FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (visible(f.getPath.getName)) out += f
    }
    out.result()
  }

  /** Partition dirs at exactly `depth` `col=` levels below `root`, each with
    * ALL data files recursively below it. Dirtiness and swapping operate at
    * the REWRITE granularity (`partitionCols.length`), not at the deepest
    * physical level: a store laid out deeper than the rewrite key (e.g.
    * hour= under date= when compacting to date) must treat the whole
    * rewrite-level dir as one unit, or an incremental swap would replace a
    * populated subtree with a partial one.
    */
  private[logs] def partitionLeaves(fs: FileSystem, root: Path,
      depth: Int): Seq[(String, Seq[FileStatus])] = {
    def walk(dir: Path, rel: String, d: Int): Seq[(String, Seq[FileStatus])] =
      if (d == 0) {
        val fl = dataFilesUnder(fs, dir)
        if (fl.nonEmpty) Seq((rel, fl)) else Seq.empty
      } else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
          visible(s.getPath.getName))
        .flatMap(s => walk(s.getPath,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}", d - 1))
    if (!fs.exists(root)) Seq.empty else walk(root, "", depth)
  }

  /** Rename tiers: symlink-versioned roots and legacy plain dirs. */
  private def compactRenameTiers(spark0: SparkSession, root: String,
      maxRecordsPerFile: Long, partitionCols: Seq[String],
      convertStreamingStore: Boolean, dirtyMaxFiles: Int,
      dirtyMinAvgBytes: Long, full: Boolean, retainSnapshots: Int,
      cluster: ClusterSpec): Unit = {
    // keep partition dir names byte-identical: type inference would read
    // 'hour=00' back as int 0 and rewrite the dir as 'hour=0', forking the
    // partition from future string-valued appends. Scoped to a CLONED
    // session (ConfScope) — flipping the shared session's conf would
    // disable the metadata-only planner tier for every concurrent query
    // for the duration of the rewrite (the round-14 bench failure).
    graft.ConfScope.withSessionConf(spark0,
      "spark.sql.sources.partitionColumnTypeInference.enabled" -> "false") { spark =>
      compactRenameTiersOn(spark, root, maxRecordsPerFile, partitionCols,
        convertStreamingStore, dirtyMaxFiles, dirtyMinAvgBytes, full,
        retainSnapshots, cluster)
    }
  }

  private def compactRenameTiersOn(spark: SparkSession, root: String,
      maxRecordsPerFile: Long, partitionCols: Seq[String],
      convertStreamingStore: Boolean, dirtyMaxFiles: Int,
      dirtyMinAvgBytes: Long, full: Boolean, retainSnapshots: Int,
      cluster: ClusterSpec): Unit = {
    // the rename-based tiers below require an atomic rename primitive;
    // object-store "rename" is copy+delete, so a plain (pre-pointer) store
    // there must be migrated, not silently swapped with a seconds-long
    // partition-missing window per leaf
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse("file")
    require(!GraftStore.objectStoreSchemes.contains(scheme),
      s"$root is a plain directory on an object store ($scheme), where rename " +
        "is non-atomic copy+delete. Create the store with LogIngest.writeHive " +
        "(pointer-versioned) or migrate it: copy the tree under <root>/v000001 " +
        "and GraftStore.init-style-write <root>/_current")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(root)
    val staging = new Path(root + ".compact-staging")
    val marker = new Path(root + ".compact-inflight")
    locally {
      if (fs.exists(marker)) {
        // A previous run crashed between swap start and verified cleanup.
        // Staging was verified complete before the marker was written, so it
        // is authoritative — re-apply it rather than re-staging from a live
        // tree that may have lost a partition mid-commit.
        val expected = readMarker(fs, marker)
        if (VersionedStore.isVersioned(root)) {
          recoverVersioned(spark, root, staging, marker, fs, expected, retainSnapshots)
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
      val leaves = partitionLeaves(fs, live, partitionCols.length)
      // deletion vectors: vector-holding partitions are dirty by definition
      // (the rewrite materializes their deletes); plain legacy roots cannot
      // acquire vectors (deleteWhere refuses them) and stay vector-free
      val dvCur = DeleteVectors.read(spark, root)
      require(dvCur.isEmpty || VersionedStore.isVersioned(root),
        s"$root is a plain directory carrying a deletion-vector sidecar — " +
          "unsupported; vectors commit only on versioned stores")
      val dvRels = dvCur.keySet.map { k =>
        k.split('/').filter(_.nonEmpty).take(partitionCols.length).mkString("/")
      }
      val dirty = leaves.filter(l =>
        full || dvRels(l._1) || isDirty(l._2, dirtyMaxFiles, dirtyMinAvgBytes))
      if (dirty.isEmpty) return // every partition already compact: no commit
      // vector-applied expected count: the invariant below is "live ROWS
      // unchanged", and with vectors the live rows are the applied view
      val expectedRows =
        if (dvCur.isEmpty) spark.read.parquet(root).count() // footer metadata only
        else GraftStore.readStore(spark, root).count()
      // overlay via the symlink (legacy plain roots never have one)
      val overlay = GraftStore.readSchemaOverlay(spark, root)
      val input = {
        val r = spark.read.option("basePath", root)
        val r2 = if (overlay.nonEmpty) r.option("mergeSchema", "true") else r
        val df0 = r2.parquet(dirty.map(d => s"$root/${d._1}"): _*)
        val df = GraftStore.applyOverlay(
          if (dvCur.nonEmpty) DeleteVectors.tagMeta(df0) else df0, overlay)
        if (dvCur.nonEmpty)
          DeleteVectors.applyTo(spark, df, dvCur, FileStats.listDirEntries(spark, root))
        else df
      }
      val dirtyRows = input.count()
      rewrite(input, partitionCols, maxRecordsPerFile, staging.toString, cluster)
      if (VersionedStore.isVersioned(root))
        GraftStore.carrySchemaOverlay(spark, root, staging.toString)
      // verify the rewrite BEFORE touching the live tree — a short row count
      // means lost data and must abort while the original is still in place
      val stagedRows = spark.read.parquet(staging.toString).count()
      require(stagedRows == dirtyRows,
        s"compaction wrote $stagedRows rows, expected $dirtyRows; aborting with $live untouched")
      // Optimistic concurrency: the swap replaces files captured at
      // inventory time, so a writer landing after it would have its rows
      // silently dropped — for EXACTLY the leaves the commit replaces:
      // every leaf on the hardlink tier (the carry is physical), only the
      // dirty leaves on the legacy tier (untouched leaves are never
      // renamed there, so appends to them are harmless and must not abort
      // an otherwise-finished rewrite). Verify nothing in scope moved and
      // abort cleanly BEFORE the marker — staging without a marker is
      // swept, the live tree is still complete, the writer's rows are safe.
      def abortOnWriterChange(scope: Set[String], detectNewPartitions: Boolean): Unit = {
        onBeforeCommit()
        val nowAll = partitionLeaves(fs, live, partitionCols.length)
        // On the versioned tier the staged tree REPLACES the whole root, so
        // a partition dir born after inventory (not in any scope) would be
        // silently absent from the promoted version — the same row-loss the
        // pointer tier's newOwnRels check defends. The legacy tier never
        // swaps untouched leaves, so new partitions are harmless there.
        val newRels =
          if (detectNewPartitions) nowAll.map(_._1).toSet -- leaves.map(_._1).toSet
          else Set.empty[String]
        val now = nowAll.filter(l => scope(l._1))
        val before = leaves.filter(l => scope(l._1))
        if (newRels.nonEmpty ||
            fileIdentity(now.flatMap(_._2)) != fileIdentity(before.flatMap(_._2))) {
          fs.delete(staging, true)
          throw new IllegalStateException(
            s"concurrent writer detected on $root during compaction" +
              (if (newRels.nonEmpty) s" (new partitions: [${newRels.mkString(",")}])"
               else "") +
              "; staging removed, live tree untouched — re-run compaction " +
              "after the writer finishes (maintenance requires the store " +
              "quiescent or it aborts, never loses rows)")
        }
      }
      if (VersionedStore.isVersioned(root)) {
        // carry every untouched partition into the staged tree by hard link
        // (metadata-only, same inodes) so the promoted version dir stays
        // self-contained and plain reads through the symlink keep working
        val dirtyRels = dirty.map(_._1).toSet
        hardLinkCarry(leaves.filterNot(l => dirtyRels(l._1)), staging, live)
        commitBucketSpec(spark, cluster, priorDir = root,
          destDir = staging.toString,
          anyCarried = leaves.exists(l => !dirtyRels(l._1)))
        // carried files keep their vectors; rewritten files shed them
        // (materialized by the vector-applied input above)
        val stagedDv = DeleteVectors.carryInto(spark, root, staging.toString,
          FileStats.listDirEntries(spark, staging.toString).map(_.key).toSet)
        val totalStaged =
          if (stagedDv.isEmpty) spark.read.parquet(staging.toString).count()
          else DeleteVectors.applyTo(spark,
            DeleteVectors.tagMeta(spark.read.parquet(staging.toString)),
            stagedDv, FileStats.listDirEntries(spark, staging.toString)).count()
        require(totalStaged == expectedRows,
          s"staging holds $totalStaged rows, expected $expectedRows; aborting with $live untouched")
        abortOnWriterChange(leaves.map(_._1).toSet, detectNewPartitions = true)
        writeMarker(fs, marker, expectedRows)
        commitVersioned(spark, root, staging, marker, fs, expectedRows, retainSnapshots)
      } else {
        // legacy tier: only the dirty leaves are staged, so only they swap;
        // untouched leaves are never renamed at all
        abortOnWriterChange(dirty.map(_._1).toSet, detectNewPartitions = false)
        writeMarker(fs, marker, expectedRows)
        applyStaging(spark, live, staging, marker, fs, expectedRows)
      }
    }
  }

  /** Carry untouched partitions into the staged next version with hard
    * links: one metadata syscall per file, zero data movement, and the
    * carried file keeps its name+size (and inode), so a snapshot diff shows
    * it as unchanged. Falls back to a copy on filesystems without link
    * support (the symlink tier is local-FS by contract, so this is a
    * safety net, not a path).
    */
  private[logs] def hardLinkCarry(leaves: Seq[(String, Seq[FileStatus])],
      staging: Path, liveRoot: Path): Unit = {
    import java.nio.file.{Files, Paths}
    // preserve the full physical layout below the carry root, including
    // levels deeper than the rewrite key (e.g. hour= under date=), by
    // RELATIVIZING against the root the leaves were listed from — a
    // substring search for "/<rel>/" would mis-root the carried file when
    // the store's own path happens to contain a partition-shaped dir name
    // (e.g. a root named ".../date=2024-01-01/store")
    val base = Paths.get(liveRoot.toUri.getPath).toAbsolutePath.normalize()
    leaves.foreach { case (_, files) =>
      files.foreach { f =>
        val src = Paths.get(f.getPath.toUri.getPath)
        val relFile = base.relativize(src.toAbsolutePath.normalize()).toString
        require(!relFile.startsWith(".."),
          s"carried file $src is outside the live root $base")
        val dst = Paths.get(staging.toUri.getPath, relFile)
        Files.createDirectories(dst.getParent)
        try Files.createLink(dst, src)
        catch {
          case _: UnsupportedOperationException => Files.copy(src, dst)
        }
      }
    }
  }

  /** Object-store (pointer) tier: stage ONLY the dirty partitions under the
    * NEXT version prefix — readers only ever list the pointed-at prefix, so
    * staging is invisible — write the carried-partition manifest beside
    * them, verify the composite, persist the marker, then commit by
    * overwriting `_current` with ONE atomic PUT. No rename anywhere, which
    * is what object stores (rename = copy+delete, non-atomic) require.
    * Carried partitions chain to the version that PHYSICALLY holds them
    * (an entry carried across N commits still names its original prefix),
    * and cleanup keeps the manifest closure of every retained snapshot.
    */
  private def compactPointerStore(spark0: SparkSession, root: String,
      maxRecordsPerFile: Long, partitionCols: Seq[String],
      convertStreamingStore: Boolean, dirtyMaxFiles: Int,
      dirtyMinAvgBytes: Long, full: Boolean, retainSnapshots: Int,
      cluster: ClusterSpec): Unit =
    // inference pinned off on a CLONED session, never the shared one — see
    // compactRenameTiers for the byte-identical-dir-names rationale and the
    // concurrency hazard a shared-session flip creates
    graft.ConfScope.withSessionConf(spark0,
      "spark.sql.sources.partitionColumnTypeInference.enabled" -> "false") { spark =>
      compactPointerStoreOn(spark, root, maxRecordsPerFile, partitionCols,
        convertStreamingStore, dirtyMaxFiles, dirtyMinAvgBytes, full,
        retainSnapshots, cluster)
    }

  private def compactPointerStoreOn(spark: SparkSession, root: String,
      maxRecordsPerFile: Long, partitionCols: Seq[String],
      convertStreamingStore: Boolean, dirtyMaxFiles: Int,
      dirtyMinAvgBytes: Long, full: Boolean, retainSnapshots: Int,
      cluster: ClusterSpec): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, "_compact-inflight")
    locally {
      if (fs.exists(marker)) {
        // marker certifies the newest version prefix is a verified complete
        // snapshot (data + manifest): finish the flip, re-verify, clean up
        val expected = readMarker(fs, marker)
        val prev = GraftStore.currentVersion(spark, root)
        val newest = GraftStore.listVersions(spark, root).max
        if (newest > prev) GraftStore.writePointer(spark, root, newest)
        val liveRows = GraftStore.readStore(spark, root).count()
        require(liveRows == expected,
          s"recovered count $liveRows != expected $expected — inspect $root")
        fs.delete(marker, false)
        cleanupPointer(spark, root, retainSnapshots)
        return
      }
      // version prefixes AHEAD of the pointer without a marker are debris
      // from an attempt that died mid-stage; versions BEHIND it are grace
      // snapshots for in-flight readers and die only at commit below
      val cur = GraftStore.currentVersion(spark, root)
      GraftStore.listVersions(spark, root).filter(_ > cur).foreach { n =>
        fs.delete(new Path(root, GraftStore.versionPrefix(n)), true)
      }
      val curDir = s"$root/${GraftStore.versionPrefix(cur)}"
      val sinkLog = new Path(curDir, "_spark_metadata")
      if (fs.exists(sinkLog)) {
        require(convertStreamingStore,
          s"$root was written by the streaming sink (_spark_metadata present); " +
            "stop the streaming query and pass convertStreamingStore=true")
        fs.delete(sinkLog, true)
      }
      // composite partition inventory: the current prefix's own leaves plus
      // everything its manifest carries; a partition can span both (appends
      // after a carry), in which case its file set is the union
      val depth = partitionCols.length
      val curPrefix = GraftStore.versionPrefix(cur)
      val own = partitionLeaves(fs, new Path(curDir), depth)
        .map { case (rel, fls) => (rel, curPrefix, fls) }
      val carried = GraftStore.readManifest(spark, curDir).map { case (h, rel) =>
        (rel, h, dataFilesUnder(fs, new Path(s"$root/$h/$rel")))
      }
      val byRel = (own ++ carried).groupBy(_._1)
      // deletion vectors ([[DeleteVectors]]): rewritten partitions read
      // vector-APPLIED and come out clean (materialization); carried files
      // keep their vectors. All counts below are in vector-applied terms so
      // the marker/recovery invariant stays "the live row count is
      // unchanged" whether or not vectors exist.
      val curEntries = GraftStore.compositeEntries(spark, root, cur)
      val curKeys = curEntries.map(_.key).toSet
      val dvCur = DeleteVectors.read(spark, curDir).filter { case (k, _) => curKeys(k) }
      // a partition holding vectored files is worth rewriting even when its
      // file count looks healthy: materialization retires the read-side
      // anti-join debt (Delta's OPTIMIZE-applies-DVs contract)
      val dvRels = dvCur.keySet.map { k =>
        val segs = k.split('/').filter(_.nonEmpty)
        segs.take(depth).mkString("/")
      }
      val dirtyRels = byRel.collect { case (rel, legs)
        if full || dvRels(rel) ||
          isDirty(legs.flatMap(_._3), dirtyMaxFiles, dirtyMinAvgBytes) => rel
      }.toSet
      if (dirtyRels.isEmpty) return // every partition already compact
      // stats-backed when the sidecar fully covers the snapshot (metadata
      // reads, not 10⁸ footer opens); footer-count fallback otherwise
      val expectedRows = FileStats.rowCountFromStats(spark, root, cur)
        .map(_ - DeleteVectors.totalPositions(dvCur))
        .getOrElse(GraftStore.readVersion(spark, root, cur).count())
      val next = cur + 1
      val nextDir = s"$root/${GraftStore.versionPrefix(next)}"
      // read ONLY the dirty partitions, one leg per version prefix that
      // physically holds some of them
      // overlay-aware legs: pre-evolution files null-backfill the evolved
      // columns, so the rewrite MATERIALIZES them — the overlay shrinks to
      // irrelevance as maintenance touches partitions
      val overlay = GraftStore.readSchemaOverlay(spark, curDir)
      val inputRaw = byRel.filter(e => dirtyRels(e._1)).values.flatten.toSeq
        .groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (h, legs) =>
          val vdir = s"$root/$h"
          val r = spark.read.option("basePath", vdir)
          val r2 = if (overlay.nonEmpty) r.option("mergeSchema", "true") else r
          val df0 = r2.parquet(legs.map(l => s"$vdir/${l._1}"): _*)
          GraftStore.applyOverlay(
            if (dvCur.nonEmpty) DeleteVectors.tagMeta(df0) else df0, overlay)
        }
        .reduce(_.unionByName(_))
      // vector-applied input: the rewrite writes the dirty partitions CLEAN
      // (vectors for files outside the dirty set are inert — no row matches)
      val input =
        if (dvCur.nonEmpty) DeleteVectors.applyTo(spark, inputRaw, dvCur, curEntries)
        else inputRaw
      rewrite(input, partitionCols, maxRecordsPerFile, nextDir, cluster)
      GraftStore.carrySchemaOverlay(spark, curDir, nextDir)
      // carry every untouched partition by reference, chained to the holder
      // (version prefix or staged-append dir) that physically holds its
      // files — zero data movement
      val carryEntries = byRel.filter(e => !dirtyRels(e._1)).values.flatten.toSeq
        .collect { case (rel, h, fls) if fls.nonEmpty => (h, rel) }
        .sortBy(e => (e._2, e._1))
      if (carryEntries.nonEmpty)
        GraftStore.writeManifest(spark, nextDir, carryEntries)
      commitBucketSpec(spark, cluster, priorDir = curDir, destDir = nextDir,
        anyCarried = carryEntries.nonEmpty)
      // per-file pruning stats ([[FileStats]]), O(delta): carried partitions
      // reuse the predecessor's lines by (key, len); only the rewritten
      // files are footer-read. Written before the staged verify (which they
      // accelerate) and pre-flip, so stats publish with the snapshot.
      val nextEntries = GraftStore.compositeEntries(spark, root, next)
      // rewritten files shed their vectors (materialized above); carried
      // files keep theirs — filter the sidecar to keys still in the snapshot
      val dvNext = DeleteVectors.carryInto(spark, curDir, nextDir,
        nextEntries.map(_.key).toSet)
      FileStats.refreshInto(spark, nextDir, nextEntries,
        FileStats.read(spark, curDir))
      val stagedRows = FileStats.rowCountFromStats(spark, root, next)
        .map(_ - DeleteVectors.totalPositions(dvNext))
        .getOrElse(GraftStore.readVersion(spark, root, next).count())
      require(stagedRows == expectedRows,
        s"staged snapshot holds $stagedRows rows, expected $expectedRows; " +
          s"aborting with $curDir live")
      onBeforeCommit()
      // Optimistic concurrency: the staged snapshot fixes (a) the dirty
      // partitions' contents and (b) the carry manifest's partition-dir
      // set, both as of inventory time. A writer can only land in the live
      // prefix, so conflicts are: new files under a dirty partition, or a
      // NEW own-partition dir (brand-new partition, or the first live-
      // prefix files of a partition previously held only by reference) —
      // either would vanish from the flipped snapshot. Appends to a
      // partition dir the manifest carries are NOT conflicts: the new
      // version lists that same physical dir, so the files stay visible.
      // Abort BEFORE the marker — the staged prefix is markerless debris
      // the next run sweeps; nothing live moved.
      val ownNowByRel = partitionLeaves(fs, new Path(curDir), depth).toMap
      val newOwnRels = ownNowByRel.keySet -- own.map(_._1).toSet
      val dirtyChanged = dirtyRels.filter { rel =>
        val before = fileIdentity(byRel(rel).flatMap(_._3))
        val carriedNow = byRel(rel).collect { case (r, h, _) if h != curPrefix =>
          dataFilesUnder(fs, new Path(s"$root/$h/$r"))
        }.flatten
        before != fileIdentity(ownNowByRel.getOrElse(rel, Seq.empty) ++ carriedNow)
      }
      if (newOwnRels.nonEmpty || dirtyChanged.nonEmpty) {
        fs.delete(new Path(nextDir), true)
        throw new IllegalStateException(
          s"concurrent writer detected on $root during compaction " +
            s"(new partitions: [${newOwnRels.mkString(",")}], changed: " +
            s"[${dirtyChanged.mkString(",")}]); staged version removed, " +
            "live store untouched — re-run compaction after the writer " +
            "finishes (maintenance aborts on a racing writer, never loses rows)")
      }
      GraftStore.writeCommitInfo(spark, nextDir, GraftStore.CommitInfo(
        "compact", java.util.UUID.randomUUID().toString, System.currentTimeMillis()))
      // pre-flight re-check before the marker lands (a racing commit's
      // flip would also have swept this staged prefix)
      if (GraftStore.currentVersion(spark, root) != cur) {
        fs.delete(new Path(nextDir), true)
        throw new IllegalStateException(
          s"concurrent commit detected on $root during compaction publish " +
            s"(expected v$cur live); staged version removed — re-run compaction")
      }
      writeMarker(fs, marker, expectedRows)
      // THE commit: compare-and-swap where the store supports conditional
      // writes, re-check + plain PUT elsewhere (see casWritePointer)
      if (!GraftStore.casWritePointer(spark, root, cur, next)) {
        fs.delete(marker, false)
        fs.delete(new Path(nextDir), true)
        throw new IllegalStateException(
          s"concurrent commit detected on $root during compaction publish " +
            s"(expected v$cur live); staged version removed — re-run compaction")
      }
      val liveRows = GraftStore.readStore(spark, root).count()
      require(liveRows == expectedRows,
        s"post-commit count $liveRows != expected $expectedRows — inspect $root")
      fs.delete(marker, false)
      cleanupPointer(spark, root, retainSnapshots)
    }
  }

  /** Reclaim after a pointer commit: keep the live version, the newest
    * `retainSnapshots` versions below it (grace snapshots for in-flight
    * readers / time travel), and the manifest closure of all of them —
    * a version physically holding carried partitions lives as long as any
    * retained snapshot references it.
    */
  private def cleanupPointer(spark: SparkSession, root: String,
      retainSnapshots: Int): Unit = {
    val live = GraftStore.currentVersion(spark, root)
    val versions = GraftStore.listVersions(spark, root)
    val seed = versions.filter(_ < live).takeRight(retainSnapshots).toSet + live
    val keep = GraftStore.closureOf(spark, root, seed)
    GraftStore.dropVersionsExcept(spark, root, keep)
    // compaction absorbs append-dir files into version prefixes; once no
    // retained snapshot references a staged dir it is reclaimable (the 24 h
    // age guard protects writers staging concurrently with this commit)
    GraftStore.sweepOrphanAppendDirs(spark, root, keep, 24L * 3600 * 1000)
  }

  /** Versioned-store commit: promote the verified staging tree to the next
    * version directory (one rename — readers never look there), then retarget
    * the root symlink atomically. A reader resolving the root at ANY instant
    * sees the complete old version or the complete new one; there is no
    * missing-partition window at all, unlike the per-leaf swap below.
    */
  private def commitVersioned(spark: SparkSession, root: String, staging: Path,
      marker: Path, fs: FileSystem, expectedRows: Long,
      retainSnapshots: Int): Unit = {
    val prev = VersionedStore.currentVersion(root)
    val next = VersionedStore.listVersions(root).max + 1
    val versionDir = new Path(VersionedStore.versionName(root, next))
    GraftStore.writeCommitInfo(spark, staging.toString, GraftStore.CommitInfo(
      "compact", java.util.UUID.randomUUID().toString, System.currentTimeMillis()))
    // pruning stats for the promoted tree: hard-link-carried files keep
    // their rel key+len and reuse the replaced version's lines; only the
    // rewritten files are footer-read
    FileStats.refreshDir(spark, staging.toString,
      FileStats.read(spark, VersionedStore.versionName(root, prev)))
    require(fs.rename(staging, versionDir), s"rename $staging -> $versionDir failed")
    VersionedStore.retarget(root, next)
    val liveRows = GraftStore.readStore(spark, root).count() // vector-applied
    require(liveRows == expectedRows,
      s"post-swap count $liveRows != expected $expectedRows — inspect $root")
    fs.delete(marker, false)
    // keep the newest retainSnapshots REPLACED versions (anchored at the
    // version the pointer actually named — a debris dir ahead of it must
    // not displace the real grace snapshot) for in-flight readers /
    // time travel; reclaimed by later commits
    val keep = VersionedStore.listVersions(root).filter(_ <= prev)
      .takeRight(retainSnapshots).toSet + next
    VersionedStore.dropVersionsExcept(root, keep)
  }

  /** Versioned-store crash recovery: if staging survived, the commit never
    * promoted it — finish the commit. Otherwise a version dir ahead of the
    * pointer holds the verified rewrite — retarget to it. Both paths are
    * idempotent: re-running after a second crash converges.
    */
  private def recoverVersioned(spark: SparkSession, root: String, staging: Path,
      marker: Path, fs: FileSystem, expectedRows: Long,
      retainSnapshots: Int): Unit = {
    if (fs.exists(staging)) {
      commitVersioned(spark, root, staging, marker, fs, expectedRows, retainSnapshots)
    } else {
      val prev = VersionedStore.currentVersion(root)
      val newest = VersionedStore.listVersions(root).max
      if (newest > prev) VersionedStore.retarget(root, newest)
      val liveRows = GraftStore.readStore(spark, root).count() // vector-applied
      require(liveRows == expectedRows,
        s"recovered count $liveRows != expected $expectedRows — inspect $root")
      fs.delete(marker, false)
      val keep = VersionedStore.listVersions(root).filter(_ <= prev)
        .takeRight(retainSnapshots).toSet + newest
      VersionedStore.dropVersionsExcept(root, keep)
    }
  }

  /** Swap each STAGED leaf partition directory with two single renames: the
    * old leaf moves to a hidden `.compact-trash` dir inside the live root
    * (names starting with `.` are pruned by Spark's file listing, so readers
    * never see trash as a partition), then the staged leaf renames in. Only
    * dirty leaves are staged, so untouched partitions are never renamed at
    * all; the live root is never renamed away, and a partition's unreadable
    * window is two metadata operations — not the per-file delete+rename a
    * job commit does.
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
    // ≥, not ==: on this tier untouched leaves are never swapped, so a
    // concurrent append to one (legal — the conflict check deliberately
    // scopes to the dirty leaves) GROWS the store mid-commit. Loss still
    // trips the wire; benign growth must not wedge an otherwise-complete
    // swap (or its crash recovery) behind a spurious mismatch.
    require(liveRows >= expectedRows,
      s"post-swap count $liveRows < expected $expectedRows — inspect $live against $staging")
    // refresh the pruning sidecar on stores that carry one (untouched files
    // reuse their lines; swapped leaves are footer-read). Stat-less plain
    // stores stay stat-less — backfill is FileStats.refresh, not compaction.
    val priorStats = FileStats.read(spark, live.toString)
    if (priorStats.nonEmpty) FileStats.refreshDir(spark, live.toString, priorStats)
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
