package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style queryable METADATA TABLES over a versioned store: the
  * store's own manifests, commit records, statistics sidecars, and deletion
  * vectors exposed as DataFrames — so operational questions ("how many rows
  * landed per partition yesterday", "which files carry delete debt", "what
  * did commit N do") are ordinary Spark SQL over the metadata tier, with
  * ZERO data-file I/O.
  *
  * The reference answers these questions by listing S3 prefixes
  * (`y-logcli:106-123` globs, `test.sh:207-229` object counts); the engine's
  * stores already maintain richer metadata per commit ([[FileStats]],
  * [[GraftStore.CommitInfo]], [[DeleteVectors]]) — this module is the read
  * surface those sidecars deserve.
  *
  * Scale: every frame here is built from the listing/metadata tier — one
  * manifest walk plus one stats-sidecar object per version, never a data
  * footer. A 100 TB store answers `files()` by reading kilobytes. (The rows
  * materialize driver-side before becoming a DataFrame — bounded by the
  * sidecar, which is one line per file; at the ~10⁸-object extreme the same
  * sidecars would be sharded and read distributed, but their CONTENT is
  * already the right thing.)
  */
object MetaTables {

  final case class FileRow(key: String, bytes: Long, rows: Option[Long],
      min_time_ns: Option[Long], max_time_ns: Option[Long],
      min_pod: Option[String], max_pod: Option[String], stats_fresh: Boolean)

  final case class SnapshotRow(version: Int, is_current: Boolean,
      n_files: Long, bytes: Long, rows: Option[Long],
      op: Option[String], commit_id: Option[String],
      commit_millis: Option[Long])

  final case class DeleteRow(key: String, file_bytes: Long,
      deleted_positions: Long, n_ranges: Long)

  /** One row per data file of snapshot `version` (default: live), joined
    * with its statistics line. `stats_fresh = false` marks a file whose
    * sidecar line is absent or stale (length mismatch) — readers treat
    * those as unprunable, and `AdminCli stats --refresh=true` backfills.
    */
  def files(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val n = version.getOrElse(GraftStore.liveVersionOf(spark, root))
    val stats = FileStats.read(spark, GraftStore.resolveVersion(spark, root, n))
    GraftStore.compositeEntries(spark, root, n).map { e =>
      stats.get(e.key) match {
        case Some(s) if s.len == e.len =>
          FileRow(e.key, e.len, Some(s.rows), s.minNs, s.maxNs,
            s.minPod, s.maxPod, stats_fresh = true)
        case _ =>
          FileRow(e.key, e.len, None, None, None, None, None,
            stats_fresh = false)
      }
    }.toDF()
  }

  /** One row per retained snapshot: composite size, stats-summed row count
    * (None when the sidecar doesn't fully cover the snapshot), and the
    * commit record (op, id, wall-clock).
    */
  def snapshots(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    GraftStore.snapshots(spark, root).map { s =>
      val info = GraftStore.readCommitInfo(spark,
        GraftStore.resolveVersion(spark, root, s.version))
      SnapshotRow(s.version, s.current, s.files, s.bytes,
        rows = FileStats.rowCountFromStats(spark, root, s.version),
        op = info.map(_.op), commit_id = info.map(_.id),
        commit_millis = info.map(_.millis))
    }.toDF()
  }

  /** Pending deletion-vector debt of the live snapshot: one row per file
    * that carries deleted positions (merge-on-read rows the next compaction
    * will materialize away). Empty frame = no debt.
    */
  def deletes(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val n = GraftStore.liveVersionOf(spark, root)
    val entries = GraftStore.compositeEntries(spark, root, n)
      .map(e => (e.key, e.len)).toMap
    DeleteVectors.read(spark, GraftStore.resolveVersion(spark, root, n))
      .toSeq.sortBy(_._1).map { case (key, dv) =>
        DeleteRow(key, entries.getOrElse(key, dv.len),
          dv.positions, dv.ranges.size.toLong)
      }.toDF()
  }
}
