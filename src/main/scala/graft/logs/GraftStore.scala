package graft.logs

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Pointer-file store tier — the object-store analogue of [[VersionedStore]].
  *
  * Object stores have no symlinks and no atomic rename (rename is
  * copy+delete, which [[graft.sources.S3LiteFileSystem]] demonstrates
  * in-sandbox), but a single-object PUT IS atomic. So the store root holds
  * version prefixes (`<root>/v000001`, `v000002`, ...) plus one tiny pointer
  * object `<root>/_current` naming the live version; a maintenance commit
  * writes the whole replacement tree under the next prefix — invisible to
  * readers, who only ever list the pointed-at prefix — verifies it, then
  * flips the pointer with one PUT. Readers resolving at any instant get the
  * complete old tree or the complete new tree. This is the manifest
  * "current pointer" commit (Iceberg's version-hint file) without the
  * manifest machinery: partition listing still comes from the filesystem,
  * only the root is indirected.
  *
  * `resolve` is the read-side contract: every engine path that opens a hive
  * store goes through it (plain dirs and symlink roots pass through
  * unchanged, so the three tiers share one code path).
  */
object GraftStore {

  val PointerName = "_current"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionPrefix(n: Int): String = f"v$n%06d"

  def isPointerStore(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root, PointerName)
    fsOf(spark, p).exists(p)
  }

  /** Data root readers should scan: `<root>/<version>` for pointer stores,
    * `root` itself otherwise (symlinks resolve in the filesystem).
    */
  def resolve(spark: SparkSession, root: String): String =
    if (isPointerStore(spark, root)) s"$root/${readPointer(spark, root)}"
    else root

  /** Snapshot read (time travel, one step): the data root of a SPECIFIC
    * retained version. Commits keep the replaced version as a grace
    * snapshot until the next commit, so the previous snapshot stays
    * readable while (and after) the current one changes — `resolveVersion
    * (root, currentVersion - 1)` is the "as of before that compaction"
    * view. Fails fast when the version has been reclaimed.
    */
  def resolveVersion(spark: SparkSession, root: String, n: Int): String = {
    val (versions, _, dirOf) = tierOf(spark, root)
    require(versions.contains(n),
      s"version $n of $root is not on disk (retained: ${versions.mkString(",")})")
    dirOf(n)
  }

  /** One row per retained version, with the live one flagged. */
  final case class SnapshotInfo(version: Int, current: Boolean, files: Long, bytes: Long)

  /** Inventory of retained snapshots (either versioned tier): version
    * number, whether it is the live one, and its file count / byte size
    * (recursive listing of the version dir — bounded by version count,
    * which the grace contract keeps at ~2).
    */
  def snapshots(spark: SparkSession, root: String): Seq[SnapshotInfo] = {
    val (versions, cur, dirOf) = tierOf(spark, root)
    versions.map { n =>
      val p = new Path(dirOf(n))
      val s = fsOf(spark, p).getContentSummary(p)
      SnapshotInfo(n, n == cur, s.getFileCount, s.getLength)
    }
  }

  /** What a maintenance commit changed between two retained snapshots:
    * file-level adds/removes (by version-relative path; a rewritten file
    * counts on both sides) plus the net ROW delta read from the data
    * itself. The row delta is the audit invariant operators care about:
    * compaction must show 0, retention shows exactly the expired rows —
    * a nonzero delta after a compact is data loss, caught here before
    * the grace snapshot is reclaimed.
    */
  final case class SnapshotDiff(from: Int, to: Int,
      added: Seq[String], removed: Seq[String],
      bytesAdded: Long, bytesRemoved: Long, rowDelta: Long)

  def diffVersions(spark: SparkSession, root: String, from: Int, to: Int): SnapshotDiff = {
    def files(dir: String): Map[String, Long] = {
      val p = new Path(dir)
      val fs = fsOf(spark, p)
      val base = p.toUri.getPath
      val it = fs.listFiles(p, true)
      val out = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        out += (f.getPath.toUri.getPath.stripPrefix(base) -> f.getLen)
      }
      out.result()
    }
    def rows(dir: String): Long =
      spark.read.parquet(dir).count()
    val a = files(resolveVersion(spark, root, from))
    val b = files(resolveVersion(spark, root, to))
    val added = (b.keySet -- a.keySet).toSeq.sorted
    val removed = (a.keySet -- b.keySet).toSeq.sorted
    SnapshotDiff(from, to, added, removed,
      bytesAdded = added.map(b).sum, bytesRemoved = removed.map(a).sum,
      rowDelta = rows(resolveVersion(spark, root, to)) -
        rows(resolveVersion(spark, root, from)))
  }

  /** Reclaim grace snapshots NOW instead of at the next commit: drops every
    * version BELOW the live one, keeping the live version and any
    * staged-ahead version an in-flight commit may still be writing.
    * Returns the dropped version numbers. Readers mid-scan on a dropped
    * snapshot lose their files — same contract as Delta/Iceberg VACUUM with
    * a zero retention window; the default (do nothing) already reclaims at
    * the next commit.
    */
  def vacuum(spark: SparkSession, root: String): Seq[Int] = {
    val (versions, cur, _) = tierOf(spark, root)
    val keep = versions.filter(_ >= cur).toSet
    if (isPointerStore(spark, root)) dropVersionsExcept(spark, root, keep)
    else VersionedStore.dropVersionsExcept(root, keep)
    versions.filterNot(keep)
  }

  /** (retained versions, live version, version → data dir) for whichever
    * versioned tier `root` is; refuses plain unversioned directories.
    */
  private def tierOf(spark: SparkSession, root: String): (Seq[Int], Int, Int => String) =
    if (isPointerStore(spark, root))
      (listVersions(spark, root), currentVersion(spark, root),
        n => s"$root/${versionPrefix(n)}")
    else {
      require(VersionedStore.isVersioned(root),
        s"$root is not a versioned store (no $PointerName pointer, not a version symlink)")
      (VersionedStore.listVersions(root), VersionedStore.currentVersion(root),
        n => VersionedStore.versionName(root, n))
    }

  def readPointer(spark: SparkSession, root: String): String = {
    val p = new Path(root, PointerName)
    val in = fsOf(spark, p).open(p)
    val v = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
    finally in.close()
    require(v.matches("v\\d{6}"), s"corrupt pointer $p: '$v'")
    v
  }

  def currentVersion(spark: SparkSession, root: String): Int =
    readPointer(spark, root).stripPrefix("v").toInt

  /** One atomic PUT: object-store writes publish all-or-nothing, which is
    * the commit primitive this tier is built on. (On a plain filesystem this
    * is create+overwrite — fine for tests; the tier targets object stores.)
    */
  def writePointer(spark: SparkSession, root: String, n: Int): Unit = {
    val p = new Path(root, PointerName)
    val out = fsOf(spark, p).create(p, true)
    try out.write(versionPrefix(n).getBytes("UTF-8")) finally out.close()
  }

  /** Create an empty pointer store (version 1). */
  def init(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    require(!fs.exists(new Path(root, PointerName)), s"$root is already a pointer store")
    fs.mkdirs(new Path(root, versionPrefix(1)))
    writePointer(spark, root, 1)
  }

  /** Version numbers present under the root (current, staged-ahead, stale). */
  def listVersions(spark: SparkSession, root: String): Seq[Int] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{6}") => n.stripPrefix("v").toInt }
      .sorted
  }

  /** Delete version prefixes outside `keep` (see
    * [[VersionedStore.dropVersionsExcept]] for the one-snapshot grace
    * contract commits follow).
    */
  def dropVersionsExcept(spark: SparkSession, root: String, keep: Set[Int]): Unit = {
    val fs = fsOf(spark, new Path(root))
    listVersions(spark, root).filterNot(keep).foreach { n =>
      fs.delete(new Path(root, versionPrefix(n)), true)
    }
  }
}
