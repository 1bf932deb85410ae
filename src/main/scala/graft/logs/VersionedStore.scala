package graft.logs

import java.nio.file.{Files, LinkOption, Paths, StandardCopyOption}

/** Symlink-rooted versioned store: the live root is a symlink to the current
  * version directory (`<root>.v000001`, `<root>.v000002`, ...) and a version
  * swap is ONE atomic rename of that symlink. A concurrent reader resolving
  * the root sees the complete old tree or the complete new tree — never a
  * partial tree, never a missing root, never a missing partition. This is the
  * filesystem form of a manifest "current pointer" commit (what Iceberg's
  * version-hint file or Delta's log head do): the local filesystem resolves
  * the link below `open`/`listStatus`, so plain `spark.read.parquet(root)`
  * works unchanged for every reader.
  *
  * This is the LOCAL-FILESYSTEM tier only — symlinks are a local-FS
  * primitive. Every other filesystem (HDFS, object stores) runs the same
  * protocol over a pointer object readers resolve ([[GraftStore]]). The
  * reference never needs any of this because it only ever appends immutable
  * objects (`fluent-bit.conf:42` flushes fresh keys; `y-logcli` reads them
  * in place) — rewriting maintenance jobs are what create the isolation
  * problem this solves.
  */
object VersionedStore {

  def versionName(root: String, n: Int): String = f"$root.v$n%06d"

  /** True when `root` is a version-pointer symlink (engine-created store). */
  def isVersioned(root: String): Boolean = Files.isSymbolicLink(Paths.get(root))

  /** Create an empty versioned store: `<root>.v000001` plus the root symlink
    * (relative target, so the store directory is relocatable as a unit).
    *
    * A surviving `<root>.txns` commit-id ledger from a DELETED store at the
    * same path is cleared first: a fresh store has no committed
    * transactions by definition, and resurrected ledger entries would make
    * a streaming writer reusing its checkpoint path silently skip its
    * first batches as replays ([[GraftStore]]'s ledger contract). The
    * sibling placement itself is forced by this tier's layout — the root
    * IS a symlink to the current version dir, so nothing durable can live
    * "inside" it.
    */
  def init(root: String): Unit = {
    val rootPath = Paths.get(root)
    require(!Files.exists(rootPath, LinkOption.NOFOLLOW_LINKS),
      s"$root already exists — init only creates fresh stores")
    val staleLedger = Paths.get(root + ".txns")
    if (Files.isDirectory(staleLedger))
      org.apache.commons.io.FileUtils.deleteDirectory(staleLedger.toFile)
    val v1 = Paths.get(versionName(root, 1))
    Files.createDirectories(v1)
    Files.createSymbolicLink(rootPath, v1.getFileName)
  }

  /** The version number the root symlink currently points at. */
  def currentVersion(root: String): Int = {
    val target = Files.readSymbolicLink(Paths.get(root)).getFileName.toString
    val prefix = Paths.get(root).getFileName.toString + ".v"
    require(target.startsWith(prefix), s"$root does not point at a version dir: $target")
    target.stripPrefix(prefix).toInt
  }

  /** All version numbers present on disk (current, staged-ahead, stale). */
  def listVersions(root: String): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val rootPath = Paths.get(root).toAbsolutePath
    val prefix = rootPath.getFileName.toString + ".v"
    val s = Files.list(rootPath.getParent)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith(prefix) && n.stripPrefix(prefix).nonEmpty
          && n.stripPrefix(prefix).forall(_.isDigit) =>
        n.stripPrefix(prefix).toInt }
      .toSeq.sorted
    finally s.close()
  }

  /** Atomically retarget the root symlink to version `n`: build the new link
    * under a scratch name, then `rename(2)` it over the root — POSIX rename
    * replaces the destination entry atomically, so the root name always
    * resolves (to the old version up to the rename, the new one after).
    */
  def retarget(root: String, n: Int): Unit = {
    val rootPath = Paths.get(root)
    val tmp = Paths.get(root + ".swaplink")
    Files.deleteIfExists(tmp)
    Files.createSymbolicLink(tmp, Paths.get(versionName(root, n)).getFileName)
    Files.move(tmp, rootPath, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Delete every version directory outside `keep`. Commits keep BOTH the
    * new version and the one it replaced: readers that resolved the root
    * before the flip keep their files for one full compaction interval (the
    * grace version dies at the NEXT commit) — the same deferred-deletion
    * contract as Delta/Iceberg vacuum, bounded to exactly one old snapshot.
    */
  def dropVersionsExcept(root: String, keep: Set[Int]): Unit =
    listVersions(root).filterNot(keep).foreach { n =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(versionName(root, n)))
    }
}
