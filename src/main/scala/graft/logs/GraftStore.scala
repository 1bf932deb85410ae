package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * complete old tree or the complete new tree. This is the "current pointer"
  * commit (Iceberg's version-hint file); since round 6 a version may also
  * carry a partition→version manifest ([[readManifest]]) so maintenance
  * commits stage only DIRTY partitions — partition listing still comes from
  * the filesystem, the manifest only says which version prefixes to list.
  *
  * Read-side contract: `resolve` names the live version's own directory
  * (what appends write into); [[readStore]] is the composite read every
  * engine query path uses (own + carried partitions). Plain dirs and
  * symlink roots pass through both unchanged, so the three tiers share one
  * code path.
  */
object GraftStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Recursive FILE walk via `listStatus`, replacing `fs.listFiles(p, true)`
    * (r17, guide §1.3 driver fixed cost): `listFiles` materializes
    * `LocatedFileStatus`, whose construction reads the permission field —
    * and on local filesystems without Hadoop's native library that FORKS an
    * `ls -ld` process PER FILE (~10 ms each; measured: a 90-file fresh hive
    * store listed in ~870 ms, the dominant non-write cost of the e2e
    * pipeline and a tax on every store commit's stats refresh). No caller
    * here reads permissions or block locations, so the plain `FileStatus`
    * walk is semantically identical and process-fork-free. Iterative,
    * allocation-light; traversal order is unspecified like the original.
    */
  private[graft] def walkFiles(fs: FileSystem, p: Path): Iterator[org.apache.hadoop.fs.FileStatus] =
    new Iterator[org.apache.hadoop.fs.FileStatus] {
      private val dirs = scala.collection.mutable.Stack[Path](p)
      private var buf: List[org.apache.hadoop.fs.FileStatus] = Nil
      private def fill(): Unit =
        while (buf.isEmpty && dirs.nonEmpty) {
          fs.listStatus(dirs.pop()).foreach { s =>
            if (s.isDirectory) dirs.push(s.getPath) else buf ::= s
          }
        }
      def hasNext: Boolean = { fill(); buf.nonEmpty }
      def next(): org.apache.hadoop.fs.FileStatus = {
        fill(); val h = buf.head; buf = buf.tail; h
      }
    }

  val PointerName = "_current"
  val ManifestName = "_graft_manifest"
  val CommitInfoName = "_commit-info"
  val TxnDirName = "_graft_txns"

  /** Sibling directory suffixes for the streaming-dedup index stores
    * ([[graft.ext.StreamingDedup]]) — named here so store CREATION can
    * clear a dead store's surviving indexes (the same resurrection hazard
    * as the `.txns` ledger, one layer out).
    */
  val DedupIndexSuffix = "-dedup-index"
  val NearDupIndexSuffix = "-neardup-index"

  /** Staged-append directory prefix: a writer stages its part-files under
    * `<root>/_append-<id>` — the `_` prefix keeps the whole subtree
    * invisible to Spark listings AND to `listVersions`, so an in-flight or
    * crashed append is unreadable until (unless) a manifest references it.
    */
  val AppendPrefix = "_append-"

  /** Some(version) when `holder` is a version prefix, None for append dirs. */
  def holderVersion(holder: String): Option[Int] =
    if (holder.matches("v\\d{6}")) Some(holder.stripPrefix("v").toInt) else None

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

  /** Commit timestamp of a retained version (epoch millis).
    *
    * For the LIVE version it is the instant the pointer/symlink named it —
    * the `_current` object's mtime on the pointer tier, the symlink's own
    * (NOFOLLOW) mtime on the symlink tier. Appends land in the live
    * version dir, so its file mtimes drift forward without bound; reading
    * the flip artifact instead keeps the commit instant fixed — otherwise
    * an as-of read BETWEEN a retention commit and a later append would
    * resolve to the PRE-retention snapshot and resurface expired rows.
    *
    * For superseded versions the newest OWN-object mtime serves: those
    * trees stopped changing at the flip that replaced them, so the value
    * is frozen, and it is ≤ the successor's flip time — preserving the
    * ordering `versionAsOf` needs.
    */
  def commitTimeOf(spark: SparkSession, root: String, n: Int): Long = {
    val (_, cur, dirOf) = tierOf(spark, root)
    // exact path first: a commit record written at publish time inside the
    // version dir (atomic-with-flip, mtime-independent); mtime heuristics
    // below serve only legacy stores written before the record existed
    readCommitInfo(spark, dirOf(n)).foreach { ci => return ci.millis }
    if (n == cur) {
      if (isPointerStore(spark, root)) {
        val p = new Path(root, PointerName)
        fsOf(spark, p).getFileStatus(p).getModificationTime
      } else
        // symlink tier is local-FS by contract; NOFOLLOW reads the link's
        // own mtime (retarget time), not the target dir's
        java.nio.file.Files
          .getLastModifiedTime(java.nio.file.Paths.get(new Path(root).toUri.getPath),
            java.nio.file.LinkOption.NOFOLLOW_LINKS)
          .toMillis
    } else {
      val p = new Path(resolveVersion(spark, root, n))
      val fs = fsOf(spark, p)
      var maxT = fs.getFileStatus(p).getModificationTime
      val it = walkFiles(fs, p)
      while (it.hasNext) maxT = math.max(maxT, it.next().getModificationTime)
      maxT
    }
  }

  /** Time travel by TIMESTAMP: the newest retained version committed at or
    * before `tsMillis` (Delta's `versionAsOf`/`timestampAsOf` pair).
    * Considers only versions up to the LIVE one — a staged-ahead prefix an
    * in-flight or crashed commit is writing is not a snapshot and must
    * never serve a read. Fails fast when every retained version is newer —
    * the snapshot that covered that instant has been vacuumed.
    */
  def versionAsOf(spark: SparkSession, root: String, tsMillis: Long): Int = {
    val (versions, cur, _) = tierOf(spark, root)
    val committed = versions.filter(_ <= cur)
      .map(n => (n, commitTimeOf(spark, root, n)))
    val eligible = committed.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no retained version of $root is as old as $tsMillis " +
        s"(oldest retained: ${committed.headOption.map(e =>
          s"v${e._1} @ ${e._2}").getOrElse("none")})")
    eligible.maxBy(e => (e._2, e._1))._1 // same-millis commits: higher version wins
  }

  /** Snapshot read at a timestamp: composite (manifest-aware) like
    * [[readVersion]].
    */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    readVersion(spark, root, versionAsOf(spark, root, tsMillis))

  // ---- carried-partition manifest (incremental-commit support) ----------

  /** Carried-partition manifest of a version directory: `(holder, relPath)`
    * lines meaning "this snapshot ALSO includes the files under
    * `<root>/<holder>/<relPath>`". A holder is a version prefix (`v000007`,
    * written by incremental compaction / snapshot retention) or a staged
    * append directory (`_append-<id>`, written by the atomic writer commit)
    * — either way the snapshot INCLUDES those files without moving a byte.
    * The manifest lives INSIDE the version dir it describes, so the one-PUT
    * pointer flip publishes data and manifest atomically; its `_`-prefix
    * keeps it out of Spark's file listing. Absent manifest = self-contained
    * version (plain read) — the pre-incremental layout reads unchanged.
    */
  def readManifest(spark: SparkSession, versionDir: String): Seq[(String, String)] = {
    val p = new Path(versionDir, ManifestName)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"corrupt manifest line in $p: '$line'")
      val h = line.substring(0, i)
      require(h.matches("v\\d{6}") ||
        (h.startsWith(AppendPrefix) && h.matches("_append-[A-Za-z0-9._-]+")),
        s"corrupt manifest holder in $p: '$line'")
      (h, line.substring(i + 1))
    }
  }

  /** Filesystem schemes where a single-object PUT publishes all-or-nothing
    * but rename is non-atomic copy+delete — the commit-primitive choice
    * flips between the two families.
    */
  private[logs] val objectStoreSchemes =
    Set("s3", "s3a", "s3n", "s3l", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")

  /** Atomic manifest write. On object stores the single PUT (create) IS the
    * atomic primitive; on filesystems `create(overwrite)` truncates first —
    * a crash mid-write would leave a torn manifest whose missing carried
    * entries make vacuum delete live data — so there the write goes through
    * temp + rename like the compaction marker.
    */
  def writeManifest(spark: SparkSession, versionDir: String,
      entries: Seq[(String, String)]): Unit = {
    entries.foreach { case (h, _) =>
      require(h.matches("v\\d{6}") || h.matches("_append-[A-Za-z0-9._-]+"),
        s"invalid manifest holder '$h'") }
    atomicWriteBytes(spark, new Path(versionDir, ManifestName),
      entries.map { case (h, rel) => s"$h\t$rel" }
        .mkString("\n").getBytes("UTF-8"))
  }

  /** Durable commit-id ledger (`_graft_txns/<id>` beside the versions, a
    * sibling `.txns/` dir on the symlink tier): one tiny marker object per
    * EXPLICIT commit id, holding the committed version. Replay detection
    * that scans retained versions' commit records is bounded by snapshot
    * retention — if maintenance commits while a streaming writer is down,
    * the version carrying the replayed batch's record is reclaimed and the
    * replay would commit TWICE. The ledger is append-only and survives
    * retention (Delta's `txn` action made explicit); markers are ~10 bytes,
    * so a year of one-minute micro-batches is ~5 MB of metadata.
    * Markers are written AFTER the pointer flip: a crash in between leaves
    * no marker, and the fallback scan still finds the just-flipped version.
    *
    * Lifecycle: the pointer tier's ledger lives INSIDE the root, so
    * deleting the store deletes it; the symlink tier's root is itself a
    * symlink, so its ledger is the sibling `.txns/` dir and
    * [[VersionedStore.init]] clears a stale one when a fresh store is
    * created at the same path. Operational hazard, documented contract:
    * wiping a CHECKPOINT while keeping the store keeps its ledger too, so
    * the restarted query's batch 0 carries an already-recorded commit id
    * and is dropped as a replay — restart onto a surviving store with a
    * NEW checkpoint path, never a wiped one.
    */
  private def txnDir(spark: SparkSession, root: String): Path =
    if (isPointerStore(spark, root)) new Path(root, TxnDirName)
    else new Path(new Path(root).toUri.getPath + ".txns")

  /** Stable streaming-sink identity from a checkpoint path: the first 128
    * bits of SHA-256, hex. Commit ids embed this (`g<sinkId>-b<batchId>`),
    * so its width IS the collision budget between two checkpoints feeding
    * one store — a 32-bit hash would let two distinct checkpoints share
    * commit ids and silently drop the later query's batches as replays;
    * at 128 bits the birthday bound is ~2⁶⁴ checkpoints per store.
    *
    * Format note: this replaced a 32-bit murmur hex id. Ledger entries
    * recorded under the old format no longer match, so a stream that
    * crashed mid-commit UNDER THE OLD BUILD and restarts on this one
    * replays that one batch without the ledger guard (Spark's own
    * checkpoint commit log still covers the common restart). Accepted:
    * nothing deployed carries old-format ledgers, and keeping a legacy
    * fallback would cement the collision-prone format forever.
    */
  def sinkIdFor(checkpoint: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(checkpoint.getBytes("UTF-8"))
      .take(16).map(b => f"${b & 0xff}%02x").mkString
  }

  private[logs] def recordTxn(spark: SparkSession, root: String, id: String,
      version: Int): Unit = {
    val dir = txnDir(spark, root)
    fsOf(spark, dir).mkdirs(dir)
    atomicWriteBytes(spark, new Path(dir, id),
      version.toString.getBytes("UTF-8"))
  }

  private[logs] def txnVersion(spark: SparkSession, root: String,
      id: String): Option[Int] = {
    val p = new Path(txnDir(spark, root), id)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Atomic metadata-object write — single PUT on object stores, temp+rename
    * elsewhere (see [[writeManifest]]'s rationale). Shared by the manifest
    * and the per-file statistics sidecar ([[FileStats]]).
    */
  private[graft] def atomicWriteBytes(spark: SparkSession, p: Path,
      bytes: Array[Byte]): Unit = {
    val fs = fsOf(spark, p)
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    if (objectStoreSchemes.contains(scheme)) {
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    } else {
      val tmp = new Path(p.getParent, p.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      // overwrite-rename through FileContext: atomic replace on HDFS too,
      // where plain FileSystem.rename returns false on an existing
      // destination — a delete-then-rename fallback there would open a
      // crash window with NO live manifest (reads silently drop carried
      // partitions; vacuum loses the references protecting their versions)
      try {
        org.apache.hadoop.fs.FileContext
          .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no AbstractFileSystem binding (exotic scheme): POSIX-style
          // FileSystems overwrite atomically on plain rename
          require(fs.rename(tmp, p),
            s"atomic rename $tmp -> $p failed and $p has no FileContext binding")
      }
    }
  }

  /** Schema-overlay sidecar (add-column-without-rewrite, round 7): one
    * `name\ttypeDDL` line per column added AFTER data was written. Files
    * that physically lack an overlay column read it as NULL (the
    * Iceberg/Delta add-column contract — null backfill, no rewrite); files
    * written after the evolution carry the column physically and read it
    * as-is. Carried forward by every commit so evolved columns survive
    * appends and maintenance; no-op when the source version has no overlay.
    */
  val SchemaOverlayName = "_graft_schema"

  def carrySchemaOverlay(spark: SparkSession, fromDir: String, toDir: String): Unit = {
    val src = new Path(fromDir, SchemaOverlayName)
    val fs = fsOf(spark, src)
    if (!fs.exists(src)) return
    val in = fs.open(src)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val out = fs.create(new Path(toDir, SchemaOverlayName), true)
    try out.write(bytes) finally out.close()
  }

  /** `(column, typeDDL)` overlay entries of a version dir, in add order. */
  def readSchemaOverlay(spark: SparkSession, versionDir: String): Seq[(String, String)] = {
    val p = new Path(versionDir, SchemaOverlayName)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"corrupt schema overlay line in $p: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  def writeSchemaOverlay(spark: SparkSession, versionDir: String,
      cols: Seq[(String, String)]): Unit = {
    cols.foreach { case (n, t) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid overlay column name '$n'")
      org.apache.spark.sql.types.DataType.fromDDL(t) // fail fast on bad DDL
    }
    val p = new Path(versionDir, SchemaOverlayName)
    val out = fsOf(spark, p).create(p, true)
    try out.write(cols.map { case (n, t) => s"$n\t$t" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Bucket-layout sidecar ([[ClusterSpec.BucketBy]] rewrites): `key\tN`,
    * committed in the version dir beside the data it describes. The sidecar
    * is a CLAIM, not a contract — the read side
    * ([[graft.sources.GraftSourceProvider]]) honors it only after verifying
    * every snapshot file name parses a bucket id `< N` with Spark's own
    * parser, so a later plain append or an unbucketed carried partition
    * fails the claim open (ordinary scan) instead of producing a
    * wrong-partitioning plan. Version-scoped like the schema overlay: a
    * later non-bucketed rewrite simply doesn't carry it.
    */
  val BucketSpecName = "_graft_bucketspec"

  def writeBucketSpec(spark: SparkSession, versionDir: String,
      key: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val p = new Path(versionDir, BucketSpecName)
    val out = fsOf(spark, p).create(p, true)
    try out.write(s"$key\t$buckets".getBytes("UTF-8")) finally out.close()
  }

  /** `(key, buckets)` claimed by a version dir's sidecar, if any. */
  def readBucketSpec(spark: SparkSession, versionDir: String): Option[(String, Int)] = {
    val p = new Path(versionDir, BucketSpecName)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    // malformed sidecar → fail the CLAIM open (ordinary unbucketed scan),
    // never the read: a bucket spec is an optimization hint, and one corrupt
    // sidecar must not hard-fail every read of the store (r16, ADVICE r15).
    // Deleting the sidecar is the recovery; logging names it.
    val i = text.indexOf('\t')
    if (i <= 0) {
      log.warn(s"ignoring corrupt bucket spec in $p ('$text'): " +
        "treating the store as unbucketed; delete the sidecar to silence this")
      return None
    }
    try Some((text.substring(0, i), text.substring(i + 1).trim.toInt))
    catch { case _: NumberFormatException =>
      log.warn(s"ignoring corrupt bucket spec in $p ('$text'): " +
        "treating the store as unbucketed; delete the sidecar to silence this")
      None
    }
  }

  /** Null-backfill overlay columns a frame's files do not carry physically.
    * Applied PER LEG before the composite union, so pre-evolution legs align
    * with post-evolution ones without `allowMissingColumns` (which would
    * silently null genuine schema mismatches too).
    */
  private[logs] def applyOverlay(df: DataFrame,
      overlay: Seq[(String, String)]): DataFrame =
    overlay.foldLeft(df) { case (d, (n, t)) =>
      if (d.columns.contains(n)) d
      else d.withColumn(n,
        org.apache.spark.sql.functions.lit(null).cast(
          org.apache.spark.sql.types.DataType.fromDDL(t)))
    }

  /** One commit's metadata: the operation that produced the version, the
    * caller-supplied commit id (streaming sinks use `q<queryId>-b<batchId>`
    * for exactly-once replay detection), and the publish wall-clock.
    */
  final case class CommitInfo(op: String, id: String, millis: Long)

  /** Write the commit record INSIDE a staged version dir, before the flip
    * that publishes it — so the record becomes visible atomically with the
    * version itself and [[commitTimeOf]] does not depend on filesystem
    * mtimes (which coarse-mtime filesystems, copies, and backup restores
    * all scramble).
    */
  def writeCommitInfo(spark: SparkSession, versionDir: String, info: CommitInfo): Unit = {
    val p = new Path(versionDir, CommitInfoName)
    val out = fsOf(spark, p).create(p, true)
    try out.write(s"${info.op}\t${info.id}\t${info.millis}".getBytes("UTF-8"))
    finally out.close()
  }

  def readCommitInfo(spark: SparkSession, versionDir: String): Option[CommitInfo] = {
    val p = new Path(versionDir, CommitInfoName)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    text.trim.split('\t') match {
      case Array(op, id, millis) => Some(CommitInfo(op, id, millis.toLong))
      case _ => None // torn/foreign file: fall back to mtimes
    }
  }

  /** Versions whose files snapshot `n` reads: itself plus every version its
    * manifest carries partitions from. Reclaim (vacuum / post-commit
    * cleanup) must keep the CLOSURE of what it retains — dropping a version
    * another retained snapshot still references would corrupt that snapshot.
    */
  def referencedVersions(spark: SparkSession, root: String, n: Int): Set[Int] = {
    val (versions, _, dirOf) = tierOf(spark, root)
    if (!versions.contains(n)) Set(n)
    else readManifest(spark, dirOf(n)).flatMap(e => holderVersion(e._1)).toSet + n
  }

  /** Append directories (staged-writer holders) snapshot `n` reads from.
    * Reclaim must keep these as long as any retained snapshot references
    * them; unreferenced ones are crashed-writer debris swept by [[vacuum]].
    */
  def referencedAppendDirs(spark: SparkSession, root: String, n: Int): Set[String] = {
    val (versions, _, dirOf) = tierOf(spark, root)
    if (!versions.contains(n)) Set.empty
    else readManifest(spark, dirOf(n)).map(_._1)
      .filter(_.startsWith(AppendPrefix)).toSet
  }

  /** TRANSITIVE closure of manifest references from `seed`. One level is not
    * enough for reclaim keep-sets: a version kept only because a retained
    * snapshot carries partitions from it may ITSELF carry partitions from a
    * still-older version — dropping that one would leave the middle version
    * listed (and time-travelable) but unreadable, and make `snapshots()` /
    * `rowDiff` silently undercount it.
    */
  def closureOf(spark: SparkSession, root: String, seed: Set[Int]): Set[Int] = {
    var keep = Set.empty[Int]
    var frontier = seed
    while (frontier.nonEmpty) {
      keep ++= frontier
      frontier = frontier.flatMap(n => referencedVersions(spark, root, n)) -- keep
    }
    keep
  }

  /** Composite snapshot read: the version's own files plus every carried
    * partition, each leg anchored with `basePath` at its version prefix so
    * hive partition columns resolve identically, then unioned. Partition
    * pruning still applies per leg (the carried legs enumerate exactly the
    * referenced leaf dirs). No-manifest versions take the plain one-dir
    * read.
    */
  /** Physical directory of a manifest holder: the version prefix dir for
    * `vNNNNNN` holders, `<root>/<holder>` for staged append dirs.
    */
  private def holderDir(root: String, holder: String, dirOf: Int => String): String =
    holderVersion(holder).map(dirOf).getOrElse(s"$root/$holder")

  def readVersion(spark: SparkSession, root: String, n: Int): DataFrame =
    readVersionInternal(spark, root, n, applyDv = true, keepMeta = false)

  /** Physical read: the snapshot's rows as stored, WITHOUT deletion vectors
    * applied ([[DeleteVectors]]) — the frame commit verification counts
    * against the stats sidecar (which is also physical). Query paths use
    * [[readVersion]].
    */
  def readVersionPhysical(spark: SparkSession, root: String, n: Int): DataFrame =
    readVersionInternal(spark, root, n, applyDv = false, keepMeta = false)

  /** Physical read with the file/position metadata columns
    * ([[DeleteVectors.PathCol]]/[[DeleteVectors.PosCol]]) retained —
    * delete/merge commits match rows through this and build vectors from
    * the retained positions.
    */
  private[graft] def readVersionTagged(spark: SparkSession, root: String,
      n: Int): DataFrame =
    readVersionInternal(spark, root, n, applyDv = false, keepMeta = true)

  private def readVersionInternal(spark: SparkSession, root: String, n: Int,
      applyDv: Boolean, keepMeta: Boolean): DataFrame = {
    val (_, _, dirOf) = tierOf(spark, root)
    val dir = resolveVersion(spark, root, n)
    val entries = readManifest(spark, dir)
    val overlay = readSchemaOverlay(spark, dir)
    val dv = if (applyDv) DeleteVectors.read(spark, dir)
    else Map.empty[String, DeleteVectors.Dv]
    // tag per LEG, before any union: _metadata resolves against a single
    // file-source relation. Zero overhead when no vectors exist and no
    // caller wants positions.
    val needMeta = keepMeta || dv.nonEmpty
    // mergeSchema when evolved: one holder dir can mix pre- and
    // post-evolution files, and the sampled-footer schema would otherwise
    // hide the physical column from half the rows
    def rd(base: String, paths: Seq[String]): DataFrame = {
      val r = spark.read.option("basePath", base)
      val r2 = if (overlay.nonEmpty) r.option("mergeSchema", "true") else r
      val df0 = r2.parquet(paths: _*)
      applyOverlay(if (needMeta) DeleteVectors.tagMeta(df0) else df0, overlay)
    }
    val unioned =
      if (entries.isEmpty) {
        val r = if (overlay.nonEmpty) spark.read.option("mergeSchema", "true")
        else spark.read
        val df0 = r.parquet(dir)
        applyOverlay(if (needMeta) DeleteVectors.tagMeta(df0) else df0, overlay)
      } else {
        val own =
          if (hasDataFiles(spark, dir)) Seq(rd(dir, Seq(dir)))
          else Seq.empty // retention can empty a version that still carries refs
        val carried = entries.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, es) =>
          val vdir = holderDir(root, h, dirOf)
          rd(vdir, es.map(e => s"$vdir/${e._2}"))
        }
        (own ++ carried).reduce(_.unionByName(_))
      }
    if (dv.nonEmpty)
      DeleteVectors.applyTo(spark, unioned, dv, compositeEntries(spark, root, n))
    else unioned
  }

  /** The read-side entry point every engine query path uses: composite read
    * of the live snapshot for pointer stores, plain read otherwise (symlink
    * roots resolve in the filesystem and are always self-contained modulo
    * the schema overlay, applied here on both tiers).
    */
  def readStore(spark: SparkSession, root: String): DataFrame =
    if (isPointerStore(spark, root))
      readVersion(spark, root, currentVersion(spark, root))
    else {
      val overlay = readSchemaOverlay(spark, root) // root resolves via symlink
      val dv = DeleteVectors.read(spark, root)
      val r = if (overlay.nonEmpty) spark.read.option("mergeSchema", "true")
      else spark.read
      val df0 = r.parquet(root)
      val df = applyOverlay(
        if (dv.nonEmpty) DeleteVectors.tagMeta(df0) else df0, overlay)
      if (dv.nonEmpty)
        // list through the same root the read plans from, so physical paths
        // line up with _metadata.file_path on symlink tiers too
        DeleteVectors.applyTo(spark, df, dv, FileStats.listDirEntries(spark, root))
      else df
    }

  /** Stats-pruned composite read ([[FileStats]]): drop files whose
    * commit-time `time_ns` max is below the `--since` cutoff (or whose `pod`
    * min/max range excludes the probed pod) from the scan list BEFORE Spark
    * opens any footer. At the reference's ~1 MB object size a 100 TB store
    * is ~10⁸ objects; a 15-minute query reads a handful of them, and without
    * this tier the footer opens — not the data — are the query. Absent or
    * stale sidecar lines fail open to the plain [[readStore]] path: pruning
    * is an optimization, never a correctness gate (row-level predicates are
    * always re-applied by the caller).
    */
  def readStorePruned(spark: SparkSession, root: String,
      sinceNs: Option[Long], podEq: Option[String] = None): DataFrame = {
    if (sinceNs.isEmpty && podEq.isEmpty) return readStore(spark, root)
    val dir = resolve(spark, root)
    val stats = FileStats.read(spark, dir)
    if (stats.isEmpty) return readStore(spark, root)
    val entries: Seq[FileEntry] =
      if (isPointerStore(spark, root))
        compositeEntries(spark, root, currentVersion(spark, root))
      else {
        val p = new Path(dir)
        val fs = fsOf(spark, p)
        if (!fs.exists(p)) return readStore(spark, root)
        val base = p.toUri.getPath
        val out = Seq.newBuilder[FileEntry]
        val it = walkFiles(fs, p)
        while (it.hasNext) {
          val f = it.next()
          val rel = f.getPath.toUri.getPath.stripPrefix(base)
          if (rel.split('/').filter(_.nonEmpty).forall(visibleName))
            out += FileEntry(rel, dir, f.getPath.toString, f.getLen)
        }
        out.result()
      }
    val kept = entries.filter { e =>
      stats.get(e.key) match {
        case Some(s) if s.len == e.len =>
          sinceNs.forall(s.mayOverlapSince) && podEq.forall(s.mayContainPod)
        case _ => true // no/stale stats line: always scan
      }
    }
    if (kept.size == entries.size) return readStore(spark, root)
    if (kept.isEmpty)
      return readStore(spark, root).filter(org.apache.spark.sql.functions.lit(false))
    val overlay = readSchemaOverlay(spark, dir)
    val dv = DeleteVectors.read(spark, dir)
    val unioned = kept.groupBy(_.legBase).toSeq.sortBy(_._1).map { case (base, es) =>
      val r = spark.read.option("basePath", base)
      val r2 = if (overlay.nonEmpty) r.option("mergeSchema", "true") else r
      val df0 = r2.parquet(es.map(_.physical).sorted: _*)
      applyOverlay(if (dv.nonEmpty) DeleteVectors.tagMeta(df0) else df0, overlay)
    }.reduce(_.unionByName(_))
    // vectors for pruned-out files are inert (no row matches their path);
    // kept files get theirs applied like any other read
    if (dv.nonEmpty) DeleteVectors.applyTo(spark, unioned, dv, kept)
    else unioned
  }

  /** Hidden/metadata names (`_SUCCESS`, `_graft_manifest`, `.crc`, trash)
    * are invisible to Spark's file listing and to store accounting.
    */
  private[logs] def visibleName(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".")

  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return false
    val it = walkFiles(fs, p)
    while (it.hasNext) {
      if (visibleName(it.next().getPath.getName)) return true
    }
    false
  }

  /** Physical DATA files of snapshot `n` (own + carried), keyed by
    * store-layout-relative path: a carried file keeps the SAME key across
    * versions, so a snapshot diff shows it as unchanged — carried by
    * reference, not rewritten — while rewritten files (fresh task UUID
    * names) show as removed+added. Metadata objects (`_SUCCESS`, the
    * manifest itself) are excluded: the audit view and the rewritten-bytes
    * accounting are about data.
    */
  private def compositeFiles(spark: SparkSession, root: String, n: Int): Map[String, Long] =
    compositeEntries(spark, root, n).map(e => (e.key, e.len)).toMap

  /** One physical data file of a snapshot: its store-layout-relative key,
    * the leg base dir partition columns derive from (`basePath` for reads),
    * its full physical path, and its length.
    */
  private[graft] final case class FileEntry(key: String, legBase: String,
      physical: String, len: Long, mtime: Long = 0L)

  private[graft] def compositeEntries(spark: SparkSession, root: String,
      n: Int): Seq[FileEntry] = {
    val (_, _, dirOf) = tierOf(spark, root)
    def list(dir: String, keyPrefix: String, legBase: String): Seq[FileEntry] = {
      val p = new Path(dir)
      val fs = fsOf(spark, p)
      if (!fs.exists(p)) return Seq.empty
      val base = p.toUri.getPath
      val it = walkFiles(fs, p)
      val out = Seq.newBuilder[FileEntry]
      while (it.hasNext) {
        val f = it.next()
        if (visibleName(f.getPath.getName))
          out += FileEntry(keyPrefix + f.getPath.toUri.getPath.stripPrefix(base),
            legBase, f.getPath.toString, f.getLen, f.getModificationTime)
      }
      out.result()
    }
    val dir = resolveVersion(spark, root, n)
    val own = list(dir, "", dir)
    val carried = readManifest(spark, dir).flatMap { case (h, rel) =>
      val hd = holderDir(root, h, dirOf)
      list(s"$hd/$rel", s"/$rel", hd)
    }
    own ++ carried
  }

  /** Live version number on either versioned tier (pointer file or version
    * symlink) — the tier-agnostic face of [[currentVersion]].
    */
  def liveVersionOf(spark: SparkSession, root: String): Int =
    tierOf(spark, root)._2

  /** True when the live snapshot references no data files at all — a fresh
    * store before its first commit (streaming sinks create the store, then
    * batches land). Listing-bounded on either tier, no data read.
    */
  def isDataless(spark: SparkSession, root: String): Boolean = {
    val (_, cur, _) = tierOf(spark, root)
    compositeEntries(spark, root, cur).isEmpty
  }

  /** One row per retained version, with the live one flagged. */
  final case class SnapshotInfo(version: Int, current: Boolean, files: Long, bytes: Long)

  /** Inventory of retained snapshots (either versioned tier): version
    * number, whether it is the live one, and its composite file count /
    * byte size (own + carried partitions; listing-bounded, not a data
    * scan).
    */
  def snapshots(spark: SparkSession, root: String): Seq[SnapshotInfo] = {
    val (versions, cur, _) = tierOf(spark, root)
    versions.map { n =>
      val fl = compositeFiles(spark, root, n)
      SnapshotInfo(n, n == cur, fl.size.toLong, fl.values.sum)
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
    val a = compositeFiles(spark, root, from)
    val b = compositeFiles(spark, root, to)
    val added = (b.keySet -- a.keySet).toSeq.sorted
    val removed = (a.keySet -- b.keySet).toSeq.sorted
    SnapshotDiff(from, to, added, removed,
      bytesAdded = added.map(b).sum, bytesRemoved = removed.map(a).sum,
      rowDelta = readVersion(spark, root, to).count() -
        readVersion(spark, root, from).count())
  }

  /** Row-level CDC between two retained snapshots: every row added or
    * removed from `from` to `to`, tagged `_change` = `added` | `removed`,
    * with multiset semantics (a row present twice and then once is one
    * `removed`). `_change` is a RESERVED output name: a store whose data
    * schema already contains it fails fast rather than having the column
    * silently overwritten.
    *
    * Scale shape: the file-level diff prunes first — only files whose
    * store-layout key changed between the snapshots are read at all, so a
    * one-partition retention or compaction on a 10⁴-partition store scans
    * one partition's worth of data, not the store. Rewritten-in-place
    * partitions (compaction) read on both sides but cancel in the
    * count-delta aggregate (one hash shuffle over the changed rows only,
    * both directions from a single scan of each side): a clean
    * compaction yields an EMPTY frame, which is the audit invariant —
    * `diffVersions.rowDelta == 0` proves counts, `rowDiff.isEmpty` proves
    * contents.
    */
  def rowDiff(spark: SparkSession, root: String, from: Int, to: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = compositeEntries(spark, root, from).map(e => (e.key, e)).toMap
    val b = compositeEntries(spark, root, to).map(e => (e.key, e)).toMap
    // deletion vectors are part of a snapshot's row content: a delete commit
    // changes no files, but a file whose vector differs between the
    // snapshots must be read (vector-applied) on both sides so the CDC
    // shows exactly the deleted rows as `removed`
    val dvA = DeleteVectors.read(spark, resolveVersion(spark, root, from))
    val dvB = DeleteVectors.read(spark, resolveVersion(spark, root, to))
    // same store-layout key + same length = same immutable file: every
    // write uses fresh task-UUID names, and a carry (manifest reference or
    // hard link) moves the physical location WITHOUT changing the file —
    // comparing physical paths would un-prune every hardlink-carried
    // partition. A same-key length change (an overwrite the engine never
    // performs) still counts as changed on both sides.
    val touched = (a.keySet ++ b.keySet).filter { k =>
      (a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => x.len != y.len || dvA.get(k) != dvB.get(k)
        case _ => true
      }
    }
    // schema alignment across an evolution commit: back-fill BOTH sides
    // with the union of the two snapshots' overlays, so pre-evolution rows
    // compare (col = null) against post-evolution rows instead of failing
    // the union — an add-column commit then diffs to ZERO rows, which is
    // the correct CDC statement for a metadata-only change
    val overlays =
      (readSchemaOverlay(spark, resolveVersion(spark, root, from)) ++
        readSchemaOverlay(spark, resolveVersion(spark, root, to))).distinct
    def readSide(m: Map[String, FileEntry], dv: Map[String, DeleteVectors.Dv])
        : Option[DataFrame] = {
      val keys = touched.intersect(m.keySet)
      val sideDv = dv.filter { case (k, _) => keys(k) }
      keys.groupBy(k => m(k).legBase).map {
        case (base, ks) =>
          val r = spark.read.option("basePath", base)
          val r2 = if (overlays.nonEmpty) r.option("mergeSchema", "true") else r
          val df0 = r2.parquet(ks.map(m(_).physical).toSeq.sorted: _*)
          applyOverlay(
            if (sideDv.nonEmpty) DeleteVectors.tagMeta(df0) else df0, overlays)
      }.reduceOption(_.unionByName(_)).map { df =>
        if (sideDv.nonEmpty)
          DeleteVectors.applyTo(spark, df, sideDv, keys.toSeq.map(m))
        else df
      }
    }
    // `_change` is the diff's RESERVED output name (the working columns
    // below collision-proof themselves via free(), but the output tag is
    // part of the public contract and cannot be renamed per-store): fail
    // fast instead of silently overwriting a data column of that name
    def reserveChange(df: DataFrame): DataFrame = {
      require(!df.columns.contains("_change"),
        s"rowDiff reserves the output column `_change`, but the store at $root " +
          "already has a data column of that name")
      df
    }
    val tagged = (readSide(a, dvA).map(reserveChange),
        readSide(b, dvB).map(reserveChange)) match {
      case (Some(f), Some(t)) =>
        // ONE scan per side: a t.exceptAll(f) / f.exceptAll(t) pair would
        // each rewrite to its own union+count aggregate, scanning every
        // touched file twice. Tagging sides ±1 and expanding the summed
        // delta is the same rewrite Catalyst applies INSIDE one exceptAll,
        // shared across both directions — identical multiset output
        // (delta copies of "added" when t has more, |delta| of "removed"
        // when f has more).
        import org.apache.spark.sql.functions.{abs, col, explode, least, sequence, shiftright, sum, when}
        val cols = t.columns.toSeq
        // working columns must not shadow user data columns (a data column
        // literally named "_delta" would silently corrupt the diff)
        def free(base: String): String =
          Iterator.iterate(base)("_" + _).find(!cols.contains(_)).get
        val side = free("_side")
        val delta = free("_delta")
        val chunk = free("_chunk")
        val dup = free("_dup")
        // two-level expansion: sequence() materializes one in-memory array
        // per row, and a single |delta|-long array would hit the sequence
        // length cap (and executor memory) when one distinct row's
        // multiplicity differs by tens of millions — e.g. a bulk duplicate
        // re-ingest. Chunking bounds every array to `step` elements while
        // the generate operators stream the rows.
        // power-of-two step: shiftright is exact long floor-division
        // (Column `/` is double division, inexact past 2^53)
        val stepBits = 12
        val step = 1L << stepBits
        val n = abs(col(delta))
        f.withColumn(side, lit(-1L))
          .unionByName(t.withColumn(side, lit(1L)))
          .groupBy(cols.map(col): _*)
          .agg(sum(col(side)).as(delta))
          .filter(col(delta) =!= 0L)
          .withColumn(chunk, explode(sequence(lit(0L), shiftright(n - 1L, stepBits))))
          .withColumn(dup, explode(sequence(lit(1L),
            least(lit(step), n - col(chunk) * step))))
          .withColumn("_change",
            when(col(delta) > 0L, lit("added")).otherwise(lit("removed")))
          .select(cols.map(col) :+ col("_change"): _*)
      case (Some(f), None) => f.withColumn("_change", lit("removed"))
      case (None, Some(t)) => t.withColumn("_change", lit("added"))
      case (None, None) =>
        reserveChange(readVersion(spark, root, to).limit(0))
          .withColumn("_change", lit(""))
    }
    tagged
  }

  /** Reclaim grace snapshots NOW instead of at the next commit: drops
    * versions below the live one, keeping the live version, the newest
    * `retain` snapshots below it (multi-step time travel), any staged-ahead
    * version an in-flight commit may still be writing — and the manifest
    * CLOSURE of all of those (a version carrying partitions for a kept
    * snapshot must itself be kept). Returns the dropped version numbers.
    * Readers mid-scan on a dropped snapshot lose their files — same
    * contract as Delta/Iceberg VACUUM; the default (retain 0, do nothing)
    * already reclaims at the next commit.
    */
  def vacuum(spark: SparkSession, root: String, retain: Int = 0,
      orphanAppendAgeMillis: Long = 24L * 3600 * 1000): Seq[Int] =
    MaintenanceLease.withLease(spark, root, "vacuum") {
      val (versions, cur, _) = tierOf(spark, root)
      val seed = versions.filter(_ >= cur).toSet ++
        versions.filter(_ < cur).sorted.takeRight(retain)
      val keep = closureOf(spark, root, seed)
      if (isPointerStore(spark, root)) dropVersionsExcept(spark, root, keep)
      else VersionedStore.dropVersionsExcept(root, keep)
      sweepOrphanAppendDirs(spark, root, keep, orphanAppendAgeMillis)
      versions.filterNot(keep)
    }

  /** Reclaim staged-append directories no RETAINED version references —
    * crashed or abandoned writers. The age guard is the Delta-VACUUM
    * contract: a LIVE writer's staging is also unreferenced until its
    * publish, so only dirs whose newest file is older than
    * `minAgeMillis` are swept (default 24 h; tests pass 0 with writers
    * quiescent). Covers both tiers: `<root>/_append-*` prefixes on pointer
    * stores, `<root>.append-*` siblings on symlink roots.
    */
  private[logs] def sweepOrphanAppendDirs(spark: SparkSession, root: String,
      keepVersions: Set[Int], minAgeMillis: Long): Seq[String] = {
    val cutoff = System.currentTimeMillis() - minAgeMillis
    def newestMtime(fs: FileSystem, dir: Path): Long = {
      var t = fs.getFileStatus(dir).getModificationTime
      val it = walkFiles(fs, dir)
      while (it.hasNext) t = math.max(t, it.next().getModificationTime)
      t
    }
    if (isPointerStore(spark, root)) {
      val rootPath = new Path(root)
      val fs = fsOf(spark, rootPath)
      val referenced = keepVersions
        .filter(listVersions(spark, root).contains)
        .flatMap(n => referencedAppendDirs(spark, root, n))
      fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(AppendPrefix))
        .filterNot(s => referenced(s.getPath.getName))
        .filter(s => newestMtime(fs, s.getPath) < cutoff)
        .map { s => fs.delete(s.getPath, true); s.getPath.toString }
    } else if (VersionedStore.isVersioned(root)) {
      // symlink tier: staging siblings are consumed (hard-linked + deleted)
      // at publish, so ANY surviving sibling is debris once old enough
      import java.nio.file.{Files => NF, Paths => NP}
      import scala.jdk.CollectionConverters._
      val rootPath = NP.get(root).toAbsolutePath
      val prefix = rootPath.getFileName.toString + ".append-"
      val s = NF.list(rootPath.getParent)
      val candidates = try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix)).toList
      finally s.close()
      candidates.filter { p =>
        val fs = new Path(p.toString).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        newestMtime(fs, new Path(p.toString)) < cutoff
      }.map { p =>
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile); p.toString
      }
    } else Seq.empty
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

  /** Compare-and-swap pointer flip: publish version `next` only if the
    * pointer STILL names `expected` at the instant of the write. On a
    * filesystem with conditional writes ([[graft.sources.ConditionalWrites]]
    * — the S3 `If-Match` contract) this is exact: the precondition rides
    * the PUT itself, so no interleaving between a writer's re-check and its
    * flip can lose an update (the window Delta-on-S3 closes with an
    * external LogStore). Elsewhere it degrades to re-check + plain PUT —
    * today's best-effort, explicitly documented as such. Returns false
    * (nothing written, staged data intact) when a racing commit won.
    */
  def casWritePointer(spark: SparkSession, root: String,
      expected: Int, next: Int): Boolean = {
    val p = new Path(root, PointerName)
    fsOf(spark, p) match {
      case cw: graft.sources.ConditionalWrites =>
        cw.readWithTag(p) match {
          case Some((bytes, tag))
              if new String(bytes, "UTF-8").trim == versionPrefix(expected) =>
            cw.putIfTag(p, versionPrefix(next).getBytes("UTF-8"), Some(tag))
          case _ => false // pointer already moved (or unreadable): lose cleanly
        }
      case _ =>
        if (currentVersion(spark, root) != expected) false
        else { writePointer(spark, root, next); true }
    }
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
