package graft

import graft.logs.{Compaction, GraftStore, Introspect, LogIngest, MaintenanceLease, Retention, VersionedStore}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Incremental compaction (round-6 gate): a maintenance commit must be
  * proportional to DIRTY data, not store size. Covers all three tiers:
  * symlink roots carry untouched partitions by hard link (same inode — the
  * file-identity proof), pointer stores carry them by `_graft_manifest`
  * reference (zero bytes move), and the legacy per-leaf swap never touches
  * clean leaves. Plus: time_ns-sorted rewrites (row-group pruning survives
  * compaction), the maintenance lease (two maintainers can't interleave),
  * retain-N snapshots with multi-step time travel, and manifest-aware
  * retention/vacuum.
  */
/** SOAK suite (r17, VERDICT r16 #7): multi-minute store rehearsals —
  * excluded from the default `sbt test` so the driver's bounded run
  * completes; GRAFT_TEST_FULL=1 restores it (round-end certification
  * profile, recorded in OPTIMIZATION_r17.md).
  */
@org.scalatest.tags.Slow
class IncrementalCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq("cluster", "namespace", "date")

  /** events rows shaped like the log store, one date per calendar day. */
  private def fixture() = Tables.events(spark, sf)
    .select(
      graft.logs.CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      lit("p1").as("pod"), lit("app").as("container"))
    .withColumn("date", date_format($"time", "yyyy-MM-dd"))

  private def inode(p: String): Long =
    Files.getAttribute(Paths.get(p), "unix:ino").asInstanceOf[java.lang.Long]

  private def filesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
  }

  test("symlink tier: only the dirty partition rewrites; the rest carry by hard link") {
    val root = Files.createTempDirectory("graft-incr").resolve("store").toString
    val df = fixture()
    // base load: one compact file per date partition (clean by definition)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    assert(dates.length > 10)
    val dirtyDate = dates.head
    // small-file mess in exactly ONE partition
    df.filter($"date" === dirtyDate).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val total = spark.read.parquet(root).count()
    val v1Dir = VersionedStore.versionName(root, 1)
    val v1Files = filesUnder(v1Dir).map(f => f.getPath.stripPrefix(v1Dir) -> f).toMap
    val dirtyRel = s"/cluster=dev/namespace=ns0/date=$dirtyDate"
    assert(v1Files.keys.count(_.startsWith(dirtyRel)) > 4, "mess is real")

    Compaction.compactHive(spark, root, partitionCols = parts)

    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == total)
    val v2Dir = VersionedStore.versionName(root, 2)
    val v2Files = filesUnder(v2Dir).map(f => f.getPath.stripPrefix(v2Dir) -> f).toMap
    // the 19+ clean partitions carried over with the SAME file identities:
    // identical relative names AND identical inodes (hard links, no rewrite)
    val carried = v1Files.keys.filterNot(_.startsWith(dirtyRel)).toSeq
    assert(carried.nonEmpty)
    carried.foreach { rel =>
      assert(v2Files.contains(rel), s"clean partition file $rel was not carried")
      assert(inode(v1Dir + rel) == inode(v2Dir + rel),
        s"$rel was rewritten, not hard-linked")
    }
    // the dirty partition was rewritten into fewer files with fresh names
    val dirtyV2 = v2Files.keys.filter(_.startsWith(dirtyRel)).toSeq
    assert(dirtyV2.size < v1Files.keys.count(_.startsWith(dirtyRel)))
    assert(dirtyV2.forall(rel => !v1Files.contains(rel)))
    // snapshot diff: row delta 0, and ONLY the dirty partition's files moved
    val d = GraftStore.diffVersions(spark, root, 1, 2)
    assert(d.rowDelta == 0L, s"compaction changed rows: $d")
    assert(d.added.nonEmpty && d.removed.nonEmpty)
    assert((d.added ++ d.removed).forall(_.contains(s"date=$dirtyDate")),
      s"carried partitions appear in the diff: $d")
  }

  test("rewritten partitions are time_ns-sorted with near-disjoint row groups") {
    val root = Files.createTempDirectory("graft-sort").resolve("store").toString
    // one fat partition (all rows on one date) so the rewritten file spans
    // several row groups at the shrunken block size below
    val df = fixture().withColumn("date", lit("2024-01-01"))
    // ingest in SHUFFLED order so time clustering is genuinely destroyed
    df.orderBy($"message").repartition(8)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 2000)
      .mode("overwrite").parquet(root)
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", "16384") // force several row groups per file
    try Compaction.compactHive(spark, root, partitionCols = parts)
    finally if (prevBlock == null) hc.unset("parquet.block.size")
    else hc.set("parquet.block.size", prevBlock)
    // every rewritten file is internally sorted by time_ns
    val aFile = filesUnder(root).head.getPath
    val ts = spark.read.parquet(aFile).select($"time_ns").as[Long].collect()
    assert(ts.length > 1)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b }, "file not time-sorted")
    // row-group stats: consecutive groups have non-overlapping time ranges,
    // which is what makes the --since row-group pruning effective
    val stats = Introspect.parquetRowGroupStats(spark, aFile, "time_ns")
      .orderBy($"row_group").select($"min", $"max").as[(Long, Long)].collect()
    assert(stats.length > 1, "fixture too small to split row groups")
    stats.zip(stats.tail).foreach { case ((_, max1), (min2, _)) =>
      assert(max1 <= min2, s"row groups overlap: $max1 > $min2")
    }
  }

  test("pointer tier: dirty partition rewrites, the rest carry by manifest reference") {
    val srv = new graft.sources.S3StubServer()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3l.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3l.endpoint", srv.endpoint)
      hc.set("fs.s3l.impl.disable.cache", "true")
      val root = "s3l://graft-store/incr-lake"
      val df = fixture().limit(2000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val dates = df.select($"date").distinct().as[String].collect().sorted
      val dirtyDate = dates.last // retention below targets the CARRIED oldest
      df.filter($"date" === dirtyDate).repartition(4)
        .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
        .mode("append").parquet(GraftStore.resolve(spark, root))
      val total = GraftStore.readStore(spark, root).count()

      Compaction.compactHive(spark, root, partitionCols = parts)

      assert(GraftStore.currentVersion(spark, root) == 2)
      // v2 physically holds ONLY the dirty partition's rewrite
      val v2Parquet = srv.keys.filter(k => k.contains("/v000002/") && k.endsWith(".parquet"))
      assert(v2Parquet.nonEmpty)
      assert(v2Parquet.forall(_.contains(s"date=$dirtyDate")),
        s"clean partitions were rewritten: $v2Parquet")
      // the clean partitions are carried by reference to v1
      val manifest = GraftStore.readManifest(spark, s"$root/v000002")
      assert(manifest.nonEmpty && manifest.forall(_._1 == "v000001"))
      assert(manifest.map(_._2).forall(!_.contains(s"date=$dirtyDate")))
      // composite read sees everything; so does the snapshot diff
      assert(GraftStore.readStore(spark, root).count() == total)
      assert(GraftStore.readStore(spark, root)
        .filter($"date".cast("string") === dates.head).count() > 0)
      val d = GraftStore.diffVersions(spark, root, 1, 2)
      assert(d.rowDelta == 0L, s"compaction changed rows: $d")
      assert((d.added ++ d.removed).filter(_.endsWith(".parquet"))
        .forall(_.contains(s"date=$dirtyDate")), s"carried files moved: $d")
      // vacuum must NOT reclaim v1: the live manifest references it
      assert(GraftStore.vacuum(spark, root) == Seq.empty)
      assert(GraftStore.listVersions(spark, root) == Seq(1, 2))
      // manifest-aware retention: the oldest date lives only as a carried
      // reference; dropping it is a manifest edit, physically nothing moves
      val deleted = Retention.enforceHive(spark, root, dates(1))
      assert(deleted.size == 1 && deleted.head.contains(s"date=${dates.head}"))
      val remaining = GraftStore.readStore(spark, root)
      val remainingCount = remaining.count()
      assert(remaining.select(min($"date".cast("string"))).head.getString(0) == dates(1))
      // ...while the v1 snapshot still serves the dropped date (immutable)
      assert(GraftStore.readVersion(spark, root, 1).count() ==
        df.count() + df.filter($"date" === dirtyDate).count())
      // a full rewrite makes v3 self-contained; vacuum then reclaims 1 and 2
      Compaction.compactHive(spark, root, partitionCols = parts, full = true)
      assert(GraftStore.readManifest(spark,
        s"$root/${GraftStore.readPointer(spark, root)}").isEmpty)
      assert(GraftStore.vacuum(spark, root).nonEmpty)
      val live = GraftStore.currentVersion(spark, root)
      assert(GraftStore.listVersions(spark, root) == Seq(live))
      assert(GraftStore.readStore(spark, root).count() == remainingCount)
    } finally srv.stop()
  }

  test("maintenance lease: a held root aborts fast; break-lease recovers; racers don't corrupt") {
    val root = Files.createTempDirectory("graft-lease").resolve("store").toString
    val df = fixture().limit(1000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    df.repartition(4).write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val total = spark.read.parquet(root).count()
    // simulate a concurrent maintainer: lease present => compaction, retention
    // and vacuum all abort BEFORE touching anything, naming the holder
    val lease = MaintenanceLease.leasePath(spark, root)
    Files.writeString(Paths.get(lease.toUri.getPath), "compact pid=999 since=test")
    val e = intercept[IllegalStateException](
      Compaction.compactHive(spark, root, partitionCols = parts))
    assert(e.getMessage.contains("break-lease"))
    intercept[IllegalStateException](Retention.enforceHive(spark, root, "2099-01-01"))
    intercept[IllegalStateException](GraftStore.vacuum(spark, root))
    assert(VersionedStore.currentVersion(root) == 1, "aborted maintainer must not commit")
    assert(spark.read.parquet(root).count() == total)
    // operator breaks the stale lease; maintenance proceeds
    assert(MaintenanceLease.breakLease(spark, root))
    assert(!MaintenanceLease.breakLease(spark, root)) // idempotent, reports absence
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == total)
    // two racing compactors: at most one can hold the lease at a time; any
    // loser fails ONLY with the lease error and the store stays intact
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        start.await()
        try Compaction.compactHive(spark, root, partitionCols = parts, full = true)
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(errors.size < 2, "at least one racer must win")
    errors.forEach(t => assert(t.isInstanceOf[MaintenanceLease.LeaseHeldException],
      s"loser must abort on the lease, got: $t"))
    assert(spark.read.parquet(root).count() == total)
    assert(!Files.exists(Paths.get(lease.toUri.getPath)), "lease must be released")
  }

  test("retain-N: multi-step time travel across retained snapshots, vacuum to policy") {
    val root = Files.createTempDirectory("graft-retain").resolve("store").toString
    val df = fixture().limit(3000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    // three maintenance commits, each preceded by an append. Appends land in
    // the LIVE version dir, so a superseded snapshot is frozen at the count
    // it had when the next commit flipped away from it — which equals the
    // count of the version that replaced it at ITS commit instant.
    val liveAtCommit = scala.collection.mutable.Map.empty[Int, Long]
    for (round <- 2 to 4) {
      df.limit(100 * round).repartition(3)
        .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
        .mode("append").parquet(root)
      val liveRows = spark.read.parquet(root).count()
      Compaction.compactHive(spark, root, partitionCols = parts,
        retainSnapshots = 3)
      liveAtCommit(round) = liveRows // frozen content of v(round-1) AND of v(round) at commit
    }
    assert(VersionedStore.currentVersion(root) == 4)
    assert(VersionedStore.listVersions(root) == Seq(1, 2, 3, 4))
    // every retained snapshot reads as of the commit that superseded it
    // (multi-step time travel); the live one reads the latest state
    for (v <- 1 to 3)
      assert(GraftStore.readVersion(spark, root, v).count() == liveAtCommit(v + 1),
        s"snapshot v$v")
    assert(GraftStore.readVersion(spark, root, 4).count() == liveAtCommit(4))
    // vacuum to a retain-1 policy: v3 (one below live) survives, 1..2 drop
    assert(GraftStore.vacuum(spark, root, retain = 1) == Seq(1, 2))
    assert(VersionedStore.listVersions(root) == Seq(3, 4))
    assert(GraftStore.readVersion(spark, root, 3).count() == liveAtCommit(4))
    assert(spark.read.parquet(root).count() == liveAtCommit(4))
  }

  test("legacy tier: clean leaves are never staged or swapped") {
    val root = Files.createTempDirectory("graft-legacy").resolve("store").toString
    val df = fixture()
    df.repartition(parts.map(col): _*).write.partitionBy(parts: _*)
      .mode("overwrite").parquet(root) // one file per partition: all clean
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val dirtyDate = dates.head
    df.filter($"date" === dirtyDate).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val total = spark.read.parquet(root).count()
    val cleanBefore = filesUnder(root)
      .filterNot(_.getPath.contains(s"date=$dirtyDate"))
      .map(f => f.getPath -> inode(f.getPath)).toMap
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(spark.read.parquet(root).count() == total)
    // clean leaves: same paths, same inodes — they were never renamed
    val cleanAfter = filesUnder(root)
      .filterNot(_.getPath.contains(s"date=$dirtyDate"))
      .map(f => f.getPath -> inode(f.getPath)).toMap
    assert(cleanAfter == cleanBefore)
    // the dirty leaf got compacted
    assert(filesUnder(root).count(_.getPath.contains(s"date=$dirtyDate")) <= 2)
  }

  test("legacy tier: an append to a CLEAN leaf mid-commit does NOT abort the compaction") {
    val root = Files.createTempDirectory("graft-legacyrace").resolve("store").toString
    val df = fixture().limit(1000)
    df.repartition(parts.map(col): _*).write.partitionBy(parts: _*)
      .mode("overwrite").parquet(root)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    df.filter($"date" === dates.head).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val before = spark.read.parquet(root).count()
    // clean leaves are never renamed on this tier, so a writer landing in
    // one is harmless — the conflict check must not livelock maintenance
    // behind steady append traffic to partitions it never touches
    val cleanDir = java.nio.file.Paths.get(root,
      s"cluster=dev/namespace=ns0/date=${dates.last}")
    var appended = 0L
    Compaction.onBeforeCommit = () => {
      val src = Files.list(cleanDir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      appended = spark.read.parquet(src.toString).count()
      Files.copy(src, cleanDir.resolve("part-racer.parquet"))
    }
    try Compaction.compactHive(spark, root, partitionCols = parts)
    finally Compaction.onBeforeCommit = () => ()
    // committed despite the append; every row visible
    assert(spark.read.parquet(root).count() == before + appended)
    assert(filesUnder(root).count(_.getPath.contains(s"date=${dates.head}")) <= 2)
  }

  test("snapshot-isolated retention: the drop is a versioned commit, zero bytes move") {
    val srv = new graft.sources.S3StubServer()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3l.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3l.endpoint", srv.endpoint)
      hc.set("fs.s3l.impl.disable.cache", "true")
      val root = "s3l://graft-store/snapret-lake"
      val df = fixture().limit(2000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val dates = df.select($"date").distinct().as[String].collect().sorted
      val total = GraftStore.readStore(spark, root).count()
      val expiredRows = df.filter($"date" === dates.head).count()
      val objectsBefore = srv.keys.count(_.endsWith(".parquet"))

      val deleted = Retention.enforceHiveSnapshot(spark, root, dates(1))

      assert(deleted.size == 1 && deleted.head.contains(s"date=${dates.head}"))
      assert(GraftStore.currentVersion(spark, root) == 2)
      // the commit moved ZERO data bytes: v2 holds exactly one object, its
      // manifest; every survivor is a reference into v1
      assert(!srv.keys.exists(k => k.contains("/v000002/") && k.endsWith(".parquet")))
      val manifest = GraftStore.readManifest(spark, s"$root/v000002")
      assert(manifest.nonEmpty && manifest.forall(_._1 == "v000001"))
      assert(srv.keys.count(_.endsWith(".parquet")) == objectsBefore)
      // the live view dropped exactly the expired date
      val live = GraftStore.readStore(spark, root)
      assert(live.count() == total - expiredRows)
      assert(live.select(min($"date".cast("string"))).head.getString(0) == dates(1))
      // the pre-retention snapshot is COMPLETE and time-travelable — the
      // isolation the in-place mode cannot give
      assert(GraftStore.readVersion(spark, root, 1).count() == total)
      // the snapshot diff audits the drop: removed = the expired partition's
      // files, row delta = exactly the expired rows
      val d = GraftStore.diffVersions(spark, root, 1, 2)
      assert(d.rowDelta == -expiredRows, s"unexpected delta: $d")
      assert(d.removed.filter(_.endsWith(".parquet"))
        .forall(_.contains(s"date=${dates.head}")))
      // vacuum keeps v1 while the live manifest references it... it does:
      // survivors still live there physically
      assert(GraftStore.vacuum(spark, root) == Seq.empty)
    } finally srv.stop()
  }

  test("snapshot-isolated retention on a symlink store: survivors hard-link, v1 intact") {
    val root = Files.createTempDirectory("graft-snapret").resolve("store").toString
    val df = fixture().limit(2000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val total = spark.read.parquet(root).count()
    val expiredRows = df.filter($"date" === dates.head).count()
    val v1Dir = VersionedStore.versionName(root, 1)
    val survivorFile = filesUnder(v1Dir).find(!_.getPath.contains(s"date=${dates.head}")).get

    val deleted = Retention.enforceHiveSnapshot(spark, root, dates(1))

    assert(deleted.size == 1 && deleted.head.contains(s"date=${dates.head}"))
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == total - expiredRows)
    // survivors carried by hard link: same inode in v2
    val v2Twin = VersionedStore.versionName(root, 2) +
      survivorFile.getPath.stripPrefix(v1Dir)
    assert(inode(v2Twin) == inode(survivorFile.getPath))
    // pre-retention snapshot intact (time travel), reclaimed only by vacuum
    assert(GraftStore.readVersion(spark, root, 1).count() == total)
    assert(GraftStore.vacuum(spark, root) == Seq(1))
    assert(spark.read.parquet(root).count() == total - expiredRows)
  }

  test("composite (manifest) reads keep partition pruning in every leg") {
    val root = Files.createTempDirectory("graft-prune").resolve("store").toString
    val df = fixture().limit(2000)
    // force the pointer tier on a local path by initializing it explicitly:
    // pruning must hold for the manifest union, the tier where it matters
    GraftStore.init(spark, root)
    df.repartition(parts.map(col): _*).write.partitionBy(parts: _*)
      .mode("append").parquet(GraftStore.resolve(spark, root))
    val dates = df.select($"date").distinct().as[String].collect().sorted
    df.filter($"date" === dates.last).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(GraftStore.resolve(spark, root))
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(GraftStore.readManifest(spark, GraftStore.resolve(spark, root)).nonEmpty)
    // a date filter over the composite store must prune at the partition
    // level in BOTH union legs: the scans read only the matching directory
    val q = GraftStore.readStore(spark, root)
      .filter($"date".cast("string") === dates(1))
    assert(q.count() == df.filter($"date" === dates(1)).count())
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val pruned = s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
      val read = pruned.flatMap(_.files).map(_.getPath.toString)
      assert(read.forall(_.contains(s"date=${dates(1)}")) ,
        s"scan read non-matching partitions: ${read.filterNot(_.contains(s"date=${dates(1)}")).take(3)}")
    }
  }

  test("pointer tier: commit instant is the pointer flip, immune to live appends") {
    val root = Files.createTempDirectory("graft-asofptr").resolve("store").toString
    GraftStore.init(spark, root)
    val df = fixture().limit(800)
    df.repartition(parts.map(col): _*).write.partitionBy(parts: _*)
      .mode("append").parquet(GraftStore.resolve(spark, root))
    val dates = df.select($"date").distinct().as[String].collect().sorted
    Thread.sleep(50)
    Retention.enforceHiveSnapshot(spark, root, dates(1)) // v2 drops the oldest
    val t2 = GraftStore.commitTimeOf(spark, root, 2)
    Thread.sleep(50)
    // a post-commit append lands in the live version dir; the commit
    // instant must not drift with it, or an as-of read between commit and
    // append would resolve to the PRE-retention snapshot
    df.filter($"date" === dates.last).limit(20)
      .write.partitionBy(parts: _*).mode("append")
      .parquet(GraftStore.resolve(spark, root))
    assert(GraftStore.commitTimeOf(spark, root, 2) == t2)
    assert(GraftStore.versionAsOf(spark, root, t2 + 10) == 2)
    assert(GraftStore.readAsOf(spark, root, t2 + 10)
      .filter($"date".cast("string") === dates.head).count() == 0)
  }

  test("retention refuses hazardous states: pending recovery, all-expired, streaming log") {
    val root = Files.createTempDirectory("graft-retguard").resolve("store").toString
    val df = fixture().limit(500)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val total = spark.read.parquet(root).count()
    // a crashed compaction's marker means recovery will re-promote the
    // PRE-retention tree — running retention now would be silently reverted
    Files.writeString(Paths.get(root + ".compact-inflight"), total.toString)
    val e1 = intercept[IllegalArgumentException](
      Retention.enforceHiveSnapshot(spark, root, "2099-01-01"))
    assert(e1.getMessage.contains("in-flight compaction"))
    val e2 = intercept[IllegalArgumentException](
      Retention.enforceHive(spark, root, "2099-01-01"))
    assert(e2.getMessage.contains("in-flight compaction"))
    Files.delete(Paths.get(root + ".compact-inflight"))
    // expiring EVERY partition would commit a dataless store whose reads
    // all fail — refuse loudly, store untouched
    val e3 = intercept[IllegalArgumentException](
      Retention.enforceHiveSnapshot(spark, root, "2099-01-01"))
    assert(e3.getMessage.contains("every partition"))
    // the in-place path refuses the same hazard (found by a CLI drive:
    // it used to empty the store, leaving every read failing on schema)
    val e3b = intercept[IllegalArgumentException](
      Retention.enforceHive(spark, root, "2099-01-01"))
    assert(e3b.getMessage.contains("every partition"))
    assert(VersionedStore.currentVersion(root) == 1)
    assert(spark.read.parquet(root).count() == total)
    // a streaming-sink commit log needs the explicit conversion opt-in in
    // snapshot mode too (the new version would silently orphan the log)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    Files.createDirectories(Paths.get(root, "_spark_metadata"))
    val e4 = intercept[IllegalArgumentException](
      Retention.enforceHiveSnapshot(spark, root, dates(1)))
    assert(e4.getMessage.contains("_spark_metadata"))
    // a REFUSED run must not half-convert: with conversion granted but the
    // cutoff expiring everything, the refusal fires and the commit log is
    // still there afterwards
    val e5 = intercept[IllegalArgumentException](
      Retention.enforceHive(spark, root, "2099-01-01", convertStreamingStore = true))
    assert(e5.getMessage.contains("every partition"))
    assert(Files.exists(Paths.get(root, "_spark_metadata")),
      "refused retention deleted the streaming commit log anyway")
    val dropped = Retention.enforceHiveSnapshot(spark, root, dates(1),
      convertStreamingStore = true)
    assert(dropped.nonEmpty)
    assert(spark.read.parquet(root).count() < total)
  }

  test("symlink tier: a writer landing mid-commit aborts the compaction, loses nothing") {
    val root = Files.createTempDirectory("graft-race").resolve("store").toString
    val df = fixture().limit(1000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val dirtyDate = dates.head
    df.filter($"date" === dirtyDate).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val before = spark.read.parquet(root).count()
    val dirtyDir = Paths.get(VersionedStore.versionName(root, 1),
      s"cluster=dev/namespace=ns0/date=$dirtyDate")
    // the racing writer: duplicate one data file of the dirty partition
    // into the live tree after staging is verified, before the swap
    var appended = 0L
    Compaction.onBeforeCommit = () => {
      val src = Files.list(dirtyDir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      appended = spark.read.parquet(src.toString).count()
      Files.copy(src, dirtyDir.resolve("part-racer.parquet"))
    }
    try {
      val e = intercept[IllegalStateException](
        Compaction.compactHive(spark, root, partitionCols = parts))
      assert(e.getMessage.contains("concurrent writer"))
      // nothing moved: v1 still live, the writer's rows are all visible,
      // and the aborted staging tree is gone
      assert(VersionedStore.currentVersion(root) == 1)
      assert(spark.read.parquet(root).count() == before + appended)
      assert(!Files.exists(Paths.get(root + ".compact-staging")))
      assert(!Files.exists(Paths.get(root + ".compact-inflight")))
    } finally Compaction.onBeforeCommit = () => ()
    // with the writer quiescent the same compaction commits cleanly
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == before + appended)
  }

  test("pointer tier: a NEW partition landing mid-commit aborts the flip, loses nothing") {
    val srv = new graft.sources.S3StubServer()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3l.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3l.endpoint", srv.endpoint)
      hc.set("fs.s3l.impl.disable.cache", "true")
      val root = "s3l://graft-store/race-lake"
      val df = fixture().limit(1000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val dates = df.select($"date").distinct().as[String].collect().sorted
      df.filter($"date" === dates.head).repartition(4)
        .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
        .mode("append").parquet(GraftStore.resolve(spark, root))
      val before = GraftStore.readStore(spark, root).count()
      // the racing writer appends a partition the carry manifest cannot
      // know about — the staged snapshot would silently drop it
      val racer = df.limit(50).withColumn("date", lit("2099-12-31"))
      Compaction.onBeforeCommit = () => racer
        .write.partitionBy(parts: _*).mode("append")
        .parquet(GraftStore.resolve(spark, root))
      try {
        val e = intercept[IllegalStateException](
          Compaction.compactHive(spark, root, partitionCols = parts))
        assert(e.getMessage.contains("new partitions"))
        // v1 stayed live, the staged v2 was removed, every row is visible
        assert(GraftStore.currentVersion(spark, root) == 1)
        assert(GraftStore.listVersions(spark, root) == Seq(1))
        assert(GraftStore.readStore(spark, root).count() == before + 50)
      } finally Compaction.onBeforeCommit = () => ()
      // quiescent re-run carries the writer's new partition into v2
      Compaction.compactHive(spark, root, partitionCols = parts)
      assert(GraftStore.currentVersion(spark, root) == 2)
      assert(GraftStore.readStore(spark, root).count() == before + 50)
      assert(GraftStore.readStore(spark, root)
        .filter($"date".cast("string") === "2099-12-31").count() == 50)
    } finally srv.stop()
  }

  test("row-level CDC: compaction diffs to zero rows, retention to exactly the expired rows") {
    val root = Files.createTempDirectory("graft-cdc").resolve("store").toString
    val df = fixture().limit(1500)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    df.filter($"date" === dates.last).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    Compaction.compactHive(spark, root, partitionCols = parts)
    // bytes moved (the dirty partition rewrote) but no row changed
    assert(GraftStore.diffVersions(spark, root, 1, 2).added.nonEmpty)
    assert(GraftStore.rowDiff(spark, root, 1, 2).isEmpty)
    val expected = GraftStore.readVersion(spark, root, 2)
      .filter($"date".cast("string") === dates.head)
      .select($"time_ns", $"message")
    Retention.enforceHiveSnapshot(spark, root, dates(1))
    // pruning shape first (cache substitution would hide the file scan):
    // the CDC scan reads only the files the commit touched — every input
    // file of the diff belongs to the expired partition
    val scanned = GraftStore.rowDiff(spark, root, 2, 3).inputFiles.toSeq
    assert(scanned.nonEmpty &&
      scanned.forall(_.contains(s"date=${dates.head}")), scanned.mkString("\n"))
    val cdc = GraftStore.rowDiff(spark, root, 2, 3).cache()
    assert(cdc.filter($"_change" === "added").count() == 0)
    val removed = cdc.filter($"_change" === "removed").select($"time_ns", $"message")
    assert(removed.count() == expected.count() && expected.count() > 0)
    assert(removed.exceptAll(expected).isEmpty && expected.exceptAll(removed).isEmpty)
    cdc.unpersist()
    // the x11 gate wires this into the oracle artifact
    val gate = graft.queries.StoreCdcQuery.run(spark, sf).collect().head
    assert(gate.getAs[Long]("compact_changed_rows") == 0L)
    assert(gate.getAs[Long]("added_rows") == 0L)
    assert(gate.getAs[Boolean]("cdc_matches_expired_ok"))
    assert(gate.getAs[Long]("removed_rows") > 0L)
  }

  test("time travel by timestamp: versionAsOf resolves each commit window") {
    val root = Files.createTempDirectory("graft-asof").resolve("store").toString
    val df = fixture().limit(800)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    Thread.sleep(50) // separate the commits' mtime windows
    df.filter($"date" === dates.last).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    Compaction.compactHive(spark, root, partitionCols = parts)
    val t1 = GraftStore.commitTimeOf(spark, root, 1) // before retention vacuums v1
    Thread.sleep(50)
    Retention.enforceHiveSnapshot(spark, root, dates(1))
    val t2 = GraftStore.commitTimeOf(spark, root, 2)
    val t3 = GraftStore.commitTimeOf(spark, root, 3)
    assert(t1 < t2 && t2 < t3, s"commit times not ordered: $t1 $t2 $t3")
    assert(GraftStore.versionAsOf(spark, root, t2) == 2)
    assert(GraftStore.versionAsOf(spark, root, (t2 + t3) / 2) == 2)
    assert(GraftStore.versionAsOf(spark, root, t3 + 1000) == 3)
    // the pre-retention read still serves the dropped date; the as-of-now
    // read does not
    assert(GraftStore.readAsOf(spark, root, t2)
      .filter($"date".cast("string") === dates.head).count() > 0)
    assert(GraftStore.readAsOf(spark, root, t3 + 1000)
      .filter($"date".cast("string") === dates.head).count() == 0)
    // before the store existed: clear refusal
    val e = intercept[IllegalArgumentException](
      GraftStore.versionAsOf(spark, root, t1 - 60000))
    assert(e.getMessage.contains("as old"))
    // a LATER append to the live version must not move v3's commit instant:
    // the flip artifact (symlink/pointer mtime) is the commit time, so an
    // as-of read between the retention commit and the append still resolves
    // to v3 — not the pre-retention snapshot with expired rows resurfaced
    Thread.sleep(50)
    df.filter($"date" === dates.last).limit(20)
      .write.partitionBy(parts: _*).mode("append")
      .parquet(GraftStore.resolve(spark, root))
    assert(GraftStore.versionAsOf(spark, root, t3 + 10) == 3)
    // markerless staged-ahead debris (a crashed or in-flight commit) is not
    // a snapshot: even with the newest mtimes it must never serve a read
    val debris = java.nio.file.Paths.get(VersionedStore.versionName(root, 9))
    Files.createDirectories(debris)
    Files.writeString(debris.resolve("junk.parquet"), "not-a-snapshot")
    assert(VersionedStore.listVersions(root).contains(9))
    assert(GraftStore.versionAsOf(spark, root, System.currentTimeMillis() + 1000) == 3)
  }

  test("symlink tier: a NEW partition landing mid-commit aborts the swap, loses nothing") {
    val root = Files.createTempDirectory("graft-newpart").resolve("store").toString
    val df = fixture().limit(1000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val dirtyDate = dates.head
    df.filter($"date" === dirtyDate).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val before = spark.read.parquet(root).count()
    // the racing writer creates a BRAND-NEW partition dir — not in the
    // inventory, so a scope-filtered re-check would miss it and the
    // whole-tree swap would publish a version without it (silent row loss
    // once grace snapshots are reclaimed)
    var appended = 0L
    val newDir = Paths.get(VersionedStore.versionName(root, 1),
      "cluster=dev/namespace=ns0/date=2099-12-31")
    Compaction.onBeforeCommit = () => {
      val src = Files.list(Paths.get(VersionedStore.versionName(root, 1),
          s"cluster=dev/namespace=ns0/date=$dirtyDate"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      appended = spark.read.parquet(src.toString).count()
      Files.createDirectories(newDir)
      Files.copy(src, newDir.resolve("part-racer.parquet"))
    }
    try {
      val e = intercept[IllegalStateException](
        Compaction.compactHive(spark, root, partitionCols = parts))
      assert(e.getMessage.contains("new partitions"))
      assert(VersionedStore.currentVersion(root) == 1)
      assert(spark.read.parquet(root).count() == before + appended)
      assert(!Files.exists(Paths.get(root + ".compact-staging")))
      assert(!Files.exists(Paths.get(root + ".compact-inflight")))
    } finally Compaction.onBeforeCommit = () => ()
    // quiescent re-run commits and carries the writer's new partition
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == before + appended)
    assert(spark.read.parquet(root)
      .filter($"date".cast("string") === "2099-12-31").count() == appended)
  }

  test("store root nested under a partition-shaped path: carry still lands correctly") {
    // the root's OWN path contains the exact partition string of a carried
    // leaf — a substring-search relativization would mis-root the carry;
    // path relativization against the version root must not care
    val base = Files.createTempDirectory("graft-collide")
    val df = fixture().limit(1000)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val rootParent = base.resolve(s"cluster=dev/namespace=ns0/date=${dates.head}")
    Files.createDirectories(rootParent)
    val root = rootParent.resolve("store").toString
    LogIngest.writeHive(df, root, partitionCols = parts)
    df.filter($"date" === dates.last).repartition(4)
      .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
      .mode("append").parquet(root)
    val total = spark.read.parquet(root).count()
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == total)
    // the colliding-name partition was carried into v2 at the SAME relative
    // path with the SAME inode (hard link, correctly rooted)
    val v1Dir = VersionedStore.versionName(root, 1)
    val v2Dir = VersionedStore.versionName(root, 2)
    val rel = s"/cluster=dev/namespace=ns0/date=${dates.head}"
    // match on the path BELOW the version dir — the root's own (colliding)
    // path segments must not leak into the partition match
    val carried = filesUnder(v1Dir).filter(_.getPath.stripPrefix(v1Dir).startsWith(rel))
    assert(carried.nonEmpty)
    carried.foreach { f =>
      val twin = v2Dir + f.getPath.stripPrefix(v1Dir)
      assert(Files.exists(Paths.get(twin)), s"carry mis-rooted: $twin missing")
      assert(inode(twin) == inode(f.getPath))
    }
  }

  test("vacuum keeps the TRANSITIVE manifest closure: a holder's own refs survive") {
    val srv = new graft.sources.S3StubServer()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3l.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3l.endpoint", srv.endpoint)
      hc.set("fs.s3l.impl.disable.cache", "true")
      val root = "s3l://graft-store/closure-lake"
      val df = fixture().limit(2000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val dates = df.select($"date").distinct().as[String].collect().sorted
      // dirty the NEWEST date → v2 holds it physically, carries the rest
      // from v1 by reference
      df.filter($"date" === dates.last).repartition(4)
        .write.partitionBy(parts: _*).option("maxRecordsPerFile", 10)
        .mode("append").parquet(GraftStore.resolve(spark, root))
      val totalPreRetention = GraftStore.readStore(spark, root).count()
      val lastDateRows = GraftStore.readStore(spark, root)
        .filter($"date".cast("string") === dates.last).count()
      Compaction.compactHive(spark, root, partitionCols = parts)
      assert(GraftStore.currentVersion(spark, root) == 2)
      // retention expires every v1-carried date → v3's manifest references
      // ONLY v2 (the physical holder of the surviving date); v2's own
      // manifest still references v1 — the two-level chain
      Retention.enforceHiveSnapshot(spark, root, dates.last)
      assert(GraftStore.currentVersion(spark, root) == 3)
      assert(GraftStore.readManifest(spark, s"$root/v000003").forall(_._1 == "v000002"))
      assert(GraftStore.readManifest(spark, s"$root/v000002").exists(_._1 == "v000001"))
      // vacuum(retain=0) seeds from the live version only: a ONE-level
      // closure would reclaim v1 and leave retained v2 listed but
      // unreadable; the transitive closure keeps the chain
      assert(GraftStore.vacuum(spark, root) == Seq.empty)
      assert(GraftStore.listVersions(spark, root) == Seq(1, 2, 3))
      // v2 is still a COMPLETE readable snapshot (the ADVICE failure mode:
      // readVersion on a closure-kept version crashing on a missing path)
      assert(GraftStore.readVersion(spark, root, 2).count() == totalPreRetention)
      assert(GraftStore.readStore(spark, root).count() == lastDateRows)
    } finally srv.stop()
  }

  test("a fully clean store is a no-op: no new version, no data movement") {
    val root = Files.createTempDirectory("graft-noop").resolve("store").toString
    val df = fixture().limit(1000)
    LogIngest.writeHive(df, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 1)
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(VersionedStore.currentVersion(root) == 1, "clean store must not commit")
    assert(VersionedStore.listVersions(root) == Seq(1))
  }
}
