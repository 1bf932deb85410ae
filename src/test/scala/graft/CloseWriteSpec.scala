package graft

import graft.streaming.{CloseWriteDetector, StreamAnalytics}
import graft.streaming.CloseWriteDetector.{PodActivity, PodClosed, PodSessionState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState
import java.nio.file.Files

class CloseWriteSpec extends SparkSpec {
  import spark.implicits._

  private val key = ("dev", "ns", "pod-1", "app")

  test("close-write detector: accumulate then emit on inactivity timeout (K5)") {
    val fn = CloseWriteDetector.onGroup("60 seconds") _
    // batch 1: lines arrive, no output, state registered with a timeout
    val s1 = TestGroupState.create[PodSessionState](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    val rows = Iterator(
      PodActivity("dev", "ns", "pod-1", "app", 100L),
      PodActivity("dev", "ns", "pod-1", "app", 300L),
      PodActivity("dev", "ns", "pod-1", "app", 200L))
    assert(fn(key, rows, s1).isEmpty)
    assert(s1.get == PodSessionState(3, 100L, 300L))
    assert(s1.getTimeoutTimestampMs.isPresent)

    // batch 2: more lines fold into existing state
    val s2 = TestGroupState.create[PodSessionState](
      org.apache.spark.api.java.Optional.of(s1.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      2000L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    assert(fn(key, Iterator(PodActivity("dev", "ns", "pod-1", "app", 400L)), s2).isEmpty)
    assert(s2.get == PodSessionState(4, 100L, 400L))

    // batch 3: the timeout fired — close event emitted, state removed
    val s3 = TestGroupState.create[PodSessionState](
      org.apache.spark.api.java.Optional.of(s2.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      70000L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = true)
    val out = fn(key, Iterator.empty, s3).toSeq
    assert(out == Seq(PodClosed("dev", "ns", "pod-1", "app", 4, 100L, 400L)))
    assert(s3.isRemoved)
  }

  test("explicit close marker emits in the SAME trigger — no timeout wait") {
    val fn = CloseWriteDetector.onGroup("60 seconds") _
    // lines accumulated earlier
    val s1 = TestGroupState.create[PodSessionState](
      org.apache.spark.api.java.Optional.of(PodSessionState(4, 100L, 400L)),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      2000L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    // one trigger delivers a trailing line AND the watcher's close marker:
    // the close emits NOW (reference bound: within one flush interval of
    // container exit), folding the trailing line in; state is gone
    val out = fn(key, Iterator(
      PodActivity("dev", "ns", "pod-1", "app", 500L),
      PodActivity("dev", "ns", "pod-1", "app", 0L, closed = true)), s1).toSeq
    assert(out == Seq(PodClosed("dev", "ns", "pod-1", "app", 5, 100L, 500L)))
    assert(s1.isRemoved)

    // a marker for a never-witnessed stream (watcher outran the tail, or
    // state already timed out): zero-line close, harmless to finalize
    val s2 = TestGroupState.create[PodSessionState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      3000L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    val out2 = fn(key, Iterator(
      PodActivity("dev", "ns", "pod-1", "app", 0L, closed = true)), s2).toSeq
    assert(out2 == Seq(PodClosed("dev", "ns", "pod-1", "app", 0, 0L, 0L)))
  }

  test("file watcher: a deleted container log becomes a close marker") {
    val work = Files.createTempDirectory("graft-watch")
    val pods = work.resolve("pods")
    val dir = pods.resolve("ns9_api-3_uid9/app")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:45.1Z stdout F x\n")
    val events = new java.util.concurrent.LinkedBlockingQueue[PodActivity]()
    val w = new graft.streaming.FileCloseWatcher(pods.toString, events.put, "dev")
    try {
      // a container dir created AFTER the watcher started registers too
      val late = pods.resolve("ns9_api-3_uid9/sidecar")
      Files.createDirectories(late)
      Files.writeString(late.resolve("0.log"), "2024-01-15T10:30:46.1Z stdout F y\n")
      Thread.sleep(500) // let the create event register the new dir
      Files.delete(dir.resolve("0.log"))
      Files.delete(late.resolve("0.log"))
      val seen = (1 to 2).flatMap(_ =>
        Option(events.poll(15, java.util.concurrent.TimeUnit.SECONDS)))
      assert(seen.size == 2, s"expected 2 close markers, got $seen")
      assert(seen.forall(e => e.closed && e.cluster == "dev" &&
        e.namespace == "ns9" && e.pod == "api-3"))
      assert(seen.map(_.container).toSet == Set("app", "sidecar"))
    } finally w.close()
  }

  test("file watcher: live log rotation must NOT close the stream; dir reap must") {
    val work = Files.createTempDirectory("graft-watch-rot")
    val pods = work.resolve("pods")
    val dir = pods.resolve("ns2_web-1_uidA/app")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:45.1Z stdout F x\n")
    val events = new java.util.concurrent.LinkedBlockingQueue[PodActivity]()
    val w = new graft.streaming.FileCloseWatcher(pods.toString, events.put, "dev",
      debounceMs = 600L)
    try {
      Thread.sleep(300)
      // kubelet/CRI rotation of a LIVE container: rename away + fresh 0.log.
      // WatchService reports the rename as DELETE(0.log)+CREATE(0.log.<ts>).
      Files.move(dir.resolve("0.log"), dir.resolve("0.log.20240115-103046"))
      Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:47.1Z stdout F y\n")
      assert(events.poll(2000, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "rotation of a live container must not emit a close marker")
      // actual pod teardown: log files go, then the container dir is reaped —
      // the DIRECTORY delete is the unambiguous signal and fires immediately
      Files.delete(dir.resolve("0.log"))
      Files.delete(dir.resolve("0.log.20240115-103046"))
      Files.delete(dir)
      val m = events.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(m != null && m.closed && m.namespace == "ns2" && m.pod == "web-1" &&
        m.container == "app", s"expected close marker on dir reap, got $m")
      // the debounced file-delete close was cancelled by the dir reap: no dup
      assert(events.poll(1500, java.util.concurrent.TimeUnit.MILLISECONDS) == null)
    } finally w.close()
  }

  test("file watcher: deleting a stale restart-sibling log must not close the live container") {
    // kubelet keeps one log per container restart (<restartCount>.log) and
    // GCs stale siblings; 0.log going away while the live 1.log keeps
    // logging is maintenance, not a close
    val work = Files.createTempDirectory("graft-watch-sib")
    val pods = work.resolve("pods")
    val dir = pods.resolve("ns5_web-2_uidD/app")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:45.1Z stdout F pre-restart\n")
    Files.writeString(dir.resolve("1.log"), "2024-01-15T10:30:50.1Z stdout F post-restart\n")
    val events = new java.util.concurrent.LinkedBlockingQueue[PodActivity]()
    val w = new graft.streaming.FileCloseWatcher(pods.toString, events.put, "dev",
      debounceMs = 400L)
    try {
      Thread.sleep(300)
      Files.delete(dir.resolve("0.log")) // kubelet GC of the dead generation
      assert(events.poll(2000, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "sibling GC must not emit a close while 1.log lives")
      Files.delete(dir.resolve("1.log")) // now the real teardown
      val m = events.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(m != null && m.closed && m.pod == "web-2", s"expected close, got $m")
    } finally w.close()
  }

  test("file watcher: write quiescence closes an exit-0 container whose file is RETAINED") {
    // the reference's other close-write case (test.sh:592-598): container
    // exits 0, the log file stays on disk — no delete ever fires. With
    // quiesce enabled the watcher closes the stream once the file goes
    // silent, within the configured bound (30 s in production).
    val work = Files.createTempDirectory("graft-watch-quiesce")
    val pods = work.resolve("pods")
    val dir = pods.resolve("ns3_job-9_uidB/main")
    Files.createDirectories(dir)
    val events = new java.util.concurrent.LinkedBlockingQueue[PodActivity]()
    val w = new graft.streaming.FileCloseWatcher(pods.toString, events.put, "dev",
      debounceMs = 300L, quiesceMs = 700L)
    try {
      Thread.sleep(300)
      Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:45.1Z stdout F start\n")
      Files.writeString(dir.resolve("0.log"),
        "2024-01-15T10:30:46.1Z stdout F done\n",
        java.nio.file.StandardOpenOption.APPEND)
      val m = events.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(m != null && m.closed && m.namespace == "ns3" && m.pod == "job-9" &&
        m.container == "main", s"expected quiescence close, got $m")
      assert(Files.exists(dir.resolve("0.log")), "file must be retained")
    } finally w.close()
  }

  test("file watcher: quiescence is per-container — a silent restart sibling must not close while 1.log writes") {
    // a restarted container RETAINS its silent 0.log next to the live
    // 1.log; per-file quiescence would spuriously close ~quiesceMs after
    // every restart (r12 advisory). Quiescence must hold only when every
    // sibling in the container dir has gone silent.
    val work = Files.createTempDirectory("graft-watch-qsib")
    val pods = work.resolve("pods")
    val dir = pods.resolve("ns6_job-3_uidE/main")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("0.log"), "2024-01-15T10:30:40.1Z stdout F gen0\n")
    val events = new java.util.concurrent.LinkedBlockingQueue[PodActivity]()
    val w = new graft.streaming.FileCloseWatcher(pods.toString, events.put, "dev",
      debounceMs = 300L, quiesceMs = 900L)
    try {
      Thread.sleep(300)
      // live generation keeps writing past several sweep periods while the
      // retained 0.log stays silent well beyond quiesceMs
      val live = dir.resolve("1.log")
      Files.writeString(live, "2024-01-15T10:30:50.1Z stdout F gen1\n")
      val until = System.currentTimeMillis() + 2200
      while (System.currentTimeMillis() < until) {
        Thread.sleep(250)
        Files.writeString(live, "2024-01-15T10:30:51.1Z stdout F alive\n",
          java.nio.file.StandardOpenOption.APPEND)
        assert(events.poll() == null,
          "silent restart sibling must not quiesce-close the live container")
      }
      // writer stops: ONE close for the container once ALL siblings quiesce
      val m = events.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(m != null && m.closed && m.pod == "job-3" && m.container == "main",
        s"expected per-container quiescence close, got $m")
      assert(events.poll(1500, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "one container, one close")
    } finally w.close()
  }

  test("ingest wires the file watcher end-to-end: pod reap finalizes within a trigger") {
    val work = Files.createTempDirectory("graft-watch-e2e")
    val pods = work.resolve("varlog/pods")
    val dir = pods.resolve("ns4_api-7_uidC/app")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("0.log"),
      """2024-01-15T10:30:45.000000001Z stdout F alpha
        |2024-01-15T10:30:46.000000002Z stdout F beta
        |""".stripMargin)
    val closeRoot = work.resolve("close-events").toString
    val (main, closeQ, watcher) = graft.logs.LogStreamIngest.startWithFileWatcher(
      spark, pods.toString + "/*/*/*.log", pods.toString,
      work.resolve("out").toString, closeRoot,
      work.resolve("ckpt").toString, clusterName = "dev", nodeName = "n1",
      triggerInterval = "1 second", idleTimeout = "1 hour",
      debounceMs = 300L, quiesceMs = 0L)
    def closedPods(): Seq[String] =
      try spark.read.schema(graft.logs.StreamFinalize.closeEventSchema)
        .parquet(closeRoot).select("pod").as[String].collect().toSeq
      catch { case _: Exception => Seq.empty }
    try {
      // let the tail witness the lines, then reap the pod (files + dirs)
      Thread.sleep(3000)
      Files.delete(dir.resolve("0.log"))
      Files.delete(dir)
      Files.delete(dir.getParent)
      val deadline = System.currentTimeMillis() + 60000
      while (closedPods().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      assert(closedPods() == Seq("api-7"),
        s"pod reap must finalize within a trigger (idleTimeout is 1 hour): ${closedPods()}")
    } finally { watcher.close(); main.stop(); closeQ.stop() }
  }

  test("close-write detector wires into a streaming plan") {
    val work = Files.createTempDirectory("graft-cw")
    val in = work.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("b1.json"),
      """{"cluster":"dev","namespace":"ns","pod":"p","container":"app","time_ns":1,"closed":false}""" + "\n")
    val stream = spark.readStream
      .schema("cluster STRING, namespace STRING, pod STRING, container STRING, time_ns LONG, closed BOOLEAN")
      .json(in.toString).as[PodActivity]
    val closed = CloseWriteDetector.closedStreams(stream, "1 hour")
    // with processing-time timeouts pending, a live query never quiesces for
    // processAllAvailable — assert the stateful plan instead; onGroup's
    // behavior is covered above via TestGroupState
    assert(closed.isStreaming)
    assert(closed.queryExecution.analyzed.toString.contains("FlatMapGroupsWithState"))
  }

  test("finalize consumes PodClosed events: closed stream compacted, open stream untouched") {
    val work = Files.createTempDirectory("graft-finalize")
    val podsRoot = work.resolve("varlog/pods")
    for (pod <- Seq("web-1", "web-2")) {
      val d = podsRoot.resolve(s"ns1_${pod}_u$pod/app")
      Files.createDirectories(d)
      Files.writeString(d.resolve("0.log"),
        s"""2024-01-15T10:30:45.000000001Z stdout F $pod line one
           |2024-01-15T10:30:46.000000002Z stdout F $pod line two
           |""".stripMargin)
    }
    val ingested = graft.logs.LogIngest.readCri(spark,
      podsRoot.toString + "/*/*/*.log", clusterName = "dev", nodeName = "n1")
    val store = work.resolve("lake").toString
    // two uploads → two files per stream (distinct minute dirs)
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:01:00Z"))
    def filesOf(pod: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(f =>
        f.getName.endsWith(".parquet") && f.getPath.contains(s"/$pod/"))
    }
    assert(filesOf("web-1").size == 2 && filesOf("web-2").size == 2)
    val rowsBefore = spark.read.parquet(filesOf("web-1").map(_.getPath): _*).count()

    // close event for web-1 only (what CloseWriteDetector's sink writes)
    val closeRoot = work.resolve("close-events").toString
    Seq(PodClosed("dev", "ns1", "web-1", "app", 4, 1L, 2L)).toDS().toDF()
      .write.mode("append").parquet(closeRoot)
    val finalized = graft.logs.StreamFinalize.finalizeClosed(spark, closeRoot, store)
    assert(finalized == Seq(("dev", "ns1", "web-1", "app")))
    assert(filesOf("web-1").size == 1, s"closed stream not compacted: ${filesOf("web-1")}")
    assert(filesOf("web-2").size == 2, "open stream must be untouched")
    assert(spark.read.parquet(filesOf("web-1").head.getPath).count() == rowsBefore)
    // ledger makes re-runs no-ops
    assert(graft.logs.StreamFinalize.finalizeClosed(spark, closeRoot, store).isEmpty)

    // a reborn pod (same name, new generation — routine for StatefulSets)
    // must finalize again: the ledger key includes last_ns, so the new
    // close event is not swallowed by the dead generation's ledger row
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:02:00Z"))
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:03:00Z"))
    Seq(PodClosed("dev", "ns1", "web-1", "app", 4, 5L, 6L)).toDS().toDF()
      .write.mode("append").parquet(closeRoot)
    val reborn = graft.logs.StreamFinalize.finalizeClosed(spark, closeRoot, store)
    assert(reborn == Seq(("dev", "ns1", "web-1", "app")))
    // the reborn generation's two uploads merged; every file is now compacted
    assert(filesOf("web-1").size == 2 &&
      filesOf("web-1").forall(_.getName.startsWith("compact-")),
      s"reborn stream not compacted: ${filesOf("web-1")}")
  }

  test("finalize compacts the arrow leg of a dual-format store") {
    val work = Files.createTempDirectory("graft-finalize-arrow")
    val podsRoot = work.resolve("varlog/pods")
    val d = podsRoot.resolve("ns1_web-7_u7/app")
    Files.createDirectories(d)
    Files.writeString(d.resolve("0.log"),
      """2024-01-15T10:30:45.000000001Z stdout F alpha
        |2024-01-15T10:30:46.000000002Z stderr F beta
        |2024-01-15T10:30:47.000000003Z stdout P gamma
        |""".stripMargin)
    val ingested = graft.logs.LogIngest.readCri(spark,
      podsRoot.toString + "/*/*/*.log", clusterName = "dev", nodeName = "n1")
    val store = work.resolve("lake").toString
    // dual-format: two uploads of both legs → 2 parquet + 2 arrow files
    for (m <- Seq("2024-02-01T00:00:00Z", "2024-02-01T00:01:00Z")) {
      val t = java.time.Instant.parse(m)
      graft.logs.LogIngest.writePositional(ingested, store, uploadTime = t)
      graft.sources.ArrowLogWriter.writePositional(ingested, store, uploadTime = t)
    }
    def filesBySuffix(suffix: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(_.getName.endsWith(suffix))
    }
    assert(filesBySuffix(".parquet").size == 2 && filesBySuffix(".arrow").size == 2)
    val closeRoot = work.resolve("close-events").toString
    Seq(PodClosed("dev", "ns1", "web-7", "app", 3, 1L, 3L)).toDS().toDF()
      .write.mode("append").parquet(closeRoot)
    graft.logs.StreamFinalize.finalizeClosed(spark, closeRoot, store)
    // both legs compacted, each to one compact-* file
    assert(filesBySuffix(".parquet").map(_.getName) match {
      case Seq(n) => n.startsWith("compact-"); case other => false })
    assert(filesBySuffix(".arrow").map(_.getName) match {
      case Seq(n) => n.startsWith("compact-"); case other => false })
    // the merged arrow file is readable, complete, and time-ordered
    val merged = spark.read.format("graft.sources.ArrowIpcSource")
      .option("path", filesBySuffix(".arrow").head.getPath).load()
    assert(merged.count() == 6) // 3 lines × 2 uploads
    val ns = merged.select($"time_ns").as[Long].collect()
    assert(ns.toSeq == ns.sorted.toSeq)
    assert(merged.select($"stream").distinct().as[String].collect().toSet ==
      Set("stdout", "stderr"))

    // reborn stream, arrow leg: a second compaction's output can land in a
    // dest dir that already holds the first compact file — unique merged
    // names must keep BOTH (a fixed name would make finishPlan's exists
    // check silently drop the new rows)
    for (m <- Seq("2024-02-01T00:00:00Z", "2024-02-01T00:01:00Z")) {
      graft.sources.ArrowLogWriter.writePositional(ingested, store,
        uploadTime = java.time.Instant.parse(m))
    }
    assert(filesBySuffix(".arrow").size == 3) // 1 compact + 2 reborn smalls
    Seq(PodClosed("dev", "ns1", "web-7", "app", 3, 5L, 7L)).toDS().toDF()
      .write.mode("append").parquet(closeRoot)
    graft.logs.StreamFinalize.finalizeClosed(spark, closeRoot, store)
    val after = filesBySuffix(".arrow")
    assert(after.size == 2 && after.forall(_.getName.startsWith("compact-")),
      s"reborn arrow stream mishandled: $after")
    val total = spark.read.format("graft.sources.ArrowIpcSource")
      .option("paths", after.map(_.getPath).mkString(",")).load().count()
    assert(total == 12, s"rows lost in reborn-arrow compaction: $total != 12")
  }

  test("auto-finalize loop compacts a closed stream when its close event lands") {
    val work = Files.createTempDirectory("graft-autofinalize")
    val podsRoot = work.resolve("varlog/pods")
    val d = podsRoot.resolve("ns1_web-5_u5/app")
    Files.createDirectories(d)
    Files.writeString(d.resolve("0.log"),
      """2024-01-15T10:30:45.000000001Z stdout F one
        |2024-01-15T10:30:46.000000002Z stdout F two
        |""".stripMargin)
    val ingested = graft.logs.LogIngest.readCri(spark,
      podsRoot.toString + "/*/*/*.log", clusterName = "dev", nodeName = "n1")
    val store = work.resolve("lake").toString
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    graft.logs.LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:01:00Z"))
    def files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(_.getName.endsWith(".parquet"))
    }
    assert(files.size == 2)
    val closeRoot = work.resolve("close-events").toString
    val q = graft.logs.LogStreamIngest.startAutoFinalize(spark, closeRoot, store,
      work.resolve("ckpt").toString, triggerInterval = "1 second")
    try {
      // loop is running but nothing has closed: store untouched
      q.processAllAvailable()
      assert(files.size == 2)
      Seq(PodClosed("dev", "ns1", "web-5", "app", 2, 1L, 2L)).toDS().toDF()
        .write.mode("append").parquet(closeRoot)
      q.processAllAvailable()
      assert(files.size == 1 && files.head.getName.startsWith("compact-"),
        s"auto-finalize did not compact: $files")
    } finally q.stop()
  }

  test("finalize recovery completes an interrupted plan without duplicating rows") {
    val work = Files.createTempDirectory("graft-finalize2")
    val store = work.resolve("lake")
    // two original files for one closed stream
    val streamDir = store.resolve("dev/ns1/2024/02/01/n1/web-9/app/00")
    val rows = (1L to 10L).map(i => (i * 1000L, i, "stdout", "F", s"line-$i"))
      .toDF("time_us", "time_ns", "stream", "logtag", "message")
    rows.filter($"time_ns" <= 5).coalesce(1).write.parquet(streamDir.resolve("00").toString)
    rows.filter($"time_ns" > 5).coalesce(1).write.parquet(streamDir.resolve("01").toString)
    def originals = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(store.toFile).filter(_.getName.endsWith(".parquet"))
    }
    val origFiles = originals.filterNot(_.getName.startsWith("compact-"))
    assert(origFiles.size == 2)
    // simulate the crash window: compacted output + _PLAN persisted, but no
    // rename/delete happened yet
    val scratch = java.nio.file.Paths.get(graft.logs.StreamFinalize
      .scratchPath(store.toString, "dev", "ns1", "web-9", "app").toUri.getPath)
    spark.read.parquet(origFiles.map(_.getPath): _*)
      .coalesce(1).write.parquet(scratch.toString)
    val destDir = streamDir.resolve("01").toString
    Files.writeString(scratch.resolve("_PLAN"),
      (destDir +: origFiles.map(_.getPath)).mkString("\n"))
    graft.logs.StreamFinalize.compactPositionalStream(spark, store.toString,
      "dev", "ns1", "web-9", "app")
    val after = originals
    assert(after.forall(_.getName.startsWith("compact-")), s"originals must be gone: $after")
    assert(spark.read.parquet(after.map(_.getPath): _*).count() == 10,
      "recovery must neither lose nor duplicate rows")
    assert(!scratch.toFile.exists)
    // a second run over the finished state is a no-op (compact files excluded)
    assert(graft.logs.StreamFinalize.compactPositionalStream(spark, store.toString,
      "dev", "ns1", "web-9", "app") == 0)
  }

  test("streaming dedup keeps first occurrence per key within watermark") {
    val work = Files.createTempDirectory("graft-sdedup")
    val in = work.resolve("in")
    Files.createDirectories(in)
    Files.writeString(in.resolve("b1.json"),
      """{"k":"a","ts_ns":1704067200000000000}
        |{"k":"a","ts_ns":1704067201000000000}
        |{"k":"b","ts_ns":1704067202000000000}
        |""".stripMargin)
    val stream = spark.readStream.schema("k STRING, ts_ns LONG").json(in.toString)
    val dd = StreamAnalytics.dedupStream(stream,
      graft.logs.CriFunctions.nanosToTimestamp(col("ts_ns")), Seq("k"), "10 minutes")
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try {
      q.processAllAvailable()
      val ks = spark.table("sdedup").select("k").as[String].collect().sorted
      assert(ks.toSeq == Seq("a", "b"))
    } finally q.stop()
  }
}
