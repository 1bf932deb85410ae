package graft

import graft.logs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Structured Streaming ingestion (SURVEY §2 rows S1, K1, K3-K6): files
  * appearing over time are committed atomically per micro-batch; stop() loses
  * nothing (the SIGTERM-flush analogue, reference test.sh:427-541).
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("stream ingest commits micro-batches; graceful stop loses nothing") {
    val work = Files.createTempDirectory("graft-stream")
    val in = work.resolve("varlog")
    val out = work.resolve("lake")
    val ckpt = work.resolve("ckpt")
    def put(pod: String, lines: String*): Unit = {
      val p = in.resolve(s"pods/default_${pod}_u/app/0.log")
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("", "\n", "\n"))
    }
    put("pod-a", "2024-01-15T10:00:00.000000001Z stdout F first batch")

    val q = LogStreamIngest.start(spark, in.toString + "/pods/*/*/*.log",
      out.toString, ckpt.toString, clusterName = "dev",
      triggerInterval = "1 seconds")
    try {
      q.processAllAvailable() // ≙ upload_timeout flush (K4)
      // close-write / late file: second pod appears mid-stream (K5 analogue)
      put("pod-b", "2024-01-15T10:00:01.000000002Z stderr F second batch")
      q.processAllAvailable()
    } finally q.stop() // SIGTERM flush (K6): committed batches stay visible

    val got = spark.read.parquet(out.toString)
    assert(got.count() == 2)
    assert(got.select("pod").distinct().as[String].collect().toSet == Set("pod-a", "pod-b"))
    val ns = got.orderBy("time_ns").select("time_ns").as[Long].collect()
    assert(ns.toSeq == Seq(1705312800000000001L, 1705312801000000002L))
    // hive partition dirs present (K1 partitioned sink)
    assert(out.toFile.listFiles().exists(_.getName.startsWith("cluster=dev")))
  }

  test("store sink refreshes registered materialized views per micro-batch") {
    val work = Files.createTempDirectory("graft-streammv")
    val in = work.resolve("varlog")
    val root = work.resolve("lake").toString
    val viewDir = work.resolve("view").toString
    def put(pod: String, lines: String*): Unit = {
      val p = in.resolve(s"pods/default_${pod}_u/app/0.log")
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("", "\n", "\n"))
    }
    put("pod-a", "2024-01-15T10:00:00.000000001Z stdout F one",
      "2024-01-15T10:00:00.000000002Z stderr F two")
    // bootstrap: first batch lands before the view exists (a view needs a
    // schema-bearing store), then the sink RESTARTS with live refresh —
    // the realistic create-dashboard-on-a-running-ingest sequence
    val glob = in.toString + "/pods/*/*/*.log"
    val ckpt = work.resolve("ckpt").toString
    val q0 = LogStreamIngest.startStoreSink(spark, glob, root, ckpt,
      clusterName = "dev", triggerInterval = "1 seconds")
    try q0.processAllAvailable() finally q0.stop()
    MatView.create(spark, root, viewDir, keys = Seq("stream"),
      sums = Seq("sum_chars" -> "cast(length(message) as long)"))
    val v1 = MatView.readView(spark, viewDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v1 == Map("stdout" -> ((1L, 3L)), "stderr" -> ((1L, 3L))), s"view=$v1")

    put("pod-b", "2024-01-15T10:00:01.000000003Z stdout F four!")
    val q = LogStreamIngest.startStoreSink(spark, glob, root, ckpt,
      clusterName = "dev", triggerInterval = "1 seconds",
      refreshViews = Seq(viewDir))
    try {
      q.processAllAvailable()
      val v2 = MatView.readView(spark, viewDir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(v2 == Map("stdout" -> ((2L, 8L)), "stderr" -> ((1L, 3L))), s"view=$v2")
    } finally q.stop()
  }

  test("store sink: batches commit through the store protocol; maintenance runs LIVE") {
    val work = Files.createTempDirectory("graft-streamstore")
    val in = work.resolve("varlog")
    val root = work.resolve("lake").toString
    val ckpt = work.resolve("ckpt")
    def put(pod: String, lines: String*): Unit = {
      val p = in.resolve(s"pods/default_${pod}_u/app/0.log")
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("", "\n", "\n"))
    }
    put("pod-a", "2024-01-15T10:00:00.000000001Z stdout F one",
      "2024-01-15T10:00:00.000000002Z stdout F two")
    val q = LogStreamIngest.startStoreSink(spark, in.toString + "/pods/*/*/*.log",
      root, ckpt.toString, clusterName = "dev", triggerInterval = "1 seconds")
    try {
      q.processAllAvailable()
      // the sink produced an ORDINARY versioned store: no _spark_metadata
      // commit log anywhere, version bumped by the batch commit
      assert(VersionedStore.isVersioned(root))
      assert(!Files.exists(java.nio.file.Paths.get(root, "_spark_metadata")))
      assert(spark.read.parquet(root).count() == 2)
      val vAfterB0 = VersionedStore.currentVersion(root)
      assert(vAfterB0 >= 2, "first batch must commit a version, not write v1 in place")
      // second batch appends atomically on top
      put("pod-b", "2024-01-15T10:00:01.000000003Z stderr F three")
      q.processAllAvailable()
      assert(spark.read.parquet(root).count() == 3)
      assert(VersionedStore.currentVersion(root) > vAfterB0)
      // LIVE maintenance: compaction commits against the running ingest with
      // NO convertStreamingStore step — the round-6 refusal is gone because
      // there is no sink commit log to orphan; the store lease serializes
      // this commit with the sink's publishes
      Compaction.compactHive(spark, root)
      assert(spark.read.parquet(root).count() == 3)
      // and the stream keeps committing after the maintenance commit
      put("pod-c", "2024-01-15T10:00:02.000000004Z stdout F four")
      q.processAllAvailable()
      assert(spark.read.parquet(root).count() == 4)
      assert(spark.read.parquet(root).select("pod").distinct().count() == 3)
    } finally q.stop()
    // time travel across micro-batch commits: every retained version opens
    val vs = VersionedStore.listVersions(root)
    vs.filter(_ >= 2).foreach { v =>
      assert(GraftStore.readVersion(spark, root, v).count() > 0)
    }
  }

  test("upsert sink: each micro-batch merges atomically; later batches supersede keys") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-upsink")
    val updDir = work.resolve("updates"); Files.createDirectories(updDir)
    val root = work.resolve("store").toString
    val ckpt = work.resolve("ckpt").toString
    def putBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = work.resolve("tmp-" + name)
      rows.toDF("k", "v")
        .withColumn("date", org.apache.spark.sql.functions.lit("2024-01-15"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val src = {
        val s = Files.list(tmp)
        try s.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        finally s.close()
      }
      Files.move(src, updDir.resolve(name + ".parquet"))
    }
    putBatch("b0", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    val updates = spark.readStream.schema("k LONG, v STRING, date STRING")
      .parquet(updDir.toString)
    val q = LogStreamIngest.startUpsertSink(updates, root, ckpt,
      keyCols = Seq("k"), partitionCols = Seq("date"),
      triggerInterval = "1 seconds")
    try {
      q.processAllAvailable()
      assert(GraftStore.readStore(spark, root).count() == 4)
      // batch 2 supersedes keys 2 and 3 (deletion vector, zero rewrite of
      // batch 1's files) and inserts key 5 — one atomic commit
      putBatch("b1", Seq((2L, "B2"), (3L, "C2"), (5L, "e")))
      q.processAllAvailable()
      val live = GraftStore.readStore(spark, root)
      assert(live.count() == 5)
      val byKey = live.select($"k", $"v").as[(Long, String)].collect().toMap
      assert(byKey == Map(1L -> "a", 2L -> "B2", 3L -> "C2", 4L -> "d", 5L -> "e"))
      // the supersede left a vector on batch 1's file, pending materialization
      assert(DeleteVectors.read(spark, GraftStore.resolve(spark, root)).nonEmpty)
    } finally q.stop()
  }

  test("close-write side channel emits PodClosed after idle timeout (K5 wired)") {
    val work = Files.createTempDirectory("graft-stream3")
    val in = work.resolve("varlog")
    val p = in.resolve("pods/default_pod-c_u/app")
    Files.createDirectories(p)
    Files.writeString(p.resolve("0.log"),
      "2024-01-15T10:00:00.000000001Z stdout F line one\n" +
        "2024-01-15T10:00:00.000000002Z stdout F line two\n")
    val closeRoot = work.resolve("close").toString
    val (main, closeQ) = LogStreamIngest.startWithCloseEvents(spark,
      in.toString + "/pods/*/*/*.log", work.resolve("lake").toString,
      closeRoot, work.resolve("ckpt").toString, clusterName = "dev",
      triggerInterval = "1 seconds", idleTimeout = "1 seconds")
    try {
      main.processAllAvailable()
      assert(spark.read.parquet(work.resolve("lake").toString).count() == 2)
      // processing-time timeouts fire on subsequent (empty) micro-batches —
      // poll the side sink until the close event lands
      val deadline = System.nanoTime() + 60L * 1000000000L
      def closed() =
        try spark.read.parquet(closeRoot).collect() catch { case _: Exception => Array.empty[org.apache.spark.sql.Row] }
      while (closed().isEmpty && System.nanoTime() < deadline) Thread.sleep(500)
      val events = closed()
      assert(events.nonEmpty, "no PodClosed event within 60s of idle")
      val e = events.head
      assert(e.getAs[String]("pod") == "pod-c" && e.getAs[String]("container") == "app")
      assert(e.getAs[Long]("lines") == 2L)
      assert(e.getAs[Long]("first_ns") == 1705312800000000001L)
      assert(e.getAs[Long]("last_ns") == 1705312800000000002L)
    } finally { main.stop(); closeQ.stop() }
  }

  test("dual-format streaming sink writes parquet AND arrow per batch (K2)") {
    val work = Files.createTempDirectory("graft-stream2")
    val in = work.resolve("varlog")
    val p = in.resolve("pods/default_pod-x_u/app")
    Files.createDirectories(p)
    Files.writeString(p.resolve("0.log"),
      "2024-01-15T10:00:00.000000001Z stdout F dual format line\n")
    val q = LogStreamIngest.startDualFormat(spark, in.toString + "/pods/*/*/*.log",
      work.resolve("lake").toString, work.resolve("ckpt").toString,
      clusterName = "dev", triggerInterval = "1 seconds")
    try q.processAllAvailable() finally q.stop()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val files = walk(work.resolve("lake").toFile).map(_.getName)
    assert(files.exists(_.endsWith(".parquet")) && files.exists(_.endsWith(".arrow")))
    // both formats readable and in agreement
    val fromArrow = graft.logs.LogQuery(output = graft.logs.LogOutput.Raw,
      format = graft.logs.LogFormat.Arrow).dataFrame(spark, work.resolve("lake").toString)
    assert(fromArrow.select("message").as[String].collect().toSeq == Seq("dual format line"))
  }
}
