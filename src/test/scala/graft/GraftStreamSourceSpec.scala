package graft

import graft.logs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** `spark.readStream.format("graft")` ([[graft.streaming.GraftStreamSource]]):
  * tailing store commits as a structured stream — offsets are versions,
  * batches are the file-diff-pruned CDC between snapshots.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq("cluster", "namespace", "date")

  private def fixture() = Tables.events(spark, sf)
    .select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      concat(lit("pod-"), ($"user_id" % 4).cast("string")).as("pod"),
      lit("app").as("container"))
    .withColumn("date", date_format($"time", "yyyy-MM-dd"))

  private def newRoot(tag: String): String =
    Files.createTempDirectory(s"graft-stream-$tag").resolve("store").toString

  test("tail: commits after stream start arrive exactly once, in commit batches") {
    val root = newRoot("tail")
    val df = fixture()
    val dates = df.select($"date").distinct().as[String].collect().sorted
    val (d1, d2, d3) = (dates(0), dates(1), dates(2))
    LogIngest.writeHive(df.filter($"date" === d1), root, partitionCols = parts)

    val stream = spark.readStream.format("graft").load(root)
    assert(stream.isStreaming)
    val sink = s"graft_stream_tail_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      // default startingVersion=latest: the pre-existing snapshot is NOT re-read
      assert(spark.table(sink).count() == 0)

      AppendCommit.commit(df.filter($"date" === d2), root, parts,
        commitId = Some("st-1"))
      q.processAllAvailable()
      val afterFirst = spark.table(sink).count()
      assert(afterFirst == df.filter($"date" === d2).count())

      AppendCommit.commit(df.filter($"date" === d3), root, parts,
        commitId = Some("st-2"))
      q.processAllAvailable()
      assert(spark.table(sink).count() ==
        df.filter($"date" === d2 || $"date" === d3).count())
      // content, not just counts
      val got = spark.table(sink).select($"time_ns", $"message")
        .collect().map(_.mkString("|")).sorted
      val want = df.filter($"date" === d2 || $"date" === d3)
        .select($"time_ns", $"message").collect().map(_.mkString("|")).sorted
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("bootstrap: startingVersion=0 emits the full snapshot, then deltas") {
    val root = newRoot("boot")
    val df = fixture()
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" =!= dates.last), root, partitionCols = parts)

    val stream = spark.readStream.format("graft")
      .option("startingVersion", "0").load(root)
    val sink = s"graft_stream_boot_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == df.filter($"date" =!= dates.last).count())
      AppendCommit.commit(df.filter($"date" === dates.last), root, parts)
      q.processAllAvailable()
      assert(spark.table(sink).count() == df.count())
    } finally q.stop()
  }

  test("cdc=true: a deletion-vector commit surfaces its rows as removed") {
    val root = newRoot("cdc")
    val df = fixture()
    LogIngest.writeHive(df, root, partitionCols = parts)

    val stream = spark.readStream.format("graft").option("cdc", "true").load(root)
    assert(stream.schema.fieldNames.contains("_change"))
    val sink = s"graft_stream_cdc_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val pred = (($"time_ns" / 1000).cast("long") % 97) < 13
      val deleted = DeleteVectors.deleteWhere(spark, root, pred,
        commitId = Some("st-d1")).deletedRows
      assert(deleted > 0)
      q.processAllAvailable()
      val changes = spark.table(sink)
      assert(changes.filter($"_change" === "removed").count() == deleted)
      assert(changes.filter($"_change" === "added").count() == 0)
    } finally q.stop()
  }

  test("restart from checkpoint: no re-delivery, stream resumes at the committed version") {
    val root = newRoot("ckpt")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val df = fixture()
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" === dates(0)), root, partitionCols = parts)
    val vBase = GraftStore.liveVersionOf(spark, root)

    val out = Files.createTempDirectory("graft-stream-out").toString
    def run(): Unit = {
      // startingVersion pinned at the first snapshot: delivery is governed
      // by the CHECKPOINT across restarts, so run 2 must not re-read what
      // run 1 committed even though both declare the same starting point
      // (memory sink can't recover a checkpoint — parquet sink can)
      val q = spark.readStream.format("graft")
        .option("startingVersion", vBase.toString).load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
    }
    // the documented retention contract: a restarting consumer may re-run
    // its last checkpointed batch, so the writer retains enough snapshots
    // to cover that lag (Delta's log-retention deal with streaming readers)
    AppendCommit.commit(df.filter($"date" === dates(1)), root, parts,
      retainSnapshots = 3)
    run()
    assert(spark.read.parquet(out).count() == df.filter($"date" === dates(1)).count())

    // second incarnation: only the commit made between runs is delivered
    AppendCommit.commit(df.filter($"date" === dates(2)), root, parts,
      retainSnapshots = 3)
    run()
    assert(spark.read.parquet(out).count() ==
      df.filter($"date" === dates(1) || $"date" === dates(2)).count())
  }

  test("startingVersion=latest resolves once per checkpoint: the base survives restart") {
    val root = newRoot("latestbase")
    val df = fixture()
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" === dates(0)), root, partitionCols = parts)
    val schema = spark.read.format("graft").load(root).schema
    val meta = Files.createTempDirectory("graft-stream-meta").toString

    // first incarnation resolves `latest` against the live store and
    // PERSISTS it under the metadata path
    val s1 = new graft.streaming.GraftStreamSource(
      spark, root, schema, "latest", cdc = false, metadataPath = meta)
    val base = s1.resolvedBaseVersion
    assert(base == GraftStore.liveVersionOf(spark, root).toLong)

    // a commit lands, then the driver dies before batch 0 commits: the
    // restarted incarnation is created AFTER the commit it must deliver
    AppendCommit.commit(df.filter($"date" === dates(1)), root, parts,
      retainSnapshots = 3)
    val s2 = new graft.streaming.GraftStreamSource(
      spark, root, schema, "latest", cdc = false, metadataPath = meta)
    // re-resolving `latest` here would skip the commit; the persisted base wins
    assert(s2.resolvedBaseVersion == base)
    // a DIFFERENT checkpoint resolves fresh — per-checkpoint, not global
    val meta2 = Files.createTempDirectory("graft-stream-meta2").toString
    val s3 = new graft.streaming.GraftStreamSource(
      spark, root, schema, "latest", cdc = false, metadataPath = meta2)
    assert(s3.resolvedBaseVersion == GraftStore.liveVersionOf(spark, root).toLong)
    assert(s3.resolvedBaseVersion > base)
  }

  test("option validation: plain directories and bad startingVersion refuse") {
    val dir = Files.createTempDirectory("graft-stream-plain").toString
    fixture().limit(5).write.mode("overwrite").parquet(s"$dir/plain")
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft").load(s"$dir/plain")
    }
    val root = newRoot("optv")
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft")
        .option("startingVersion", "yesterday").load(root)
    }
  }
}
