package graft

import graft.logs._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Debt-gated auto-maintenance ([[graft.logs.Maintenance]]): a metadata-only
  * inventory decides whether compaction / vector materialization / view
  * refresh are worth running — and a clean store sees zero version churn
  * from any number of passes.
  */
class MaintenanceSpec extends SparkSpec {
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
    Files.createTempDirectory(s"graft-maint-$tag").resolve("store").toString

  test("sibling dedup index stores compact through the maintenance loop") {
    val w = Files.createTempDirectory("graft-maint-didx")
    val root = w.resolve("corpus").toString
    LogIngest.ensureStore(spark, root)
    def docs(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "text", "lang")
    // slices pile up (inline gate set high), stream then quiesces
    (0 until 4).foreach { b =>
      graft.ext.StreamingDedup.dedupAppendBatch(spark, root,
        docs(((b * 10).toLong, s"mx-$b", "en")), "doc_id", "text",
        Seq("lang"), commitId = Some(s"mi-c$b"),
        indexBuckets = 4, maxIndexSlices = 100)
    }
    val idx = graft.ext.StreamingDedup.dedupIndexRoot(root)
    def slices(): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("c=")).map(_.getPath.getName).toSeq
    }
    assert(slices().size == 4)
    // offline window: index compaction is opt-in (default false — a LIVE
    // stream's planned read would hit the immediately-deleted slices)
    val ran = Maintenance.run(spark, root,
      partitionCols = Seq("lang"), compactIndexes = true, indexMaxSlices = 2)
    assert(ran.compactedIndexes.contains(idx),
      s"maintenance must compact the index: ${ran.compactedIndexes}")
    assert(slices().size == 1 && slices().head.startsWith("c=compact-"))
    // the compacted index still deduplicates
    val r = graft.ext.StreamingDedup.dedupAppendBatch(spark, root,
      docs((99L, "mx-2", "en")), "doc_id", "text", Seq("lang"),
      commitId = Some("mi-dup"), indexBuckets = 4)
    assert(r.admitted == 0 && r.droppedExisting == 1, s"r=$r")
  }

  test("small-file debt triggers one compaction; a clean store takes the no-op fast path") {
    val root = newRoot("sf")
    val df = fixture()
    // tiny maxRecordsPerFile → a small-file storm in every partition
    LogIngest.writeHive(df, root, maxRecordsPerFile = 25, partitionCols = parts)
    val d0 = Maintenance.debt(spark, root)
    assert(d0.dirtyPartitions > 0, s"expected small-file debt, got $d0")

    val r1 = Maintenance.run(spark, root, partitionCols = parts)
    assert(r1.compacted)
    assert(r1.after.dirtyPartitions == 0,
      s"compaction should clear the debt, got ${r1.after}")
    assert(GraftStore.readStore(spark, root).count() == df.count())

    // second pass: clean — no lease, no staging, NO VERSION FLIP
    val vStable = GraftStore.liveVersionOf(spark, root)
    val r2 = Maintenance.run(spark, root, partitionCols = parts)
    assert(!r2.compacted && r2.refreshedViews.isEmpty)
    assert(GraftStore.liveVersionOf(spark, root) == vStable,
      "a clean maintenance pass must not commit a version")
  }

  test("pending deletion vectors count as debt; the pass materializes them") {
    val root = newRoot("dv")
    val df = fixture()
    LogIngest.writeHive(df, root, partitionCols = parts)
    val pred = (($"time_ns" / 1000).cast("long") % 97) < 13
    val deleted = DeleteVectors.deleteWhere(spark, root, pred,
      commitId = Some("mnt-d1")).deletedRows
    assert(deleted > 0)

    val d = Maintenance.debt(spark, root)
    assert(d.pendingDeleteRows == deleted)
    // no partitionCols passed: the pass must INFER the 3-level layout from
    // the manifest keys (a wrong depth would silently leave the debt)
    assert(Maintenance.inferPartitionCols(spark, root).contains(parts))
    val r = Maintenance.run(spark, root)
    assert(r.compacted)
    assert(r.after.pendingDeleteRows == 0,
      "compaction must materialize the vectors out")
    assert(GraftStore.readStore(spark, root).count() == df.count() - deleted)
  }

  test("registered views refresh to the store head; current views no-op") {
    val root = newRoot("mv")
    val viewDir = Files.createTempDirectory("graft-maint-view").resolve("v").toString
    val df = fixture()
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" =!= dates.last), root, partitionCols = parts)
    MatView.create(spark, root, viewDir,
      keys = Seq("pod"), sums = Seq(("msg_chars", "length(message)")))

    AppendCommit.commit(df.filter($"date" === dates.last), root, parts)
    val d = Maintenance.debt(spark, root, views = Seq(viewDir))
    assert(d.staleViews == Seq(viewDir))

    val r = Maintenance.run(spark, root, views = Seq(viewDir), partitionCols = parts)
    assert(r.refreshedViews == Seq(viewDir))
    // the refreshed view equals a full recompute over the live store
    val got = MatView.readView(spark, viewDir)
      .orderBy($"pod").collect().map(_.mkString("|"))
    val want = df.groupBy($"pod")
      .agg(count(lit(1)).as("n_rows"),
        sum(length($"message")).cast("long").as("msg_chars"))
      .orderBy($"pod").collect().map(_.mkString("|"))
    assert(got.sameElements(want))

    val r2 = Maintenance.run(spark, root, views = Seq(viewDir), partitionCols = parts)
    assert(r2.refreshedViews.isEmpty && !r2.compacted)
  }
}
