package graft

import graft.ext.StreamingDedup
import graft.logs.{GraftStore, LogIngest}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Online dedup ([[StreamingDedup]]): batch-primitive semantics (in-batch
  * min-id winner, cross-batch anti-join, fully-duplicate no-op), exactly-once
  * replay, the streaming sink end-to-end, and the single-column scan shape of
  * the seen-fingerprint side.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = {
    val d = Files.createTempDirectory(s"graft-sdedup-$name")
    d.toFile.deleteOnExit()
    d
  }

  private def docsDF(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  test("batch primitive: in-batch min-id wins, cross-batch drops, full-dup batch no-ops") {
    val root = tmp("prim").resolve("corpus").toString
    LogIngest.ensureStore(spark, root)

    val b0 = docsDF((1L, "alpha", "en"), (2L, "beta", "en"), (5L, "alpha", "en"))
    val r0 = StreamingDedup.dedupAppendBatch(spark, root, b0, "doc_id", "text",
      Seq("lang"), commitId = Some("sd-b0"))
    assert(r0.streamed == 3 && r0.admitted == 2 && r0.droppedInBatch == 1 &&
      r0.droppedExisting == 0, s"r0=$r0")
    // min-id winner for the in-batch dup
    assert(GraftStore.readStore(spark, root).filter($"text" === "alpha")
      .select($"doc_id").as[Long].collect().toSeq == Seq(1L))

    val b1 = docsDF((3L, "beta", "en"), (4L, "gamma", "fr"))
    val r1 = StreamingDedup.dedupAppendBatch(spark, root, b1, "doc_id", "text",
      Seq("lang"), commitId = Some("sd-b1"))
    assert(r1.admitted == 1 && r1.droppedExisting == 1, s"r1=$r1")

    // fully-duplicate batch: zero admissions, zero version churn
    val vBefore = GraftStore.liveVersionOf(spark, root)
    val r2 = StreamingDedup.dedupAppendBatch(spark, root, b0, "doc_id", "text",
      Seq("lang"), commitId = Some("sd-b2"))
    assert(r2.admitted == 0 && r2.droppedExisting + r2.droppedInBatch == 3)
    assert(GraftStore.liveVersionOf(spark, root) == vBefore)

    val store = GraftStore.readStore(spark, root)
    assert(store.count() == 3 &&
      store.select($"fingerprint").distinct().count() == 3)
  }

  test("exactly-once: replaying a commit id leaves the store untouched") {
    val root = tmp("replay").resolve("corpus").toString
    LogIngest.ensureStore(spark, root)
    StreamingDedup.dedupAppendBatch(spark, root, docsDF((1L, "a", "en")),
      "doc_id", "text", Seq("lang"), commitId = Some("sd-r0"))
    val r = StreamingDedup.dedupAppendBatch(spark, root,
      docsDF((2L, "b", "en")), "doc_id", "text", Seq("lang"),
      commitId = Some("sd-r1"))
    assert(!r.replayed)
    // the same batch replays (streaming restart): the re-run deduplicates
    // to zero survivors BEFORE the commit layer, so the store is untouched
    // — dedup-level idempotence; commit-id replay (AppendCommitSpec) is the
    // second line of defense for the crash-between-dedup-and-commit window
    val replay = StreamingDedup.dedupAppendBatch(spark, root,
      docsDF((2L, "b", "en")), "doc_id", "text", Seq("lang"),
      commitId = Some("sd-r1"))
    assert(replay.admitted == 0 && replay.version == r.version)
    assert(GraftStore.liveVersionOf(spark, root) == r.version)
    assert(GraftStore.readStore(spark, root).count() == 2)
  }

  test("streaming sink: multi-batch stream admits exactly the distinct texts") {
    val w = tmp("sink")
    val root = w.resolve("corpus").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String, String)]
    val q = StreamingDedup.startDedupSink(
      stream.toDF().toDF("doc_id", "text", "lang"), root,
      checkpoint = w.resolve("ckpt").toString,
      idCol = "doc_id", textCol = "text", partitionCols = Seq("lang"),
      triggerInterval = "1 seconds")
    try {
      stream.addData(Seq((1L, "x", "en"), (2L, "y", "en")))
      q.processAllAvailable()
      stream.addData(Seq((3L, "x", "en"), (4L, "z", "fr"), (5L, "z", "fr")))
      q.processAllAvailable()
    } finally q.stop()
    val got = GraftStore.readStore(spark, root)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "x", 2L -> "y", 4L -> "z"), s"store=$got")
  }

  test("near-dup admission: LSH candidates, exact verify, store-backed state") {
    val root = tmp("near").resolve("corpus").toString
    LogIngest.ensureStore(spark, root)
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val base = words("b", 11) // 9 word-3-grams
    val other = words("c", 11)
    val b0 = docsDF((1L, base, "en"), (2L, words("u", 11), "en"),
      (7L, "hi there", "en"))
    val r0 = StreamingDedup.nearDupAppendBatch(spark, root, b0,
      "doc_id", "text", Seq("lang"), commitId = "nd-c0")
    assert(r0.streamed == 3 && r0.admitted == 3, s"r0=$r0")
    // batch 1: 3 ~ 1 (J=0.9, cross-batch), 1 is an id re-send, 6 ~ 5
    // in-batch (earlier = smaller id), 8 repeats 7's SHORT text (no
    // 3-grams → near-dup never fires → admitted), 4 is fresh
    val b1 = docsDF((3L, s"$base b12", "en"), (4L, words("v", 11), "en"),
      (8L, "hi there", "en"), (1L, base, "en"),
      (5L, other, "en"), (6L, s"$other c12", "en"))
    val r1 = StreamingDedup.nearDupAppendBatch(spark, root, b1,
      "doc_id", "text", Seq("lang"), commitId = "nd-c1")
    assert(r1.streamed == 6 && r1.droppedSeenId == 1 &&
      r1.droppedNearDup == 2 && r1.admitted == 3, s"r1=$r1")
    // 9 duplicates DROPPED doc 6 — the policy is "earlier SEEN", not
    // "earlier admitted", so it still drops (non-recursive rule)
    val b2 = docsDF((9L, s"$other c12", "en"))
    val r2 = StreamingDedup.nearDupAppendBatch(spark, root, b2,
      "doc_id", "text", Seq("lang"), commitId = "nd-c2")
    assert(r2.admitted == 0 && r2.droppedNearDup == 1, s"r2=$r2")
    val ids = GraftStore.readStore(spark, root)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 5L, 7L, 8L), s"ids=$ids")
    // full re-send: the 8-byte id anti-join short-circuits everything —
    // zero admissions, no version churn
    val v = GraftStore.liveVersionOf(spark, root)
    val rAll = StreamingDedup.nearDupAppendBatch(spark, root,
      b0.unionAll(b1).unionAll(b2), "doc_id", "text", Seq("lang"),
      commitId = "nd-c3")
    assert(rAll.admitted == 0 && rAll.droppedSeenId == rAll.streamed &&
      GraftStore.liveVersionOf(spark, root) == v, s"rAll=$rAll")
  }

  test("near-dup crash ordering: a lost grams slice replays to a consistent state") {
    val root = tmp("nearcrash").resolve("corpus").toString
    LogIngest.ensureStore(spark, root)
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val base = words("b", 11)
    StreamingDedup.nearDupAppendBatch(spark, root,
      docsDF((1L, base, "en"), (2L, words("u", 11), "en")),
      "doc_id", "text", Seq("lang"), commitId = "ndc-c0")
    val b1 = docsDF((3L, s"$base b12", "en"), (4L, words("v", 11), "en"))
    val r1 = StreamingDedup.nearDupAppendBatch(spark, root, b1,
      "doc_id", "text", Seq("lang"), commitId = "ndc-c1")
    assert(r1.admitted == 1 && r1.droppedNearDup == 1, s"r1=$r1")
    // simulate the crash window: corpus commit and bands slice landed,
    // the grams slice (the id-authority) did not
    val idx = StreamingDedup.indexRoot(root)
    val gramsSlice = new org.apache.hadoop.fs.Path(s"$idx/grams/c=ndc-c1")
    val fs = gramsSlice.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(gramsSlice, true), "fixture: grams slice must exist")
    // replay: ids 3/4 look unseen again, the whole batch recomputes, the
    // corpus commit no-ops via its commit id, the slices land again
    val r2 = StreamingDedup.nearDupAppendBatch(spark, root, b1,
      "doc_id", "text", Seq("lang"), commitId = "ndc-c1")
    assert(r2.replayed && r2.admitted == 1 && r2.droppedNearDup == 1, s"r2=$r2")
    assert(fs.exists(gramsSlice), "replay must restore the grams slice")
    val ids = GraftStore.readStore(spark, root)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"ids=$ids")
    // after the heal, the id anti-join short-circuits the re-send again
    val r3 = StreamingDedup.nearDupAppendBatch(spark, root, b1,
      "doc_id", "text", Seq("lang"), commitId = "ndc-c2")
    assert(r3.admitted == 0 && r3.droppedSeenId == 2, s"r3=$r3")
  }

  test("the seen side scans ONLY the fingerprint column") {
    val root = tmp("prune").resolve("corpus").toString
    LogIngest.ensureStore(spark, root)
    StreamingDedup.dedupAppendBatch(spark, root,
      docsDF((1L, "pruned-text-a", "en")), "doc_id", "text", Seq("lang"),
      commitId = Some("sd-p0"))
    val seen = GraftStore.readStore(spark, root)
      .select($"fingerprint").distinct()
    val plan = seen.queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema") &&
      plan.contains("struct<fingerprint:bigint>"),
      s"fingerprint scan must prune the text column:\n${plan.take(1500)}")
  }
}
