package graft.queries

import graft.Tables
import graft.ext.StreamingDedup
import graft.logs.GraftStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** d10 — ONLINE streaming dedup ([[StreamingDedup.startDedupSink]]) as a
  * self-verifying oracle gate.
  *
  * `documents` arrives as a 3-batch stream (arrival order `doc_id % 3`),
  * with two batches RE-SENDING earlier content (`doc_id % 6 == 0` again in
  * batch 1, `% 6 == 1` again in batch 2 — the crawler-revisit case). The
  * sink admits only never-seen text into a versioned corpus store,
  * first-writer-wins: the surviving copy of any duplicated text is the one
  * from the earliest batch, min `doc_id` within a batch.
  *
  * That rule is pure SQL over `documents` — DuckDB restates the survivor
  * set with one window function (`row_number() PARTITION BY text ORDER BY
  * doc_id % 3, doc_id`), so a dropped unique doc, a double-admitted dup, or
  * an order-violating survivor all flip the hash. Engine-verified booleans
  * pin what SQL can't see: the store's fingerprints are unique
  * (`unique_ok`), a full re-send after the stream drains admits zero rows
  * and leaves the version untouched (`resend_noop_ok`), and the store
  * multiset equals an independently-computed batch-API expectation
  * (`store_matches_expected`).
  */
object StreamDedupQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-streamdedup")
    val root = work.resolve("corpus").toString

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source").persist()
    val batch0 = docs.filter($"doc_id" % 3 === 0)
    val batch1 = docs.filter($"doc_id" % 3 === 1)
      .unionAll(docs.filter($"doc_id" % 6 === 0)) // crawler revisit
    val batch2 = docs.filter($"doc_id" % 3 === 2)
      .unionAll(docs.filter($"doc_id" % 6 === 1))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String, String, String)]
    val q = StreamingDedup.startDedupSink(
      stream.toDF().toDF("doc_id", "text", "lang", "source"),
      root, checkpoint = work.resolve("ckpt").toString,
      idCol = "doc_id", textCol = "text", partitionCols = Seq("lang"),
      // 100 ms tick (r16): the gate drives batches with addData +
      // processAllAvailable, so batch BOUNDARIES are pinned by the drain,
      // not the tick — a 1 s tick only added up to 1 s of dead wait per
      // batch before the body started. Identical rows at any interval.
      triggerInterval = "100 milliseconds")
    try {
      // one processAllAvailable per add = one micro-batch per logical batch,
      // preserving the arrival order the oracle's window function restates
      Seq(batch0, batch1, batch2).foreach { b =>
        stream.addData(b.as[(Long, String, String, String)].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val store = GraftStore.readStore(spark, root).persist()
    val nStore = store.count()
    val uniqueOk =
      store.select($"fingerprint").distinct().count() == nStore

    // full re-send of everything: zero admissions, version untouched
    val vBefore = GraftStore.liveVersionOf(spark, root)
    val resend = StreamingDedup.dedupAppendBatch(spark, root, docs.toDF(),
      "doc_id", "text", Seq("lang"), commitId = Some("d10-resend"))
    val resendNoopOk = resend.admitted == 0 &&
      GraftStore.liveVersionOf(spark, root) == vBefore

    // independent batch-API expectation of the survivor set
    val expected = docs
      .withColumn("_rn", row_number().over(
        Window.partitionBy($"text").orderBy($"doc_id" % 3, $"doc_id")))
      .filter($"_rn" === 1)
      .select($"doc_id", $"text", $"lang", $"source")
    val storeDocs = store.select($"doc_id", $"text", $"lang", $"source")
    val matches = storeDocs.exceptAll(expected).count() == 0 &&
      expected.exceptAll(storeDocs).count() == 0

    docs.unpersist()
    val out = store.select(
      $"doc_id", $"lang", $"source",
      lit(uniqueOk).as("unique_ok"),
      lit(resendNoopOk).as("resend_noop_ok"),
      lit(matches).as("store_matches_expected"))
      .orderBy($"doc_id")
    store.unpersist()
    out
  }
}
