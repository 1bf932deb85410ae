package graft.queries

import graft.Tables
import graft.ext.{Dedup, StreamingDedup}
import graft.logs.GraftStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** d11 — ONLINE streaming NEAR-dedup ([[StreamingDedup.startNearDupSink]]):
  * the store-state LSH sink as a self-verifying oracle gate.
  *
  * `documents` arrives as the same 3-batch stream as d10 (arrival order
  * `doc_id % 3`, crawler re-visits re-sending earlier slices). The sink
  * admits a document only when NO earlier-seen document is an exact-
  * verified n-gram-Jaccard near-dup (τ = 0.8): candidates come from the
  * banded-MinHash index store, verification from the shingle index store —
  * streaming state lives entirely in columnar indexes, not the checkpoint.
  *
  * The survivor rule is order-dependent but NON-recursive ("earlier
  * SEEN", not "earlier admitted"), so DuckDB restates it exactly: a doc
  * survives iff no exact-Jaccard pair connects it to a doc with a smaller
  * (batch, doc_id) arrival key. A missed candidate (LSH recall), a false
  * admit, or an order violation all flip the hash. Engine booleans pin the
  * rest: the stream's survivor set equals an independently-computed batch
  * expectation from [[Dedup.ngramJaccardPairs]] (`matches_batch_expected`),
  * and a full re-send after the drain admits zero rows and bumps no
  * version (`resend_noop_ok` — every id is in the grams index, the 8-byte
  * anti-join short-circuits the whole pipeline).
  */
object StreamNearDupQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-streamneardup")
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
    val q = StreamingDedup.startNearDupSink(
      stream.toDF().toDF("doc_id", "text", "lang", "source"),
      root, checkpoint = work.resolve("ckpt").toString,
      idCol = "doc_id", textCol = "text", partitionCols = Seq("lang"),
      // 100 ms tick (r16): the gate drives batches with addData +
      // processAllAvailable, so batch BOUNDARIES are pinned by the drain,
      // not the tick — a 1 s tick only added up to 1 s of dead wait per
      // batch before the body started. Identical rows at any interval.
      triggerInterval = "100 milliseconds")
    try {
      Seq(batch0, batch1, batch2).foreach { b =>
        stream.addData(b.as[(Long, String, String, String)].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val store = GraftStore.readStore(spark, root)
      .select($"doc_id", $"lang", $"source").persist()

    // full re-send: every id is already in the grams index → 0 admitted,
    // version untouched
    val vBefore = GraftStore.liveVersionOf(spark, root)
    val resend = StreamingDedup.nearDupAppendBatch(spark, root, docs.toDF(),
      "doc_id", "text", Seq("lang"), commitId = "d11-resend")
    val resendNoopOk = resend.admitted == 0 &&
      GraftStore.liveVersionOf(spark, root) == vBefore

    // independent batch expectation: exact pairs (no df cap — exactness
    // beats the posting guard at gate scale), arrival order (batch, id)
    // both edge directions from ONE pass (a unionAll of pairs + its flip
    // would inline and re-run the whole pair pipeline twice — the
    // connectedComponents edges trick)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Long.MaxValue)
      .select($"id_a", $"id_b")
    val sym = pairs.select(explode(array(
        struct($"id_a", $"id_b"),
        struct($"id_b".as("id_a"), $"id_a".as("id_b")))).as("e"))
      .select($"e.id_a".as("id_a"), $"e.id_b".as("id_b"))
    val dupTargets = sym.filter(
      ($"id_a" % 3 < $"id_b" % 3) ||
        ($"id_a" % 3 === $"id_b" % 3 && $"id_a" < $"id_b"))
      .select($"id_b".as("doc_id")).distinct()
    // persisted: the two exceptAll directions would otherwise each re-run
    // the exact-pairs pipeline feeding this frame
    val expected = docs.join(dupTargets, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source").persist()
    val matches = store.exceptAll(expected).count() == 0 &&
      expected.exceptAll(store).count() == 0
    expected.unpersist()

    docs.unpersist()
    val out = store.select($"doc_id", $"lang", $"source",
      lit(matches).as("matches_batch_expected"),
      lit(resendNoopOk).as("resend_noop_ok"))
      .orderBy($"doc_id")
    store.unpersist()
    out
  }
}
