package graft.ext

import graft.logs.{AppendCommit, GraftStore, LogIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ONLINE exact deduplication: documents arrive as a stream, and only
  * content never seen before is admitted into a versioned corpus store —
  * the continuous-ingest counterpart of [[Dedup.exact]], and the shape a
  * training-data pipeline actually runs (the crawl never stops; dedup
  * cannot be a nightly batch over the full corpus).
  *
  * Per micro-batch:
  *   1. fingerprint = `xxhash64(text)` — 8 bytes ride the shuffles, never
  *      document bodies (the [[Dedup]] scale rule);
  *   2. in-batch first-writer-wins: min id per fingerprint (one
  *      batch-sized shuffle);
  *   3. cross-batch: LEFT ANTI join against the corpus' `fingerprint`
  *      column — a single-column Parquet scan (column pruning leaves the
  *      text bytes on disk), distinct-ed to 8-byte keys. At 100 TB the
  *      admitted-signature side is what a bucketed signature index would
  *      serve; the read path is already the narrowest possible scan;
  *   4. survivors commit atomically ([[AppendCommit]]) with an
  *      exactly-once `d<sinkId>-b<batchId>` id — a replayed batch
  *      re-deduplicates to the same survivors and the commit no-ops.
  *
  * First-batch edge: a dataless store (fresh sink) admits everything.
  */
object StreamingDedup {

  final case class BatchResult(streamed: Long, admitted: Long,
      droppedInBatch: Long, droppedExisting: Long, version: Int,
      replayed: Boolean)

  /** Deduplicate ONE batch against the store and commit the survivors.
    * The streaming sink calls this per micro-batch; batch pipelines can
    * call it directly (e.g. nightly drops of a new crawl slice).
    */
  def dedupAppendBatch(spark: SparkSession, storeRoot: String,
      batch: DataFrame, idCol: String, textCol: String,
      partitionCols: Seq[String], commitId: Option[String] = None,
      maxRecordsPerFile: Long = 1000000L): BatchResult = {
    val withFp = batch.withColumn("fingerprint", xxhash64(col(textCol)))
      .persist()
    try {
      val streamed = withFp.count()
      val inBatch = withFp
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("fingerprint")).orderBy(col(idCol))))
        .filter(col("_rn") === 1).drop("_rn")
      val seen =
        if (GraftStore.isDataless(spark, storeRoot))
          None // dataless store: first batch admits everything
        else Some(GraftStore.readStore(spark, storeRoot)
          .select(col("fingerprint")).distinct())
      val fresh = seen.fold(inBatch)(s =>
        inBatch.join(s, Seq("fingerprint"), "left_anti")).persist()
      try {
        val admitted = fresh.count()
        val inBatchCount = inBatch.count()
        if (admitted == 0)
          // fully-duplicate batch: no version churn; idempotent under
          // replay (a re-run re-deduplicates to the same zero survivors)
          BatchResult(streamed, 0L,
            droppedInBatch = streamed - inBatchCount,
            droppedExisting = inBatchCount,
            version = GraftStore.liveVersionOf(spark, storeRoot),
            replayed = false)
        else {
          val committed = AppendCommit.commit(fresh, storeRoot,
            partitionCols = partitionCols,
            maxRecordsPerFile = maxRecordsPerFile, commitId = commitId)
          BatchResult(streamed, admitted,
            droppedInBatch = streamed - inBatchCount,
            droppedExisting = inBatchCount - admitted,
            version = committed.version, replayed = committed.replayed)
        }
      } finally fresh.unpersist()
    } finally withFp.unpersist()
  }

  /** Continuous online dedup: every micro-batch of `docs` admits only
    * never-seen content into the store, exactly-once per batch.
    */
  def startDedupSink(docs: DataFrame, storeRoot: String, checkpoint: String,
      idCol: String, textCol: String, partitionCols: Seq[String],
      triggerInterval: String = "60 seconds",
      maxRecordsPerFile: Long = 1000000L): StreamingQuery = {
    val spark = docs.sparkSession
    val sinkId = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(checkpoint))
    LogIngest.ensureStore(spark, storeRoot)
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dedupAppendBatch(spark, storeRoot, batch.toDF(), idCol, textCol,
          partitionCols, commitId = Some(s"d$sinkId-b$batchId"),
          maxRecordsPerFile = maxRecordsPerFile)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
  }
}
