package graft.streaming

import graft.logs.{AppendCommit, MatView}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftSqlAccess, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

/** `df.writeStream.format("graft").start(<store root>)` — every micro-batch
  * is an atomic store commit, the native-sink twin of
  * [[graft.logs.LogStreamIngest.startStoreSink]]'s foreachBatch spelling
  * (and the write half of the connector trilogy: batch read / batch write /
  * stream read / stream write now all speak `format("graft")`).
  *
  * Exactly-once: the commit id `k<sinkId>-b<batchId>` keys replay detection
  * in [[AppendCommit]] — a micro-batch re-delivered after a crash finds its
  * id already committed and no-ops, so restart semantics come from the
  * store's own protocol, not from the engine trusting `addBatch` to never
  * repeat. `sinkId` derives from the checkpoint location, so two queries
  * feeding the SAME store from different checkpoints never collide on
  * (id, batch) — the contract [[graft.logs.LogStreamIngest]] established.
  *
  * The incoming frame is bound to the micro-batch's IncrementalExecution;
  * running batch operators on it directly would re-plan and double-execute
  * it, so the sink re-wraps `queryExecution.toRdd` as a plain batch frame
  * first ([[GraftSqlAccess.batchFrame]] — the FileStreamSink/Delta-sink
  * idiom).
  */
class GraftStreamSink(
    spark: SparkSession,
    root: String,
    sinkId: String,
    partitionCols: Seq[String],
    maxRecordsPerFile: Long,
    retainSnapshots: Int,
    refreshViews: Seq[String]) extends Sink with Logging {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // body frames bind to the stream-session clone with AQE pinned off
    // (GraftSession.microBatchSession): the commit's work is
    // trigger-bounded, so per-stage re-planning is pure driver latency
    val sess = graft.GraftSession.microBatchSession(data)
    val batch = GraftSqlAccess.batchFrame(
      sess, data.queryExecution.toRdd, data.schema)
    val committed = AppendCommit.commit(batch, root,
      partitionCols = partitionCols,
      maxRecordsPerFile = maxRecordsPerFile,
      commitId = Some(s"k$sinkId-b$batchId"),
      retainSnapshots = retainSnapshots)
    logInfo(s"graft sink $root: batch $batchId -> version ${committed.version}")
    // live IVM: views over THIS store catch up inside the same batch, so a
    // dashboard aggregate is never more than one trigger behind the stream
    refreshViews.foreach(MatView.refresh(sess, root, _))
  }

  override def toString: String = s"GraftStreamSink[$root, sink=$sinkId]"
}
