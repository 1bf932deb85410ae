package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the two `private[sql]` seams a DSv1 streaming connector cannot
  * avoid, each the same seam Spark's own connectors use:
  *   - [[org.apache.spark.sql.execution.streaming.Source.getBatch]] must
  *     return a frame whose logical plan is flagged `isStreaming`, and the
  *     only constructor for that is `SparkSession.internalCreateDataFrame
  *     (..., isStreaming = true)` (the Kafka source's reason for living in
  *     an `org.apache.spark.sql` subpackage);
  *   - [[org.apache.spark.sql.execution.streaming.Sink.addBatch]] receives a
  *     frame bound to the micro-batch's IncrementalExecution — running batch
  *     operators on it directly double-executes the plan, so a sink
  *     re-wraps `queryExecution.toRdd` as a plain batch frame first (what
  *     Delta's sink and Spark's own FileStreamSink do).
  * Nothing else in the engine reaches into Spark internals this way.
  */
object GraftSqlAccess {

  def streamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  def batchFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
