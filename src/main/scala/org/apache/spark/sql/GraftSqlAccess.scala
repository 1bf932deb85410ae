package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to one `private[sql]` seam a DSv1 streaming source cannot avoid:
  * [[org.apache.spark.sql.execution.streaming.Source.getBatch]] must return a
  * frame whose logical plan is flagged `isStreaming`, and the only
  * constructor for that is `SparkSession.internalCreateDataFrame(...,
  * isStreaming = true)`. The built-in Kafka connector lives inside an
  * `org.apache.spark.sql` subpackage for exactly this reason; this object is
  * the same pattern kept to a single function. Nothing else in the engine
  * reaches into Spark internals this way.
  */
object GraftSqlAccess {

  def streamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
