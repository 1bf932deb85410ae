package graft.tools

import graft.GraftSession

/** Empirical check: what conf does the foreachBatch batch's session carry?
  * (Spark warns that AQE "will be disabled" for streaming — this probe pins
  * whether that reaches the stream-session clone the batch frames bind to.)
  */
object StreamSessionProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-ssprobe")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        println("PROBE adaptive=" + s.conf.get("spark.sql.adaptive.enabled") +
          " sameSession=" + (s eq spark) +
          " shufflePartitions=" + s.conf.get("spark.sql.shuffle.partitions"))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssprobe").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    stream.addData(1L, 2L, 3L)
    q.processAllAvailable()
    q.stop()
    println("PROBE main adaptive=" + spark.conf.get("spark.sql.adaptive.enabled"))
    spark.stop()
  }
}
