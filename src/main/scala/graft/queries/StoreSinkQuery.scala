package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** x22 — `df.writeStream.format("graft")`
  * ([[graft.streaming.GraftStreamSink]]) as an oracle gate: the connector's
  * native streaming SINK, exercised as the store-to-store bus.
  *
  * The fixture ingests the older days of `events` into a SOURCE store,
  * then runs `readStream.format("graft")` (bootstrap) into
  * `writeStream.format("graft")` on a DESTINATION store — every micro-batch
  * an atomic commit keyed `k<sink>-b<batch>`. Mid-stream, the newest day is
  * committed to the source and must flow through; then the SAME checkpoint
  * is restarted with nothing new pending, which must commit nothing (the
  * replay guard, not sink luck). DuckDB restates the per-pod totals from
  * `events`, so a dropped, doubled, or resurrected batch anywhere on the
  * bus flips the hash; engine-side `require`s pin the intermediate counts
  * so cancelling errors can't hide.
  */
object StoreSinkQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-sink-x22")
    val src = work.resolve("src").toString
    val dst = work.resolve("dst").toString
    val ckpt = work.resolve("ckpt").toString
    val parts = Seq("cluster", "namespace", "date")
    val df = Tables.events(spark, dir).select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      concat(lit("pod-"), ($"user_id" % 4).cast("string")).as("pod"),
      lit("app").as("container"))
      .withColumn("date", date_format($"time", "yyyy-MM-dd"))
    val dates = df.select($"date").distinct().as[String].collect().sorted
    LogIngest.writeHive(df.filter($"date" =!= dates.last), src, partitionCols = parts)

    def runBus(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "0").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .option("partitionColumns", parts.mkString(","))
        .trigger(Trigger.ProcessingTime(50))
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }

    runBus()
    val nHead = df.filter($"date" =!= dates.last).count()
    val bootstrapped = GraftStore.readStore(spark, dst).count()
    require(bootstrapped == nHead,
      s"bootstrap committed $bootstrapped rows to the sink store, expected $nHead")
    // the newest day lands on the source; the restarted bus must deliver
    // exactly it (checkpoint resume), and a second idle restart must
    // commit nothing
    AppendCommit.commit(df.filter($"date" === dates.last), src, parts,
      commitId = Some("x22-tail"), retainSnapshots = 3)
    runBus()
    val vAfter = GraftStore.liveVersionOf(spark, dst)
    val total = GraftStore.readStore(spark, dst).count()
    require(total == df.count(),
      s"sink store holds $total rows after the tailed commit, expected ${df.count()}")
    runBus()
    require(GraftStore.liveVersionOf(spark, dst) == vAfter,
      "an idle restart must not commit a new version")
    require(GraftStore.readStore(spark, dst).count() == total,
      "an idle restart must not change the row count")

    spark.read.format("graft").load(dst)
      .groupBy($"pod")
      .agg(count(lit(1)).as("n"),
        sum(length($"message")).cast("long").as("msg_chars"))
      .orderBy($"pod")
      .localCheckpoint(true)
  }
}
