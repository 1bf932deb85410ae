package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** x20 — `spark.readStream.format("graft")`
  * ([[graft.streaming.GraftStreamSource]]) as an oracle gate: the store
  * tailed as a structured stream.
  *
  * The fixture ingests the older days of `events` into a versioned store,
  * starts a bootstrap stream (`startingVersion=0` — first batch is the full
  * snapshot), then commits the newest day through the atomic append
  * protocol WHILE the stream runs. The memory sink must end up holding
  * exactly one copy of every event — bootstrap plus tailed commit, no
  * re-delivery, no loss across the version boundary. DuckDB restates the
  * per-pod totals straight from `events`, so a dropped or doubled batch
  * flips the hash; the engine-side `require` pins the intermediate
  * (pre-append) count so the gate fails even if a loss and a duplication
  * were to cancel out in the final aggregate.
  */
object StoreTailQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-tail-x20")
    val root = work.resolve("lake").toString
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
    LogIngest.writeHive(df.filter($"date" =!= dates.last), root, partitionCols = parts)

    val sink = s"graft_x20_${System.nanoTime()}"
    // aggregate ON THE STREAM (complete mode): the memory sink then holds
    // O(pods) rows, not the dataset — a raw-row memory sink OOMed the
    // driver at the sf100 rehearsal (the whole events table on the heap).
    // Delivery accounting is unchanged: a dropped batch deflates n, a
    // re-delivered one inflates it, so both requires still pin
    // exactly-once across the version boundary.
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0").load(root)
      .groupBy($"pod")
      .agg(count(lit(1)).as("n"),
        sum(length($"message")).cast("long").as("msg_chars"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime(50)).start()
    def delivered(): Long =
      spark.table(sink).agg(coalesce(sum($"n"), lit(0L))).head.getLong(0)
    try {
      q.processAllAvailable()
      val bootstrapped = delivered()
      val nHead = df.filter($"date" =!= dates.last).count()
      require(bootstrapped == nHead,
        s"bootstrap delivered $bootstrapped rows, snapshot holds $nHead")
      AppendCommit.commit(df.filter($"date" === dates.last), root, parts,
        commitId = Some("x20-tail"))
      q.processAllAvailable()
      val total = delivered()
      require(total == df.count(),
        s"stream holds $total rows after the tailed commit, expected ${df.count()}")
      spark.table(sink)
        .orderBy($"pod")
        // materialize before the stream (and its memory table) is torn down
        .localCheckpoint(true)
    } finally {
      q.stop()
      // the memory sink registers a temp view under the sink name — drop it
      // or every x20 run leaves a catalog entry (Bench's residue metric)
      spark.catalog.dropTempView(sink)
    }
  }
}
