package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x19 — the `format("graft")` connector
  * ([[graft.sources.GraftSourceProvider]]) as an oracle gate.
  *
  * Everything a reference user's `spark.read` would touch runs through the
  * public data-source surface, no [[GraftStore]] calls on the query side:
  *
  *   1. ingest `events` as a hive-partitioned versioned store, then land a
  *      second day through `df.write.format("graft").mode("append")` — the
  *      atomic commit protocol behind an ordinary writer API;
  *   2. replay the same `commitId` — exactly-once (engine-gated: the row
  *      count must not double);
  *   3. time travel: `versionAsOf` the pre-append snapshot must show only
  *      the first commit's rows (engine-gated);
  *   4. the gate's output: a `--since 7d` aggregate over
  *      `spark.read.format("graft")` with a pushed `time_ns` filter — the
  *      native file-scan tier with stats skipping (the plan-level file-count
  *      assert lives in GraftSourceSpec; DuckDB restates the VALUES from
  *      `events`, so a skipped-but-needed file flips the hash).
  */
object StoreSourceQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  val SinceSeconds: Long = 7L * 86400

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-src-x19")
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
    val (head, tail) = (df.filter($"date" =!= dates.last),
      df.filter($"date" === dates.last))
    LogIngest.writeHive(head, root, partitionCols = parts)
    val vBefore = GraftStore.liveVersionOf(spark, root)
    val nBefore = spark.read.format("graft").load(root).count()

    // append through the WRITER surface — atomic commit, exactly-once
    def append(): Unit = tail.write.format("graft")
      .option("partitionColumns", parts.mkString(","))
      .option("commitId", "x19-append")
      .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    append()
    val nAfter = spark.read.format("graft").load(root).count()
    require(nAfter == df.count(),
      s"append through format(graft) lost rows: $nAfter != ${df.count()}")
    append() // replayed commitId: must be a no-op
    require(spark.read.format("graft").load(root).count() == nAfter,
      "replayed commitId doubled rows through the writer surface")

    // time travel through the READER surface
    val nOld = spark.read.format("graft")
      .option("versionAsOf", vBefore.toString).load(root).count()
    require(nOld == nBefore,
      s"versionAsOf($vBefore) read $nOld rows, expected $nBefore")

    // the gate's output: --since 7d aggregate, pushed filter → stats skip
    val maxNs = df.agg(max($"time_ns")).as[Long].head()
    val cutoff = maxNs - SinceSeconds * 1000000000L
    spark.read.format("graft").load(root)
      .filter($"time_ns" >= cutoff)
      .groupBy($"pod")
      .agg(count(lit(1)).as("n"),
        sum(length($"message")).cast("long").as("msg_chars"))
      .orderBy($"pod")
  }
}
