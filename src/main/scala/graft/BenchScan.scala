package graft

import graft.logs._
import org.apache.spark.sql.functions._

/** Columnar-source comparison: the SAME log data written to the positional
  * store as parquet AND Arrow IPC (Feather v2 + ZSTD, the reference's
  * compact-stage format), scanned through the same LogQuery plan. Answers
  * "what does the DSv2 Arrow reader (S7) buy" with a number instead of a
  * claim — cold (first execution, includes plan + codegen) and warm (min of
  * the following runs) for a projection-pruned filter+count shape.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 graft.BenchScan`
  * Prints one JSON line per format.
  */
object BenchScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCHSCAN_RUNS", "4").toInt
    val spark = GraftSession.local("graft-benchscan")
    val work = java.nio.file.Files.createTempDirectory("graft-benchscan")
    val store = work.resolve("lake").toString

    // log-shaped rows from the events table (the driver's parquet fixtures),
    // written once to each format of the positional layout
    val df = Tables.events(spark, sfDir).select(
      CriFunctions.nanosToTimestamp(col("ts")).as("time"),
      col("ts").as("time_ns"),
      when(col("event_type") === "error", "stderr").otherwise("stdout").as("stream"),
      lit("F").as("logtag"),
      col("props").as("message"),
      lit("dev").as("cluster"),
      concat(lit("ns"), pmod(col("user_id"), lit(4))).as("namespace"),
      lit("n1").as("node"),
      concat(lit("pod-"), pmod(col("user_id"), lit(8))).as("pod"),
      lit("app").as("container"))
    val t = java.time.Instant.parse("2024-02-01T00:00:00Z")
    LogIngest.writePositional(df, store, uploadTime = t)
    graft.sources.ArrowLogWriter.writePositional(df, store, uploadTime = t)
    val rows = df.count()

    def scan(format: LogFormat): Long = {
      val q = LogQuery(LogSelector.parse("""{namespace="ns1"}"""),
        output = LogOutput.Raw, format = format).dataFrame(spark, store)
      q.filter(col("message").contains("7")).count()
    }
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    // one untimed scan per format first: whichever format ran first would
    // otherwise pay the shared JVM/JIT/scan-machinery warmup inside its
    // "cold" number, biasing the comparison toward the second format
    Seq(LogFormat.Parquet, LogFormat.Arrow).foreach(scan)
    for (fmt <- Seq(LogFormat.Parquet, LogFormat.Arrow)) {
      val (cold, n) = time(scan(fmt))
      val warms = (2 to runs).map(_ => time(scan(fmt))._1)
      val warm = if (warms.nonEmpty) warms.min else cold
      val name = if (fmt == LogFormat.Parquet) "parquet" else "arrow"
      println(f"""{"metric":"scan_$name","cold":$cold%.3f,"warm":$warm%.3f,"unit":"sec","matched":$n,"rows":$rows,"sf":"$sfDir"}""")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    spark.stop()
  }
}
