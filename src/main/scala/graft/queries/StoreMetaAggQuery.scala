package graft.queries

import graft.Tables
import graft.logs._
import graft.plans.PlanScans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x23 — [[graft.plans.GraftMetadataAggregate]] end-to-end, oracle-gated:
  * count / `min`/`max(time_ns)` / `max(date)` over a `format("graft")`
  * store, under a PARTITION-only filter, answered from the commit-time
  * stats sidecar + directory values with ZERO data-file I/O (the
  * Delta/Iceberg partition-scoped stats-count). Every aggregate below is
  * `require()`d to plan WITHOUT a file scan — then DuckDB restates the
  * same numbers by actually scanning `events`, so a drifted sidecar, a
  * mis-merged directory group, or a filter that keeps or drops the wrong
  * dir all flip the hash red.
  *
  * At 100 TB the point is the plan shape: "rows per day since last week"
  * touches the manifest tier only — no listing, no footers, no scan.
  */
object StoreMetaAggQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def scanless(d: DataFrame): Boolean = PlanScans.scanless(d)

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-metaagg")
    val root = work.resolve("lake").toString
    val ev = Tables.events(spark, dir)
    val df = ev.select(
      CriFunctions.nanosToTimestamp(col("ts")).as("time"),
      col("ts").as("time_ns"), lit("stdout").as("stream"),
      lit("F").as("logtag"), col("props").as("message"),
      lit("dev").as("cluster"), lit("ns0").as("namespace"),
      lit("n1").as("node"), lit("p1").as("pod"), lit("app").as("container"))
      .withColumn("date", date_format(col("time"), "yyyy-MM-dd"))
    LogIngest.writeHive(df, root, partitionCols = Seq("cluster", "namespace", "date"))

    // whole-day cutoff: the date of (newest event − 7 days), UTC — both
    // engines restate it independently from the data
    val maxNs = ev.agg(max(col("ts"))).head.getLong(0)
    val cutoff = java.time.Instant
      .ofEpochSecond(maxNs / 1000000000L, maxNs % 1000000000L)
      .minusSeconds(7L * 86400)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

    val t = spark.read.format("graft").load(root)
    // the three probes, each pinned scanless BEFORE collecting
    val total = t.groupBy().count()
    require(scanless(total), "x23: global count must be metadata-only")
    val totalOk = total.as[Long].head() == df.count()
    val fresh = t.groupBy().agg(max($"date").as("hi"))
      .select($"hi".cast("string"))
    require(scanless(fresh), "x23: max(partition col) must be metadata-only")
    val freshOk = fresh.as[String].head() ==
      df.agg(max($"date")).as[String].head()
    val grouped = t.filter($"date" >= cutoff).groupBy($"date")
      .agg(count(lit(1)).as("n_rows"),
        min($"time_ns").as("lo"), max($"time_ns").as("hi"))
    require(scanless(grouped),
      "x23: partition-filtered grouped aggregate must be metadata-only")

    grouped.select(
      $"date".cast("string").as("date"), $"n_rows",
      expr("lo div 1000").as("lo_us"), expr("hi div 1000").as("hi_us"),
      lit(totalOk).as("total_count_ok"),
      lit(freshOk).as("freshness_probe_ok"))
      .orderBy($"date")
  }
}
