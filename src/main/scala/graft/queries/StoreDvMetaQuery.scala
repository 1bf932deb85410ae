package graft.queries

import graft.Tables
import graft.logs._
import graft.plans.PlanScans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x26 — DV-aware metadata-only aggregates: COUNT (global and
  * partition-grouped under a partition filter) and `max(partition col)`
  * over a `format("graft")` store with LIVE deletion vectors, answered
  * from the stats sidecar MINUS the deletes sidecar's exact per-file
  * counts — zero data-file I/O while merge-on-read debt is outstanding
  * (r13 behavior: any live vector failed the rewrite open to a full scan
  * + anti-join). Each metadata probe is `require()`d scanless; the
  * data-column `min(time_ns)` is `require()`d to NOT be answered from
  * stats (a deleted row may hold the extreme) and its scanned value rides
  * the output for DuckDB to restate.
  *
  * At 100 TB the point: "rows per day" stays an instant manifest-tier
  * answer even between a bulk GDPR strike and the compaction that
  * materializes it.
  */
object StoreDvMetaQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def readless(d: DataFrame): Boolean = PlanScans.readless(d)

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-dvmeta")
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

    // the strike: a scattered time predicate both engines restate (~13% of
    // rows — x15's second delete; exact integer µs arithmetic on both
    // sides). The range cap is LIFTED for this gate (uncapped, no
    // materialize fallback): its whole point is metadata-only answers while
    // merge-on-read debt is outstanding, so the vectors must remain live at
    // every scale — at sf100 that is a ~13M-range sidecar, the honest
    // "between a bulk GDPR strike and its compaction" state. x15 is the
    // gate that exercises the over-cap rewrite itself.
    val c = DeleteVectors.deleteWhere(spark, root,
      expr("((time_ns div 1000) % 97) < 13"), commitId = Some("x26-d1"),
      maxRanges = Int.MaxValue, materializeOverCap = false)
    require(!c.materialized && c.deletedRows > 0,
      s"x26 needs live (non-materialized) deletion vectors, got $c")

    // whole-day cutoff: the date of (newest event − 7 days), UTC — both
    // engines restate it independently from the data
    val maxNs = ev.agg(max(col("ts"))).head.getLong(0)
    val cutoff = java.time.Instant
      .ofEpochSecond(maxNs / 1000000000L, maxNs % 1000000000L)
      .minusSeconds(7L * 86400)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

    val t = spark.read.format("graft").load(root)
    // 1. global live count: stats rows − deleted, no scan
    val total = t.groupBy().count()
    require(readless(total),
      "x26: global live count must be metadata-only under live DVs")
    val totalLive = total.as[Long].head()
    // 2. freshness probe: partition values witnessed by LIVE rows stay exact
    val fresh = t.groupBy().agg(max($"date").as("hi")).select($"hi".cast("string"))
    require(readless(fresh),
      "x26: max(partition col) must stay metadata-only under live DVs")
    val maxDate = fresh.as[String].head()
    // 3. partition-filtered grouped live counts, still zero-I/O
    val grouped = t.filter($"date" >= cutoff).groupBy($"date")
      .agg(count(lit(1)).as("n_rows"))
    require(readless(grouped),
      "x26: partition-filtered grouped live count must be metadata-only")
    // 4. a DATA-column extreme must NOT be answered from stats while
    //    vectors are live — the deleted rows could hold it
    val mn = t.groupBy().agg(min($"time_ns").as("lo"))
    require(!readless(mn),
      "x26: min(data col) under live DVs must fall back to the real scan")
    val loUs = mn.select(expr("lo div 1000")).as[Long].head()

    grouped.select(
      $"date".cast("string").as("date"), $"n_rows",
      lit(totalLive).as("total_live"),
      lit(maxDate).as("max_date"),
      lit(loUs).as("lo_us"),
      lit(true).as("dv_live_ok"))
      .orderBy($"date")
  }
}
