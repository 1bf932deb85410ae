package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x24 — generalized data skipping ([[FileStats.ColStat]] +
  * `GraftFileIndex.colRanges`), oracle-gated end-to-end.
  *
  * Two commits land disjoint `uid` ranges (low half, high half) into a
  * date-partitioned store; the commit-time sidecar records per-column
  * min/max for every primitive leaf column. The engine then answers a
  * `uid`-windowed aggregate through `format("graft")` and `require()`s
  * that the scan touched FEWER files than the snapshot holds — the
  * pushed window pruned the file list from sidecar stats alone, before
  * any footer was opened (the `--since` listing-scale economics extended
  * to an ad-hoc column). DuckDB restates the same aggregate from raw
  * `events`, so over-pruning (a dropped matching file) or under-pruning
  * corrupting results flips the hash; the file-count require pins that
  * pruning actually happened.
  */
object StoreColPrunedQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-colpruned")
    val root = work.resolve("lake").toString
    val parts = Seq("cluster", "namespace", "date")
    val ev = Tables.events(spark, dir)
    def half(rows: DataFrame, uidBase: Long) = rows.select(
      CriFunctions.nanosToTimestamp(col("ts")).as("time"),
      col("ts").as("time_ns"), lit("stdout").as("stream"),
      lit("F").as("logtag"), col("props").as("message"),
      lit("dev").as("cluster"), lit("ns0").as("namespace"),
      lit("n1").as("node"), lit("p1").as("pod"), lit("app").as("container"),
      (lit(uidBase) + col("user_id")).as("uid"))
      .withColumn("date", date_format(col("time"), "yyyy-MM-dd"))
    // low half: even event ids with uid = user_id; high half: odd event
    // ids with uid = 1e9 + user_id — each date dir gets files from BOTH
    // commits, so a uid window must drop roughly half the files per dir
    LogIngest.writeHive(half(ev.filter(col("event_id") % 2 === 0), 0L),
      root, partitionCols = parts)
    AppendCommit.commit(half(ev.filter(col("event_id") % 2 === 1),
      1000000000L), root, parts, commitId = Some("x24-high"))

    val t = spark.read.format("graft").load(root)
    val total = t.inputFiles.length
    val q = t.filter(col("uid") >= 1000000000L)
      .select(col("time_ns"), col("uid"))
    q.collect() // execute the pruned scan so its metrics are real
    val scanned = graft.plans.PlanScans.fileScans(q)
      .head.metrics("numFiles").value
    require(scanned < total,
      s"x24: pushed uid window must prune the file list ($scanned of $total)")

    // `div`, not `/`: exact integer ns→µs like every oracle-matched cast
    q.select(expr("time_ns div 1000").as("time_us"), col("uid"),
        lit(scanned < total).as("files_pruned"))
      .orderBy(col("time_us"), col("uid"))
  }
}
