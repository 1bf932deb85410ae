package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x18 — queryable metadata tables ([[MetaTables]]) as a self-verifying
  * oracle gate: the store answers "rows per date partition" from its
  * METADATA TIER ALONE (manifest walk + stats sidecar, zero data-file I/O),
  * and DuckDB restates the same numbers by actually scanning `events` — so
  * a drifted sidecar, a mis-carried manifest entry, or a stats line the
  * commit forgot all flip the hash red.
  *
  * Lifecycle driven (every number from metadata, booleans engine-verified):
  *   v1  ingest → `files(v1)` fully stats-covered, per-date rows
  *   v2  row-level delete → `deletes()` shows exactly the pending
  *       vector debt, file stats UNCHANGED (merge-on-read: physical rows
  *       stay until materialization)
  *   v3  compaction → debt drained to empty, refreshed stats sum to
  *       total − deleted
  *   `snapshots()` carries the whole history with commit records.
  */
object StoreMetaQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-meta-x18")
    val root = work.resolve("lake").toString
    val parts = Seq("cluster", "namespace", "date")
    val df = Tables.events(spark, dir).select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      lit("p1").as("pod"), lit("app").as("container"))
      .withColumn("date", date_format($"time", "yyyy-MM-dd"))
    LogIngest.writeHive(df, root, partitionCols = parts)
    val nTotal = df.count()

    // v1 metadata: per-date row counts WITHOUT touching a data file
    val v1 = GraftStore.liveVersionOf(spark, root)
    val filesV1 = MetaTables.files(spark, root, Some(v1)).persist()
    val statsCoverAll = filesV1.filter(!$"stats_fresh").count() == 0
    val perDate = filesV1
      .withColumn("date", regexp_extract($"key", "date=(\\d{4}-\\d{2}-\\d{2})", 1))
      .groupBy($"date").agg(coalesce(sum($"rows"), lit(0L)).as("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val metaRowsV1 = perDate.values.sum
    filesV1.unpersist()

    // v2: merge-on-read delete — metadata shows the debt, physical stats
    // unchanged
    // partition-scoped delete (~90% of the oldest date's rows — props
    // lengths are 8 or 9): the vector, the CDC, and the materializing
    // compaction all touch ONE partition (see StoreMatViewQuery)
    val oldest = perDate.keys.min
    val c = DeleteVectors.deleteWhere(spark, root,
      length($"message") === 9 && $"date" === oldest,
      commitId = Some("x18-del"))
    val debt = MetaTables.deletes(spark, root)
      .agg(coalesce(sum($"deleted_positions"), lit(0L))).head().getLong(0)
    val debtOk = c.deletedRows > 0 && debt == c.deletedRows
    val v2Rows = MetaTables.files(spark, root)
      .agg(coalesce(sum($"rows"), lit(0L))).head().getLong(0)
    val morUnchangedOk = v2Rows == metaRowsV1

    // v3: compaction materializes — debt drains, stats re-sum to live rows
    Compaction.compactHive(spark, root, partitionCols = parts)
    val debtAfter = MetaTables.deletes(spark, root).count()
    val v3Rows = MetaTables.files(spark, root)
      .agg(coalesce(sum($"rows"), lit(0L))).head().getLong(0)
    val drainedOk = debtAfter == 0 && v3Rows == nTotal - c.deletedRows

    // history: every version has a snapshot row; the live one carries a
    // commit record and a stats-backed row count
    val snaps = MetaTables.snapshots(spark, root).orderBy($"version").collect()
    val live = snaps.filter(_.getBoolean(1))
    val historyOk = snaps.nonEmpty && live.length == 1 &&
      !live.head.isNullAt(4) && live.head.getLong(4) == v3Rows &&
      !live.head.isNullAt(5)

    perDate.toSeq.sortBy(_._1).toDF("date", "n_rows")
      .select($"date", $"n_rows",
        lit(statsCoverAll).as("stats_cover_all"),
        lit(debtOk).as("delete_debt_ok"),
        lit(morUnchangedOk).as("mor_stats_unchanged"),
        lit(drainedOk).as("debt_drained_ok"),
        lit(historyOk).as("history_ok"))
      .orderBy($"date")
  }
}
