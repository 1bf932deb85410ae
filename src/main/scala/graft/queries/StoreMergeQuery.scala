package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x16 — MERGE/upsert ([[DeleteVectors.mergeByKey]]) as a self-verifying
  * oracle gate: one atomic commit deletes every row whose key appears in the
  * update batch (by deletion vector — zero rewrite) and appends the batch.
  *
  * The fixture stores `events` keyed by `event_id`, partitioned by date.
  * The update batch is fully SQL-derivable: every `event_id % 11 = 0` row
  * comes back with `props = 'UPD'`, and every `event_id % 101 = 0` row
  * spawns a NEW id (`event_id + 10^10`) with `props = 'NEW'` — so DuckDB
  * rebuilds the post-merge table as
  * `(events WHERE id NOT IN updates) UNION ALL updates` and restates the
  * counts and the content checksum. `upsert_exact_ok` pins the multiset
  * identity engine-side; `time_travel_ok` pins the pre-merge snapshot.
  */
object StoreMergeQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-dv-x16")
    val root = work.resolve("lake").toString
    val ev = Tables.events(spark, dir).select(
      $"event_id", $"ts", $"user_id", $"event_type", $"value", $"props",
      date_format(CriFunctions.nanosToTimestamp($"ts"), "yyyy-MM-dd").as("date"))
    LogIngest.writeHive(ev, root, partitionCols = Seq("date"))
    val nTotal = GraftStore.readStore(spark, root).count()

    val updated = ev.filter($"event_id" % 11 === 0)
      .withColumn("props", lit("UPD"))
    val fresh = ev.filter($"event_id" % 101 === 0)
      .withColumn("event_id", $"event_id" + 10000000000L)
      .withColumn("props", lit("NEW"))
    val updates = updated.unionByName(fresh)

    // pre-merge anchor for time travel: at bulk scale the merge's matched
    // deletes can exceed the range cap and materialize copy-on-write (a
    // second, compaction version after the merge commit), so "m.version-1"
    // would point at the merge itself — capture the version explicitly and
    // retain two grace snapshots so it survives both commits
    val v0 = GraftStore.liveVersionOf(spark, root)
    val m = DeleteVectors.mergeByKey(spark, root, updates,
      keyCols = Seq("event_id"), partitionCols = Seq("date"),
      commitId = Some("x16-m1"), retainSnapshots = 2)

    val live = GraftStore.readStore(spark, root)
    // exact multiset identity: survivors + updates (order-insensitive)
    val expected = ev.join(updates.select($"event_id").distinct(),
      Seq("event_id"), "left_anti").unionByName(updates)
      .select(ev.columns.map(col): _*)
    val liveCols = live.select(ev.columns.map(c =>
      col(c).cast(ev.schema(c).dataType)): _*)
    val exact = liveCols.exceptAll(expected).isEmpty &&
      expected.exceptAll(liveCols).isEmpty
    val agg = live.agg(
      count(lit(1)).as("n_live"),
      coalesce(sum(when($"props" === "UPD", 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when($"props" === "NEW", 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(length($"props")).cast("long"), lit(0L))).head()
    val preMerge = GraftStore.readVersion(spark, root, v0).count()

    spark.range(1).select(
      lit(nTotal).as("n_total"),
      lit(m.matchedDeleted).as("n_matched"),
      lit(m.inserted).as("n_inserted"),
      lit(agg.getLong(0)).as("n_live"),
      lit(agg.getLong(1)).as("n_upd_rows"),
      lit(agg.getLong(2)).as("n_new_rows"),
      lit(agg.getLong(3)).as("live_props_chars"),
      lit(exact).as("upsert_exact_ok"),
      lit(preMerge == nTotal).as("time_travel_ok"))
  }
}
