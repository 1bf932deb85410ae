package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x17 — incrementally-maintained materialized aggregate ([[MatView]]) as a
  * self-verifying oracle gate.
  *
  * The gate drives the full view lifecycle against a versioned store built
  * from `events`, exercising every delta source the store can produce:
  *
  *   v1  ingest everything EXCEPT the newest calendar date
  *       → `MatView.create` (full compute, view v1)
  *   v2  ATOMIC append of the held-out date ([[AppendCommit]])
  *       → refresh: delta = exactly the appended rows (`append_delta_ok`)
  *   v3  row-level delete ([[DeleteVectors.deleteWhere]], scoped to the
  *       oldest date partition) → refresh: the view DECREMENTS through
  *       deletion-vector CDC, reading only that partition's files
  *   v4  incremental compaction → refresh: contents-preserving commit,
  *       delta is EMPTY, the view only re-bases (`compact_delta_zero`)
  *   —   head unchanged → refresh is a pointer-read no-op (`noop_ok`)
  *
  * The output is the final view itself — per event_type row count and an
  * exact fixed-point value sum — which DuckDB restates straight from
  * `events` minus the delete predicate. `incremental_matches_full` pins the
  * maintenance identity: after three refreshes the view is bit-identical to
  * a from-scratch recompute of the store head (exceptAll both ways, exact
  * integer arithmetic — see [[MatView]] on why LONG sums make this exact).
  *
  * Scale: each refresh reads the CHANGED files (rowDiff's key-level
  * pruning) plus the aggregate-sized view — never the store. The 100 TB
  * dashboard refresh this models touches one day's partitions, not 10⁸
  * objects.
  */
object StoreMatViewQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-mv-x17")
    val root = work.resolve("lake").toString
    val viewDir = work.resolve("view").toString
    val parts = Seq("cluster", "namespace", "date")
    // fixed-point value column at ingest: floor(value*1000) — floor is
    // sign-robust and identical in both engines, and LONG sums keep the
    // incremental maintenance exact (MatView scaladoc)
    val df = Tables.events(spark, dir).select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), $"event_type",
      floor($"value" * 1000).cast("long").as("value_milli"),
      lit("dev").as("cluster"), lit("ns0").as("namespace"),
      lit("n1").as("node"), lit("p1").as("pod"), lit("app").as("container"))
      .withColumn("date", date_format($"time", "yyyy-MM-dd"))
    val dates = df.select($"date").distinct().as[String].collect().sorted
    require(dates.length > 1, s"fixture too small: ${dates.length} dates")

    LogIngest.writeHive(df.filter($"date" =!= dates.last), root, partitionCols = parts)
    MatView.create(spark, root, viewDir, keys = Seq("event_type"),
      sums = Seq("sum_value_milli" -> "value_milli"))

    // v2: append the held-out newest date, refresh — delta must be exactly
    // the appended rows
    val held = df.filter($"date" === dates.last)
    val heldCount = held.count()
    // small-file mess: guarantees the later compaction finds a dirty
    // partition and genuinely commits a rewrite to re-base over (6 small
    // files is enough to trip the dirty heuristic; a deeper per-file storm
    // is x11's job, not this gate's)
    AppendCommit.commit(held.repartition(6), root, parts,
      commitId = Some("x17-append"))
    val r1 = MatView.refresh(spark, root, viewDir)
    val appendDeltaOk = !r1.noop && r1.deltaRows == heldCount

    // v3: row-level delete (restatable predicate), refresh — the view
    // decrements through deletion-vector CDC
    // partition-scoped delete (oldest date, ~90% of its rows — props
    // lengths are 8 or 9, so `=9` always matches): vectors land in ONE
    // partition, so the vector-CDC refresh and the materializing compaction
    // read one day's files, not the store — the shape this gate is supposed
    // to prove at 100 TB (the first cut vectored EVERY partition and the
    // bench measured a full-store rewrite + full-store diff: 60 s at sf0.1)
    val c3 = DeleteVectors.deleteWhere(spark, root,
      length($"message") === 9 && $"date" === dates.head,
      commitId = Some("x17-delete"))
    val r2 = MatView.refresh(spark, root, viewDir)
    val deleteDeltaOk = !r2.noop && r2.deltaRows == c3.deletedRows

    // v4: contents-preserving compaction, refresh — empty delta, re-base only
    Compaction.compactHive(spark, root, partitionCols = parts)
    val r3 = MatView.refresh(spark, root, viewDir)
    val compactDeltaZero = !r3.noop && r3.deltaRows == 0L

    // head unchanged: refresh must be a pointer-read no-op
    val r4 = MatView.refresh(spark, root, viewDir)
    val noopOk = r4.noop && r4.viewVersion == r3.viewVersion

    // maintenance identity: three incremental refreshes == full recompute
    val view = MatView.readView(spark, viewDir)
    val full = GraftStore.readStore(spark, root)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum($"value_milli").cast("long").as("sum_value_milli"))
    val matches = view.exceptAll(full).count() == 0 &&
      full.exceptAll(view).count() == 0

    view.select(
      $"event_type",
      $"n_rows".as("n_events"),
      $"sum_value_milli",
      lit(appendDeltaOk).as("append_delta_ok"),
      lit(deleteDeltaOk).as("delete_delta_ok"),
      lit(compactDeltaZero).as("compact_delta_zero"),
      lit(noopOk).as("noop_ok"),
      lit(matches).as("incremental_matches_full"))
      .orderBy($"event_type")
  }
}
