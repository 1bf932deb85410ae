package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x21 — debt-gated auto-maintenance ([[Maintenance]]) as an oracle gate.
  *
  * The fixture manufactures BOTH debt kinds the policy acts on: a
  * small-file storm (tiny `maxRecordsPerFile` at ingest) and pending
  * deletion vectors (a content-predicate `deleteWhere`). One
  * `Maintenance.run` — with the partition layout INFERRED from the
  * manifest, no hints — must compact the storm AND materialize the vectors
  * in a single commit; a second run must find a clean store and flip
  * nothing (engine-gated: the live version is unchanged). The gate's
  * output reads the maintained store back through the PUBLIC
  * `format("graft")` surface and aggregates per pod; DuckDB restates it
  * from `events` minus the deleted predicate, so maintenance losing or
  * resurrecting even one row flips the hash.
  */
object StoreMaintainQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-maintain-x21")
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

    // Both debt kinds scoped to ONE date partition (the x17/x18 precedent:
    // the gate demonstrates the pruned path, so the pass should rewrite one
    // day's files, not the store): the oldest date lands as a small-file
    // storm via a tiny-maxRecordsPerFile append, and the delete predicate
    // targets the same day.
    val oldest = df.agg(min($"date")).as[String].head()
    val oldDay = df.filter($"date" === oldest)
    // base days write ONE file per partition at any sf (no row cap): with the
    // default 1M-row cap, sf100's base days split into >dirtyMaxFiles files
    // and read as debt of their own, breaking the one-dirty-partition
    // precondition below before the gate even runs (r12 rehearsal)
    LogIngest.writeHive(df.filter($"date" =!= oldest), root,
      maxRecordsPerFile = Long.MaxValue, partitionCols = parts)
    // storm size scales with the day's rows so the partition is dirty at
    // ANY sf (a single-file partition is never dirty by the shared rule)
    AppendCommit.commit(oldDay, root, parts,
      maxRecordsPerFile = math.max(1L, oldDay.count() / 8),
      commitId = Some("x21-storm"))
    // `div` keeps the ns→µs step in exact integer arithmetic — `/` would go
    // through double and round differently than DuckDB's epoch_us at 2⁶⁰ ns
    val del = $"date" === oldest && expr("((time_ns div 1000) % 97) < 13")
    val deleted = DeleteVectors.deleteWhere(spark, root, del,
      commitId = Some("x21-del")).deletedRows

    val d0 = Maintenance.debt(spark, root)
    require(d0.dirtyPartitions == 1 && d0.pendingDeleteRows == deleted,
      s"fixture failed to manufacture one-partition debt: $d0")

    val r1 = Maintenance.run(spark, root) // layout inferred, both debts cleared
    require(r1.compacted && r1.after.dirtyPartitions == 0 &&
      r1.after.pendingDeleteRows == 0,
      s"maintenance left debt behind: ${r1.after}")

    val vStable = GraftStore.liveVersionOf(spark, root)
    val r2 = Maintenance.run(spark, root) // clean: no lease, no version flip
    require(!r2.compacted &&
      GraftStore.liveVersionOf(spark, root) == vStable,
      "a clean maintenance pass must not commit a version")

    spark.read.format("graft").load(root)
      .groupBy($"pod")
      .agg(count(lit(1)).as("n"),
        sum(length($"message")).cast("long").as("msg_chars"))
      .orderBy($"pod")
  }
}
