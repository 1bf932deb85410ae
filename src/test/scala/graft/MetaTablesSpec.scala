package graft

import graft.logs._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Queryable metadata tables ([[MetaTables]]): files/snapshots/deletes
  * frames agree with the data they describe, stay version-addressable, and
  * mark stale statistics honestly.
  */
class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq("cluster", "namespace", "date")

  private def fixture() = {
    val base = java.time.LocalDate.parse("2026-04-01")
    (0 until 24).map { i =>
      val d = base.plusDays(i % 2).toString
      (java.sql.Timestamp.valueOf(s"$d 00:00:0${i % 10}"),
        1000000000L + i.toLong, "stdout", "F", s"msg-$i",
        "dev", "ns0", "n1", s"pod-${i % 3}", "app", d)
    }.toDF("time", "time_ns", "stream", "logtag", "message",
      "cluster", "namespace", "node", "pod", "container", "date")
  }

  private def tmp(name: String) = {
    val d = Files.createTempDirectory(s"graft-meta-$name")
    d.toFile.deleteOnExit()
    d
  }

  test("files: stats-fresh rows sum to the data, min/max bound the actual values") {
    val root = tmp("files").resolve("lake").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    val files = MetaTables.files(spark, root)
    assert(files.filter(!$"stats_fresh").count() == 0)
    assert(files.agg(sum($"rows")).head().getLong(0) == 24L)
    // per-file ns bounds hold against the data itself
    val bounds = files.select($"key", $"min_time_ns", $"max_time_ns")
      .as[(String, Option[Long], Option[Long])].collect()
    assert(bounds.nonEmpty && bounds.forall { case (_, lo, hi) =>
      lo.isDefined && hi.isDefined && lo.get <= hi.get })
    val (dataLo, dataHi) = (1000000000L, 1000000023L)
    assert(bounds.map(_._2.get).min == dataLo && bounds.map(_._3.get).max == dataHi)
    // byte sizes match the filesystem
    val diskBytes = files.agg(sum($"bytes")).head().getLong(0)
    assert(diskBytes > 0)
  }

  test("files is version-addressable; snapshots carry commit records and row counts") {
    val root = tmp("vers").resolve("lake").toString
    val df = fixture()
    LogIngest.writeHive(df.filter($"date" === "2026-04-01"), root, partitionCols = parts)
    AppendCommit.commit(df.filter($"date" === "2026-04-02"), root, parts,
      commitId = Some("meta-append"))
    val v1Rows = MetaTables.files(spark, root, Some(1))
      .agg(sum($"rows")).head().getLong(0)
    val v2Rows = MetaTables.files(spark, root, Some(2))
      .agg(sum($"rows")).head().getLong(0)
    assert(v1Rows == 12L && v2Rows == 24L, s"v1=$v1Rows v2=$v2Rows")
    val snaps = MetaTables.snapshots(spark, root).orderBy($"version").collect()
    assert(snaps.length >= 2)
    val live = snaps.filter(_.getBoolean(1))
    assert(live.length == 1 && live.head.getInt(0) == 2)
    assert(live.head.getLong(4) == 24L) // stats-backed rows
    assert(live.head.getString(6) == "meta-append") // commit id surfaced
  }

  test("deletes: empty without debt, exact positions with, drained after compaction") {
    val root = tmp("dv").resolve("lake").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    assert(MetaTables.deletes(spark, root).count() == 0)
    val c = DeleteVectors.deleteWhere(spark, root, $"pod" === "pod-1",
      commitId = Some("meta-del"))
    val debt = MetaTables.deletes(spark, root)
    assert(debt.agg(sum($"deleted_positions")).head().getLong(0) == c.deletedRows)
    assert(debt.filter($"n_ranges" < 1).count() == 0)
    Compaction.compactHive(spark, root, partitionCols = parts)
    assert(MetaTables.deletes(spark, root).count() == 0,
      "compaction must materialize the vectors away")
  }

  test("a foreign file without a stats line reads as stats_fresh=false, not a crash") {
    val root0 = tmp("stale")
    val root = root0.resolve("lake").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    // drop a foreign parquet file into the live version (no sidecar line)
    val live = GraftStore.resolve(spark, root)
    fixture().limit(1).write.parquet(s"$live/cluster=dev/namespace=ns0/date=2026-04-09")
    val files = MetaTables.files(spark, root)
    val stale = files.filter(!$"stats_fresh")
    assert(stale.count() >= 1)
    assert(stale.filter($"rows".isNotNull).count() == 0,
      "stale entries must not fabricate row counts")
  }
}
