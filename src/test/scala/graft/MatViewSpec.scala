package graft

import graft.logs._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental materialized-view maintenance ([[MatView]]): the refresh
  * identity (incremental == full recompute, exactly), per-commit delta
  * behavior for append/delete/compaction, the no-op fast path, key
  * disappearance, metadata round-trip, and snapshot grace.
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq("cluster", "namespace", "date")

  /** Tiny deterministic store: 30 rows over 3 dates × 2 types. */
  private def fixture() = {
    val base = java.time.LocalDate.parse("2026-03-01")
    (0 until 30).map { i =>
      val d = base.plusDays(i % 3).toString
      (java.sql.Timestamp.valueOf(s"$d 00:00:0${i % 10}"),
        i.toLong * 1000000L, "stdout", "F", "m" * (i % 5 + 1),
        if (i % 2 == 0) "click" else "view", i.toLong,
        "dev", "ns0", "n1", "p1", "app", d)
    }.toDF("time", "time_ns", "stream", "logtag", "message", "event_type",
      "val_l", "cluster", "namespace", "node", "pod", "container", "date")
  }

  private def tmp(name: String) = {
    val d = Files.createTempDirectory(s"graft-mvspec-$name")
    d.toFile.deleteOnExit()
    d
  }

  private def viewAsMap(viewDir: String): Map[String, (Long, Long)] =
    MatView.readView(spark, viewDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("null group keys merge through refresh (null-safe delta join)") {
    val w = tmp("nullkey")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    // event_type carries NULLs: groupBy makes a real null group, so the
    // incremental delta must find and merge it, not fork a duplicate row
    val withNulls = fixture()
      .withColumn("event_type",
        when($"val_l" % 3 === 0, lit(null: String)).otherwise($"event_type"))
    LogIngest.writeHive(withNulls, root, partitionCols = parts)
    MatView.create(spark, root, viewDir,
      keys = Seq("event_type"), sums = Seq("sum_val" -> "val_l"))
    val more = withNulls.withColumn("val_l", $"val_l" + 1000L)
      .withColumn("time_ns", $"time_ns" + 1L)
    AppendCommit.commit(more, root, parts, commitId = Some("mv-null-1"))
    MatView.refresh(spark, root, viewDir)
    val got = MatView.readView(spark, viewDir).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    val want = withNulls.unionAll(more)
      .groupBy($"event_type")
      .agg(count(lit(1)), sum($"val_l"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.size == want.size, s"null group must not fork: $got")
    assert(got == want)
  }

  test("create computes the full aggregate; refresh on unchanged head is a no-op") {
    val w = tmp("create")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    val v = MatView.create(spark, root, viewDir,
      keys = Seq("event_type"), sums = Seq("sum_val" -> "val_l"))
    assert(v == 1)
    val got = viewAsMap(viewDir)
    assert(got("click") == ((15L, (0 until 30 by 2).map(_.toLong).sum)))
    assert(got("view") == ((15L, (1 until 30 by 2).map(_.toLong).sum)))
    val r = MatView.refresh(spark, root, viewDir)
    assert(r.noop && r.viewVersion == 1 && r.deltaRows == 0)
  }

  test("append/delete/compaction refreshes hold the incremental == full identity") {
    val w = tmp("lifecycle")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    val df = fixture()
    LogIngest.writeHive(df.filter($"date" =!= "2026-03-03"), root, partitionCols = parts)
    MatView.create(spark, root, viewDir, Seq("event_type"), Seq("sum_val" -> "val_l"))

    // append: delta is exactly the appended rows
    val held = df.filter($"date" === "2026-03-03")
    AppendCommit.commit(held.repartition(3), root, parts,
      maxRecordsPerFile = 2, commitId = Some("mv-append"))
    val r1 = MatView.refresh(spark, root, viewDir)
    assert(!r1.noop && r1.deltaRows == held.count() && r1.viewVersion == 2)

    // delete: the view decrements through deletion-vector CDC
    val c = DeleteVectors.deleteWhere(spark, root, length($"message") === 3,
      commitId = Some("mv-del"))
    assert(c.deletedRows > 0)
    val r2 = MatView.refresh(spark, root, viewDir)
    assert(!r2.noop && r2.deltaRows == c.deletedRows)

    // compaction: contents-preserving — empty delta, re-base only
    Compaction.compactHive(spark, root, partitionCols = parts)
    val r3 = MatView.refresh(spark, root, viewDir)
    assert(!r3.noop && r3.deltaRows == 0)

    // identity: bit-identical to a from-scratch recompute of the head
    val full = GraftStore.readStore(spark, root).groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"val_l").cast("long").as("sum_val"))
    val view = MatView.readView(spark, viewDir)
    assert(view.exceptAll(full).count() == 0 && full.exceptAll(view).count() == 0)
  }

  test("a fully-deleted key disappears from the view, like it would from a recompute") {
    val w = tmp("keygone")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    MatView.create(spark, root, viewDir, Seq("event_type"), Seq("sum_val" -> "val_l"))
    DeleteVectors.deleteWhere(spark, root, $"event_type" === "click",
      commitId = Some("mv-nukekey"))
    MatView.refresh(spark, root, viewDir)
    val got = viewAsMap(viewDir)
    assert(!got.contains("click") && got.contains("view"), s"view rows: $got")
  }

  test("metadata round-trips and the refresh uses the stored definition") {
    val w = tmp("meta")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    // two sums, one a computed expression — refresh must re-derive both
    // from the sidecar alone
    MatView.create(spark, root, viewDir, Seq("event_type"),
      Seq("sum_val" -> "val_l", "sum_chars" -> "cast(length(message) as long)"))
    AppendCommit.commit(fixture().limit(4), root, parts, commitId = Some("mv-meta"))
    MatView.refresh(spark, root, viewDir)
    val full = GraftStore.readStore(spark, root).groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"val_l").cast("long").as("sum_val"),
        sum(length($"message")).cast("long").as("sum_chars"))
    val view = MatView.readView(spark, viewDir)
    assert(view.exceptAll(full).count() == 0 && full.exceptAll(view).count() == 0)
  }

  test("publish keeps a grace snapshot and reclaims older view versions") {
    val w = tmp("grace")
    val root = w.resolve("lake").toString
    val viewDir = w.resolve("view").toString
    LogIngest.writeHive(fixture(), root, partitionCols = parts)
    MatView.create(spark, root, viewDir, Seq("event_type"), Seq.empty)
    (1 to 3).foreach { i =>
      AppendCommit.commit(fixture().limit(i), root, parts,
        commitId = Some(s"mv-g$i"))
      MatView.refresh(spark, root, viewDir)
    }
    assert(MatView.currentViewVersion(spark, viewDir) == 4)
    val dirs = new java.io.File(viewDir).listFiles().map(_.getName).toSet
    assert(dirs.contains("v000004") && dirs.contains("v000003"),
      s"live + grace snapshots must survive: $dirs")
    assert(!dirs.contains("v000001") && !dirs.contains("v000002"),
      s"older view versions must be reclaimed: $dirs")
  }
}
