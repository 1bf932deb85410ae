package graft

import graft.logs._
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the x15/x16 store walls (VERDICT r13 item
  * 5): the sf100 reruns reported ~600 s per gate as one number — this main
  * splits the pipeline into its phases so the wall is ATTRIBUTED, the way
  * `BenchDecompose` split the TPC-H gaps:
  *
  *   ingest            writeHive of the events fixture (the store being
  *                     mutated — at sf100 this alone is a 170M-row write)
  *   scan_match        the matcher's read: live view + predicate, count only
  *   rle_collect       matched (file, pos) → executor-side RLE → driver
  *                     (the r14 rewrite under test; r13 collected raw
  *                     positions here)
  *   delete_commit_1   full deleteWhere #1 (content predicate)
  *   delete_commit_2   full deleteWhere #2 (overlapping time predicate —
  *                     exercises vector merging against a live sidecar)
  *   read_live_dv      live read with vectors applied (the anti-join), count
  *   checksum_live_dv  ... plus the x15 content checksum aggregate
  *   merge_upsert      mergeByKey of a ~1% update batch (the x16 shape)
  *   compact_material  maintenance compaction materializing all vectors
  *   read_after_compact the vector-free read the store returns to
  *
  * Usage: `BenchStoreDecompose <sfDir>`; one JSON line per stage, summary
  * line last. Stages run ONCE (they are stateful commits, not repeatable
  * reads) — pair runs in one window and compare runs, not reps.
  */
object BenchStoreDecompose {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench-store-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scratch = sys.env.getOrElse("GRAFT_TMPDIR", sys.props("java.io.tmpdir"))
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(scratch), "graft-storedc")
      .resolve("lake").toString
    val parts = Seq("cluster", "namespace", "date")

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    def stage[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val t = (System.nanoTime() - t0) / 1e9
      out(name) = t
      println(f"""{"stage":"$name","sec":$t%.3f}""")
      r
    }

    val ev = Tables.events(spark, sfDir)
    val df = ev.select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      lit("p1").as("pod"), lit("app").as("container"))
      .withColumn("date", date_format($"time", "yyyy-MM-dd"))

    stage("ingest") {
      LogIngest.writeHive(df, root, partitionCols = parts)
    }

    val del1 = length($"message") % 7 === 0
    val del2 = expr("((time_ns div 1000) % 97) < 13")

    stage("scan_match") {
      GraftStore.readStore(spark, root).filter(del2).count()
    }
    stage("rle_collect") {
      // the matcher's exact frame on a vector-free store: tagged live read
      // + predicate + executor-side RLE + driver collect (one row per file)
      val cur = GraftStore.liveVersionOf(spark, root)
      val tagged = GraftStore.readVersionTagged(spark, root, cur).filter(del2)
      DeleteVectors.collectFileRanges(tagged).length
    }
    stage("delete_commit_1") {
      DeleteVectors.deleteWhere(spark, root, del1, commitId = Some("dc-d1"))
    }
    stage("delete_commit_2") {
      DeleteVectors.deleteWhere(spark, root, del2, commitId = Some("dc-d2"))
    }
    stage("read_tagged_only") {
      // the DV read's probe-side cost WITHOUT the anti-join: metadata
      // columns + path normalization over every row (aggregated over the
      // tag columns so pruning can't elide them)
      val cur = GraftStore.liveVersionOf(spark, root)
      GraftStore.readVersionTagged(spark, root, cur)
        .agg(count(col(DeleteVectors.PathCol)), sum(col(DeleteVectors.PosCol)))
        .head()
    }
    stage("read_live_dv") {
      GraftStore.readStore(spark, root).count()
    }
    stage("checksum_live_dv") {
      GraftStore.readStore(spark, root).agg(
        coalesce(sum(length($"message")).cast("long"), lit(0L))).head.getLong(0)
    }
    stage("merge_upsert") {
      val updates = GraftStore.readStore(spark, root)
        .filter(xxhash64($"time_ns") % 100 === 0)
        .withColumn("message", concat(lit("UPD:"), $"message"))
      DeleteVectors.mergeByKey(spark, root, updates,
        keyCols = Seq("time_ns"), partitionCols = parts,
        commitId = Some("dc-m1"))
    }
    stage("compact_material") {
      Compaction.compactHive(spark, root, partitionCols = parts, full = true)
    }
    stage("read_after_compact") {
      GraftStore.readStore(spark, root).count()
    }

    val qj = out.map { case (n, t) => "\"" + n + "\":" + f"$t%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"store_decompose","queries":$qj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
