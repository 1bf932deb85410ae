package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x13 — the FIRST-CLASS streaming store end-to-end, oracle-gated.
  *
  * [[LogStreamIngest.startStoreSink]] (round 7) commits every micro-batch
  * through the store protocol — stage under an invisible prefix, publish by
  * manifest-add + atomic flip, exactly-once by `s<sinkId>-b<batchId>` commit
  * ids — so the live ingest IS an ordinary versioned store from batch one
  * and maintenance runs against it without stopping the stream (the
  * reference's lake is likewise queried while the DaemonSet keeps writing,
  * test.sh:207-330). This gate drives that whole chain on the shared CRI
  * fixture: tail-source streaming read → CRI parse → per-micro-batch atomic
  * commits → LIVE compaction of the still-streamable store → selector query;
  * DuckDB restates the expected rows straight from `events`, so a torn
  * commit, a replayed batch double-landing, or a lossy compaction all flip
  * the hash red.
  */
object StoreStreamQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.tools.TempRoots.createTempDir("graft-streamstore")
    val root = work.resolve("lake").toString
    val criRoot = PipelineE2E.criFixture(spark, dir)

    // maxFilesPerTrigger under the fixture's 15 files forces MULTIPLE
    // micro-batches — enough commits to prove the multi-commit protocol
    // (exactly-once replay itself is pinned by AppendCommitSpec) without
    // paying the per-commit composite verify many times over.
    // date granularity, like the batch e2e: the fixture's rows-per-day are
    // file-sized; hour-level dirs would turn every micro-batch commit into
    // a thousand-leaf-dir stage+verify walk (the r8 bench measured exactly
    // that: 462 s at sf0.1, vs seconds at date level)
    val parts = Seq("cluster", "namespace", "date")
    val q = LogStreamIngest.startStoreSink(spark,
      criRoot.toString + "/pods/*/*/*.log", root,
      checkpoint = work.resolve("ckpt").toString,
      clusterName = "dev", nodeName = "node-a",
      // 100 ms tick (r16): processAllAvailable pins the drain; with
      // maxFilesPerTrigger=8 over 15 fixture files the batch SPLIT is
      // file-count-driven, not tick-driven, so a 1 s tick only added dead
      // wait before/between the two batches. Identical rows/commits.
      triggerInterval = "100 milliseconds", maxFilesPerTrigger = 8,
      partitionCols = parts)
    try q.processAllAvailable() finally q.stop()

    val streamed = GraftStore.readStore(spark, root).count()
    require(streamed > 0, "streaming store sink committed no rows")
    // LIVE maintenance — the store was never stopped/converted; compaction
    // serializes with (absent) writers on the lease and must preserve rows
    Compaction.compactHive(spark, root, partitionCols = parts)
    val compacted = GraftStore.readStore(spark, root).count()
    require(compacted == streamed,
      s"live compaction changed row count: $streamed -> $compacted")

    LogQuery(
      selector = LogSelector.parse("""{namespace="ns0"}"""),
      output = LogOutput.Lines,
      layout = LogLayout.Hive)
      .dataFrame(spark, root)
      // µs projection for the oracle compare (DuckDB's precision ceiling);
      // the lossless ns path is pinned by ScalaTest instead.
      .select(CriFunctions.nanosToMicros(col("time_ns")).as("time_us"),
        CriFunctions.usIso8601(CriFunctions.nanosToMicros(col("time_ns"))).as("time_iso"),
        col("cluster"), col("namespace"),
        col("node"), col("pod"), col("container"), col("stream"),
        col("logtag"), col("message"))
      .orderBy(col("time_us"), col("message"))
  }
}
