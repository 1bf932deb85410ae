package graft.ext

import graft.logs.{AppendCommit, GraftStore, LogIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ONLINE exact deduplication: documents arrive as a stream, and only
  * content never seen before is admitted into a versioned corpus store —
  * the continuous-ingest counterpart of [[Dedup.exact]], and the shape a
  * training-data pipeline actually runs (the crawl never stops; dedup
  * cannot be a nightly batch over the full corpus).
  *
  * Per micro-batch:
  *   1. fingerprint = `xxhash64(text)` — 8 bytes ride the shuffles, never
  *      document bodies (the [[Dedup]] scale rule);
  *   2. in-batch first-writer-wins: min id per fingerprint (one
  *      batch-sized shuffle);
  *   3. cross-batch: LEFT ANTI join against the corpus' `fingerprint`
  *      column — a single-column Parquet scan (column pruning leaves the
  *      text bytes on disk), distinct-ed to 8-byte keys. At 100 TB the
  *      admitted-signature side is what a bucketed signature index would
  *      serve; the read path is already the narrowest possible scan;
  *   4. survivors commit atomically ([[AppendCommit]]) with an
  *      exactly-once `d<sinkId>-b<batchId>` id — a replayed batch
  *      re-deduplicates to the same survivors and the commit no-ops.
  *
  * First-batch edge: a dataless store (fresh sink) admits everything.
  */
object StreamingDedup {

  final case class BatchResult(streamed: Long, admitted: Long,
      droppedInBatch: Long, droppedExisting: Long, version: Int,
      replayed: Boolean)

  /** Deduplicate ONE batch against the store and commit the survivors.
    * The streaming sink calls this per micro-batch; batch pipelines can
    * call it directly (e.g. nightly drops of a new crawl slice).
    */
  def dedupAppendBatch(spark: SparkSession, storeRoot: String,
      batch: DataFrame, idCol: String, textCol: String,
      partitionCols: Seq[String], commitId: Option[String] = None,
      maxRecordsPerFile: Long = 1000000L): BatchResult = {
    val withFp = batch.withColumn("fingerprint", xxhash64(col(textCol)))
      .persist()
    try {
      val streamed = withFp.count()
      val inBatch = withFp
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("fingerprint")).orderBy(col(idCol))))
        .filter(col("_rn") === 1).drop("_rn")
      val seen =
        if (GraftStore.isDataless(spark, storeRoot))
          None // dataless store: first batch admits everything
        else Some(GraftStore.readStore(spark, storeRoot)
          .select(col("fingerprint")).distinct())
      val fresh = seen.fold(inBatch)(s =>
        inBatch.join(s, Seq("fingerprint"), "left_anti")).persist()
      try {
        val admitted = fresh.count()
        val inBatchCount = inBatch.count()
        if (admitted == 0)
          // fully-duplicate batch: no version churn; idempotent under
          // replay (a re-run re-deduplicates to the same zero survivors)
          BatchResult(streamed, 0L,
            droppedInBatch = streamed - inBatchCount,
            droppedExisting = inBatchCount,
            version = GraftStore.liveVersionOf(spark, storeRoot),
            replayed = false)
        else {
          val committed = AppendCommit.commit(fresh, storeRoot,
            partitionCols = partitionCols,
            maxRecordsPerFile = maxRecordsPerFile, commitId = commitId)
          BatchResult(streamed, admitted,
            droppedInBatch = streamed - inBatchCount,
            droppedExisting = inBatchCount - admitted,
            version = committed.version, replayed = committed.replayed)
        }
      } finally fresh.unpersist()
    } finally withFp.unpersist()
  }

  final case class NearDupResult(streamed: Long, admitted: Long,
      droppedSeenId: Long, droppedNearDup: Long, version: Int,
      replayed: Boolean)

  /** ONLINE NEAR-duplicate filtering for one micro-batch: admit a document
    * only when no EARLIER-SEEN document is an n-gram-Jaccard near-dup
    * (J ≥ `threshold`) — the streaming counterpart of
    * [[Dedup.minhashLshPairs]], with exact verification.
    *
    * The LSH state lives in STORES, not in streaming operator state: a
    * `bands` index ((band, bucket, doc_id) — 8-byte rows) serves candidate
    * generation by equi-join, and a `grams` index (doc_id → distinct
    * shingle hashes, stored ONCE per doc) serves exact verification. That
    * is the 100 TB shape: checkpoint state stays empty (restart-safe with
    * no state-store bloat), the indexes are columnar, compactable, and
    * queryable, and a crawler re-visit is an 8-byte id anti-join. Per
    * batch:
    *   1. id-resends drop (`doc_id` already in the grams index);
    *   2. shingle + MinHash + band the fresh docs (one projection, no
    *      shuffle — `bands=32, rows=2` puts the τ=0.8 miss probability
    *      per true pair below 1e-14);
    *   3. candidates = bands-index ⋈ batch bands on (band, bucket), plus
    *      the in-batch self-join (earlier = smaller `doc_id`, the d10
    *      arrival rule);
    *   4. exact Jaccard on the 8-byte shingle sets verifies candidates
    *      (hash collisions only ADD candidates; the exact check decides);
    *   5. survivors commit exactly-once ([[AppendCommit]] + `commitId`);
    *      ALL fresh docs (admitted or dropped — "earlier seen", not
    *      "earlier admitted", keeps the policy non-recursive and
    *      SQL-restatable) land in both indexes under a
    *      per-commit directory, so a replayed batch overwrites its own
    *      index slice instead of doubling it.
    *
    * Documents with fewer than `n` tokens have no shingles: they are never
    * near-dups (of anything) and always admit — matching the batch
    * operators' semantics.
    */
  def nearDupAppendBatch(spark: SparkSession, storeRoot: String,
      batch: DataFrame, idCol: String, textCol: String,
      partitionCols: Seq[String], commitId: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.8,
      maxRecordsPerFile: Long = 1000000L): NearDupResult = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val idx = indexRoot(storeRoot)
    import graft.expr.SketchFunctions
    // the kernel already dedupes shingle hashes, and array_intersect/
    // array_union need no sort — trust it like Dedup.shingleHashes does
    val withG = batch.dropDuplicates(idCol).withColumn("grams",
      SketchFunctions.wordShingleHashes(col(textCol), n)).persist()
    try {
      val streamed = withG.count()
      // ONE read of the grams index serves both the resend anti-join and
      // exact verification
      val gramsIdx = readIndex(spark, s"$idx/grams")
      val seenIds = gramsIdx.map(_.select(col("doc_id").as(idCol)))
      val fresh = seenIds.fold(withG.toDF())(s =>
        withG.join(s, Seq(idCol), "left_anti")).persist()
      try {
        val freshCount = fresh.count()
        val sigs = fresh.filter(size(col("grams")) >= 1)
          .withColumn("sig", SketchFunctions.minHashSig(col("grams"), numHashes))
        val batchBands = Dedup.bandedBuckets(
          sigs.select(col(idCol).as("doc_id"), col("sig")), bands, rows)
          .persist()
        try {
          val gramsOf = fresh.select(col(idCol).as("doc_id"), col("grams"))
          // id_a ≠ id_b: a doc can meet ITS OWN index rows after a crash
          // landed the bands slice but not the grams slice (the replay
          // recomputes the whole batch) — self-identity is never a dup;
          // genuine id re-sends never reach here (the grams-index
          // anti-join dropped them)
          val crossPairs = readIndex(spark, s"$idx/bands").map(sb =>
            sb.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
              .join(batchBands.select(col("band"), col("bucket"),
                col("doc_id").as("id_b")), Seq("band", "bucket"))
              .filter(col("id_a") =!= col("id_b"))
              .select(col("id_a"), col("id_b")))
          val inBatchPairs = batchBands.as("a")
            .join(batchBands.as("b"),
              col("a.band") === col("b.band") &&
                col("a.bucket") === col("b.bucket") &&
                col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          val rawCand = crossPairs.fold(inBatchPairs)(_.unionAll(inBatchPairs))
            .dropDuplicates("id_a", "id_b")
          // orient pairs whose "earlier" side is itself IN this batch —
          // possible only through a stale bands slice from a crashed run:
          // within one batch the arrival rule is doc_id order, so (a, b)
          // with a > b would wrongly drop the EARLIER member on replay
          val freshA = fresh.select(col(idCol).as("id_a"))
            .withColumn("_in_batch", lit(true))
          val cand = rawCand.join(freshA, Seq("id_a"), "left")
            .filter(col("_in_batch").isNull || col("id_a") < col("id_b"))
            .drop("_in_batch")
          val earlierGrams = gramsIdx.fold(gramsOf)(_.unionByName(gramsOf))
          val dupIds = cand
            .join(earlierGrams.select(col("doc_id").as("id_a"),
              col("grams").as("grams_a")), "id_a")
            .join(gramsOf.select(col("doc_id").as("id_b"),
              col("grams").as("grams_b")), "id_b")
            .filter(size(array_intersect(col("grams_a"), col("grams_b")))
              .cast("double") /
              size(array_union(col("grams_a"), col("grams_b"))) >= threshold)
            .select(col("id_b").as(idCol)).distinct()
          val survivors = fresh.join(dupIds, Seq(idCol), "left_anti")
            .drop("grams").persist()
          try {
            val admitted = survivors.count()
            val result =
              if (admitted == 0)
                NearDupResult(streamed, 0L,
                  droppedSeenId = streamed - freshCount,
                  droppedNearDup = freshCount,
                  version = GraftStore.liveVersionOf(spark, storeRoot),
                  replayed = false)
              else {
                val committed = AppendCommit.commit(survivors, storeRoot,
                  partitionCols = partitionCols,
                  maxRecordsPerFile = maxRecordsPerFile,
                  commitId = Some(commitId))
                NearDupResult(streamed, admitted,
                  droppedSeenId = streamed - freshCount,
                  droppedNearDup = freshCount - admitted,
                  version = committed.version, replayed = committed.replayed)
              }
            // index slices are per-commit directories PUBLISHED BY RENAME
            // (write to an underscore-prefixed staging dir Spark readers
            // ignore, then one atomic directory rename): a slice is
            // all-or-nothing, so a replay can never see — or overwrite
            // down to — a partial id set. Order stays crash-deliberate:
            // corpus commit, THEN bands, THEN grams — the grams index is
            // the id-authority the resend anti-join reads, so any crash
            // before it lands makes the replay recompute the whole batch
            // (healing a stale bands slice) instead of silently skipping
            // docs whose buckets never landed.
            if (freshCount > 0) {
              writeSliceAtomic(spark, batchBands,
                s"$idx/bands", s"c=$commitId")
              writeSliceAtomic(spark,
                fresh.select(col(idCol).as("doc_id"), col("grams")),
                s"$idx/grams", s"c=$commitId")
            }
            result
          } finally survivors.unpersist()
        } finally batchBands.unpersist()
      } finally fresh.unpersist()
    } finally withG.unpersist()
  }

  /** Publish one index slice atomically: write under an
    * underscore-prefixed staging directory (invisible to Spark readers),
    * then a single directory rename. A crash leaves either no slice or a
    * complete one — never a partial id set for the replay to trust.
    */
  private def writeSliceAtomic(spark: SparkSession, df: DataFrame,
      parent: String, name: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(parent)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"_staging-$name")
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic publish failed: $tmp -> $dst")
  }

  /** Continuous online NEAR-dup filtering: every micro-batch admits only
    * documents with no earlier-seen Jaccard near-dup, exactly-once.
    */
  def startNearDupSink(docs: DataFrame, storeRoot: String, checkpoint: String,
      idCol: String, textCol: String, partitionCols: Seq[String],
      n: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.8,
      triggerInterval: String = "60 seconds",
      maxRecordsPerFile: Long = 1000000L): StreamingQuery = {
    val spark = docs.sparkSession
    val sinkId = GraftStore.sinkIdFor(checkpoint)
    LogIngest.ensureStore(spark, storeRoot)
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        nearDupAppendBatch(spark, storeRoot, batch.toDF(), idCol, textCol,
          partitionCols, commitId = s"nd$sinkId-b$batchId",
          n = n, numHashes = numHashes, bands = bands, threshold = threshold,
          maxRecordsPerFile = maxRecordsPerFile)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
  }

  /** The near-dup LSH indexes live NEXT TO the store root (not inside it:
    * store directories are versioned snapshots).
    */
  private[graft] def indexRoot(storeRoot: String): String =
    storeRoot.stripSuffix("/") + "-neardup-index"

  private def readIndex(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path).drop("c")) else None
  }

  /** Continuous online dedup: every micro-batch of `docs` admits only
    * never-seen content into the store, exactly-once per batch.
    */
  def startDedupSink(docs: DataFrame, storeRoot: String, checkpoint: String,
      idCol: String, textCol: String, partitionCols: Seq[String],
      triggerInterval: String = "60 seconds",
      maxRecordsPerFile: Long = 1000000L): StreamingQuery = {
    val spark = docs.sparkSession
    val sinkId = GraftStore.sinkIdFor(checkpoint)
    LogIngest.ensureStore(spark, storeRoot)
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dedupAppendBatch(spark, storeRoot, batch.toDF(), idCol, textCol,
          partitionCols, commitId = Some(s"d$sinkId-b$batchId"),
          maxRecordsPerFile = maxRecordsPerFile)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
  }
}
