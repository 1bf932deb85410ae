package graft.logs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention enforcement for the hive log store: drop whole `date=` partition
  * directories older than the cutoff. Deleting at partition-directory
  * granularity is a metadata operation per partition — no scan, no rewrite —
  * which is what makes retention tractable on a 100 TB store (the positional
  * layout gets the same effect by deleting `YYYY/MM/DD` prefixes).
  */
object Retention {

  /** Delete every `date=<d>` partition with `d < cutoffDate` (ISO yyyy-MM-dd;
    * string comparison is date order for this format). Returns the deleted
    * partition paths.
    */
  def enforceHive(spark: SparkSession, rawRoot: String, cutoffDate: String,
      convertStreamingStore: Boolean = false): Seq[String] = {
    val fs = new Path(rawRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(rawRoot))) return Seq.empty
    // retention must not interleave with a compaction staging the same root
    // (it could delete partitions out of the tree being staged)
    MaintenanceLease.withLease(spark, rawRoot, "retention") {
      enforceHeld(spark, rawRoot, cutoffDate, convertStreamingStore, fs)
    }
  }

  private def enforceHeld(spark: SparkSession, rawRoot: String, cutoffDate: String,
      convertStreamingStore: Boolean, fs: org.apache.hadoop.fs.FileSystem): Seq[String] = {
    // pointer stores: drop partitions inside the CURRENT version prefix
    // (partition-granularity delete, like the other tiers; snapshot-isolated
    // retention would stage a full copy — not worth O(store) writes to drop
    // a directory)
    val root = GraftStore.resolve(spark, rawRoot)
    // A store written by the STREAMING sink carries a _spark_metadata commit
    // log that lists every data file; deleting partitions under it would make
    // readers (which trust the log, not the listing) fail on missing files.
    // Opt-in conversion drops the log so the store becomes listing-based —
    // only safe while no streaming query is writing.
    val sinkLog = new Path(root, "_spark_metadata")
    if (fs.exists(sinkLog)) {
      require(convertStreamingStore,
        s"$root was written by the streaming sink (_spark_metadata present); " +
          "pass convertStreamingStore=true to drop the commit log and enforce retention")
      fs.delete(sinkLog, true)
    }
    // layout: root/cluster=c/namespace=n/date=d/...
    val deleted = Seq.newBuilder[String]
    for {
      cluster <- fs.listStatus(new Path(root)).toSeq if cluster.isDirectory
      ns <- fs.listStatus(cluster.getPath).toSeq if ns.isDirectory
      datePart <- fs.listStatus(ns.getPath).toSeq
      name = datePart.getPath.getName
      if name.startsWith("date=") && name.stripPrefix("date=") < cutoffDate
    } {
      // only count partitions the filesystem actually removed
      if (fs.delete(datePart.getPath, true))
        deleted += datePart.getPath.toString
    }
    // partitions carried by manifest (incremental compaction) live in OLDER
    // version prefixes: dropping the manifest entry removes them from the
    // live view at metadata cost; the physical files belong to retained
    // snapshots and are reclaimed when their version is
    if (GraftStore.isPointerStore(spark, rawRoot)) {
      def expired(rel: String) = rel.split('/').exists(c =>
        c.startsWith("date=") && c.stripPrefix("date=") < cutoffDate)
      val manifest = GraftStore.readManifest(spark, root)
      val (drop, keep) = manifest.partition(e => expired(e._2))
      if (drop.nonEmpty) {
        GraftStore.writeManifest(spark, root, keep)
        drop.foreach { case (v, rel) =>
          deleted += s"$rawRoot/${GraftStore.versionPrefix(v)}/$rel"
        }
      }
    }
    deleted.result()
  }
}
