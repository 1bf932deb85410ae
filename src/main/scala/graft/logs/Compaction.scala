package graft.logs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files compaction (SURVEY §7.8): the reference's 1 MB-object design
  * (`total_file_size 1M`, fluent-bit.conf:42) produces ~10⁸ objects at
  * 100 TB; scan efficiency needs periodic rewrite into scan-sized files.
  *
  * Strategy: read the hive store, re-write each partition's rows into files
  * capped by `maxRecordsPerFile` with one task per output partition
  * (repartition on the partition key — no global shuffle of unrelated
  * partitions, and AQE coalesces the tiny ones). Readers see the swap
  * atomically per partition thanks to dynamic partition overwrite.
  */
object Compaction {

  def compactHive(spark: SparkSession, root: String,
      maxRecordsPerFile: Long = 4000000L,
      partitionCols: Seq[String] = LogSchema.hivePartitionColumns): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val df = spark.read.parquet(root)
    df.repartition(partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite") // dynamic: only touched partitions are replaced
      .parquet(root + ".compact-staging") // stage, then swap below
    // atomic-ish swap: staging becomes the live tree (object stores: rename
    // prefix; HDFS/local: directory rename)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(root)
    val staging = new org.apache.hadoop.fs.Path(root + ".compact-staging")
    val backup = new org.apache.hadoop.fs.Path(root + ".compact-backup")
    fs.rename(live, backup)
    fs.rename(staging, live)
    fs.delete(backup, true)
  }
}
