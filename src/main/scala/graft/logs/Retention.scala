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
  def enforceHive(spark: SparkSession, root: String, cutoffDate: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root))) return Seq.empty
    // layout: root/cluster=c/namespace=n/date=d/...
    val deleted = Seq.newBuilder[String]
    for {
      cluster <- fs.listStatus(new Path(root)).toSeq if cluster.isDirectory
      ns <- fs.listStatus(cluster.getPath).toSeq if ns.isDirectory
      datePart <- fs.listStatus(ns.getPath).toSeq
      name = datePart.getPath.getName
      if name.startsWith("date=") && name.stripPrefix("date=") < cutoffDate
    } {
      fs.delete(datePart.getPath, true)
      deleted += datePart.getPath.toString
    }
    deleted.result()
  }
}
