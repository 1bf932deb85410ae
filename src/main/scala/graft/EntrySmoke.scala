package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke check: a plain session (none of our confs),
  * `SparkEntry.entry`, rows>0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0)
    spark.stop()
  }
}
