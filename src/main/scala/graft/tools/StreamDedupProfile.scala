package graft.tools

import graft.GraftSession

/** One-shot cold profile of the d10/d11 streaming-dedup gates (guide §1:
  * attribute before optimizing). INFO logging stays on so Spark's
  * "Job N finished ... took S s" lines attribute the wall clock.
  */
object StreamDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = if (args.nonEmpty) args(0) else "d11"
    val spark = GraftSession.local("graft-sdprofile")
    spark.sparkContext.setLogLevel("INFO")
    val t0 = System.nanoTime()
    val df = which match {
      case "d10" => graft.queries.StreamDedupQuery.run(spark, sfDir)
      case _ => graft.queries.StreamNearDupQuery.run(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    println(f"TOTAL_${which}_SEC ${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
