package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** One-shot INFO-logged profile of a single declared query (guide §1:
  * attribute before optimizing) — the generic sibling of
  * [[StreamDedupProfile]]. Pair with GRAFT_LOG4J for ms timestamps.
  * `SPARK_GRAFT_PROFILE_REPS` (default 2) runs warm repetitions so the
  * memoized-fixture cost separates from the steady-state span.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val name = args.headOption.getOrElse("e2e_log_pipeline_hive")
    val spark = GraftSession.local("graft-qprofile")
    spark.sparkContext.setLogLevel("INFO")
    Tables.enableCache()
    Seq("lineitem", "orders", "events", "documents", "embeddings", "part",
      "customer", "supplier", "nation", "region")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"profile:$name:rep$r")
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
