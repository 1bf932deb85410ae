package graft.tools

import graft.{ConfScope, GraftSession, Tables}
import graft.plans.{PlanRewrites, PlanScans}
import org.apache.spark.sql.functions._

/** Throwaway r17 diagnostic for the x28 concurrent-routing failure: register
  * the a3 rollup fragment against a dummy artifact, then probe the stock a3
  * on a scoped clone while a background pool hammers unrelated queries.
  * On a routing miss, dump both canonicalized plans for diffing.
  */
object X28Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("x28debug")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.enableCache()
    Seq("lineitem", "orders", "events", "documents", "part", "supplier")
      .foreach(t => Tables.table(spark, sfDir, t).count())

    val defn = graft.queries.RelationalQueries.brandSupplierRollup(spark, sfDir)
    // artifact stand-in: a parquet copy of the fragment's rows, like the
    // real MatView artifact (scan + projection only)
    val artDir = TempRoots.createTempDir("x28dbg")
    defn.write.mode("overwrite").parquet(s"$artDir/art")
    val art = spark.read.parquet(s"$artDir/art")
    PlanRewrites.register("dbg_a3", defn, art, Some("dbg"))

    // background load: unrelated queries on the main session
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    (1 to 4).foreach { _ =>
      pool.submit(new Runnable { def run(): Unit = {
        while (!stop.get()) {
          graft.queries.LogParityQueries.unionAll(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }})
    }
    try {
      var i = 0
      var failed = false
      while (i < 30 && !failed) {
        ConfScope.withSessionConf(spark, PlanRewrites.ScopeConfKey -> "dbg") { s =>
          val a3 = graft.queries.RelationalQueries.distinctSuppliersPerBrand(s, sfDir)
          val opt = a3.queryExecution.optimizedPlan
          val routed = opt.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
          }.exists(_.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains("x28dbg"))
            case _ => false
          })
          if (!routed) {
            failed = true
            println(s"=== MISS at iteration $i ===")
            val d = defn.queryExecution.optimizedPlan
            println("--- registered definition (canonicalized) ---")
            println(d.canonicalized.treeString)
            println("--- probe plan (optimized, full) ---")
            println(opt.treeString)
          }
        }
        i += 1
      }
      println(s"done, failed=$failed")
    } finally {
      PlanRewrites.unregister("dbg_a3")
      stop.set(true)
      pool.shutdownNow()
      spark.stop()
    }
  }
}
