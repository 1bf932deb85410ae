package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit}

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries execute through the `noop` sink (full plan execution including
  * projections — a bare `.count()` lets Catalyst prune the work away) on a
  * small thread pool: Spark schedules concurrent jobs fairly, so short
  * queries fill the cores a long query leaves idle — the realistic
  * multi-tenant throughput shape. `value` is the wall-clock for the whole
  * set; per-query numbers are each query's own span.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parallel = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARALLEL", "6").toInt
    val spark = GraftSession.local("graft-bench")
    // untimed warmup: session/codegen/FS init should not bill the first query
    Tables.lineitem(spark, sfDir).count()

    val pool = Executors.newFixedThreadPool(parallel)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val q0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            results.put(name, (System.nanoTime() - q0) / 1e9)
          } catch { case e: Throwable =>
            // a failed query must be visible in the JSON, not a fast "pass"
            failed.add(name)
            results.put(name, -1.0)
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    pool.shutdown()
    val finished = pool.awaitTermination(30, TimeUnit.MINUTES)
    if (!finished) {
      // a hung query must read as a failure, not a fast clean run: every
      // query with no recorded time goes into failed[]
      System.err.println("[bench] TIMEOUT: not all queries completed in 30min")
      SparkEntry.queries.keys.filterNot(results.containsKey).foreach { n =>
        failed.add(n)
        results.put(n, -1.0)
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9

    val qs = results.entrySet().toArray.map {
      case e: java.util.Map.Entry[_, _] => "\"" + e.getKey + "\":" + e.getValue
    }.sorted.mkString("{", ",", "}")
    val failedJson = failed.toArray.map(n => "\"" + n + "\"").sorted.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    if (!finished) sys.exit(1) // don't block on spark.stop() behind hung jobs
    spark.stop()
  }
}
