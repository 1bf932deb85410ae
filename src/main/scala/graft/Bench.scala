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
            results.put(name, -1.0)
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    pool.shutdown()
    val finished = pool.awaitTermination(30, TimeUnit.MINUTES)
    if (!finished) {
      System.err.println("[bench] TIMEOUT: not all queries completed in 30min")
      pool.shutdownNow() // interrupt stragglers so the snapshot below is final
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // One immutable snapshot drives ALL output: a task finishing after this
    // point can no longer contradict the failed[] list. A query is failed iff
    // it has no recorded time (hung/interrupted) or its sentinel is -1.0
    // (threw) — both derived from the same snapshot.
    import scala.jdk.CollectionConverters._
    val snapshot: Map[String, Double] = SparkEntry.queries.keys.map { n =>
      n -> results.asScala.getOrElse(n, -1.0)
    }.toMap
    val failedNames = snapshot.collect { case (n, t) if t == -1.0 => n }.toSeq.sorted

    val qs = snapshot.toSeq.sortBy(_._1)
      .map { case (n, t) => "\"" + n + "\":" + t }.mkString("{", ",", "}")
    val failedJson = failedNames.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    // Full line first; then a short driver-parsable summary line LAST so a
    // bounded tail capture always sees a complete JSON object with the total
    // (BENCH_r02 lost its head to tail truncation of the long line).
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","failed":$failedJson,"sf":"$sfDir","n_queries":${snapshot.size}}""")
    if (!finished) sys.exit(1) // don't block on spark.stop() behind hung jobs
    spark.stop()
  }
}
