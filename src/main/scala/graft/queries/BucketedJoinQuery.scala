package graft.queries

import graft.Tables
import graft.ext.Bucketing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x27 — bucketed co-located fact joins as a driver-oracle gate.
  *
  * The engine's answer to the single-box fact-shuffle floor (SURVEY §7.14/
  * §7.17) is storage layout: fact copies bucketed+sorted on the join key
  * run q3/q18 exchange-FREE and q13/q14/q9 with only post-aggregation
  * subtotal rows moving. The spec suite pins plan shape and row identity;
  * this gate additionally routes the RESULTS through the DuckDB oracle, so
  * the bucketed plans are correctness-gated by the driver protocol like
  * every other operator:
  *
  *   - builds the ORDERKEY family as graft STORES compacted with
  *     [[graft.logs.ClusterSpec.BucketBy]] (the layouts are a store
  *     feature: `format("graft")` serves the exchange-free plans from its
  *     validated `_graft_bucketspec`), plus 8-bucket custkey/partkey
  *     catalog layouts in a scratch dir (auto-broadcast disabled so the
  *     fixture-scale fact-fact joins exercise the co-location, not a
  *     tiny-table broadcast)
  *   - `require`s the plan contracts ([[Bucketing.requireNoShuffle]] /
  *     [[Bucketing.requireShufflesBounded]]) before executing
  *   - emits q13's full distribution plus one deterministic scalar per
  *     query (top row keys/values, ties broken by unique keys), all
  *     restated by the oracle from the plain tables
  */
object BucketedJoinQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark0: SparkSession, dir: String): DataFrame = {
    import spark0.implicits._
    val work = Files.createTempDirectory("graft-x27")
    // DROP TABLE on path-based external tables leaves the bucketed parquet
    // copies behind — reclaim the scratch tree at JVM exit like the sibling
    // store gates do
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(work.toFile)
    }))
    // per-run UNIQUE catalog names (the external catalog is process-global:
    // a fixed name would collide across concurrent gates and leak residue
    // on a crashed run) and a CLONED session for the plan-shape conf flips
    // (broadcast off + bucketed-scan ordering) — flipping them on the
    // shared session would distort every concurrently-planning query
    val prefix = s"x27_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    graft.ConfScope.withSessionConf(spark0,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") { spark =>
      try {
        // ORDERKEY family as a STORE feature (r14 verdict "Missing #2"): the
        // layouts are graft stores whose full compaction carries
        // ClusterSpec.BucketBy — the exchange-free plans below are served by
        // `format("graft")` itself (validated `_graft_bucketspec` →
        // HashPartitioning), not by scratch catalog tables
        val liRoot = s"$work/li_store"; val ordRoot = s"$work/ord_store"
        val liDf = Tables.lineitem(spark, dir).select(
          col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"),
          col("l_discount"), col("l_quantity"), col("l_partkey"), col("l_suppkey"))
          .withColumn("ly", date_format(col("l_shipdate"), "yyyy"))
        val ordDf = Tables.orders(spark, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_totalprice"))
          .withColumn("oy", date_format(col("o_orderdate"), "yyyy"))
        graft.logs.GraftStore.init(spark, liRoot)
        graft.logs.GraftStore.init(spark, ordRoot)
        graft.logs.AppendCommit.commit(liDf, liRoot, partitionCols = Seq("ly"))
        graft.logs.AppendCommit.commit(ordDf, ordRoot, partitionCols = Seq("oy"))
        graft.logs.Compaction.compactHive(spark, liRoot, partitionCols = Seq("ly"),
          full = true, cluster = graft.logs.ClusterSpec.BucketBy("l_orderkey", 8))
        graft.logs.Compaction.compactHive(spark, ordRoot, partitionCols = Seq("oy"),
          full = true, cluster = graft.logs.ClusterSpec.BucketBy("o_orderkey", 8))
        val liS = spark.read.format("graft").load(liRoot)
        val ordS = spark.read.format("graft").load(ordRoot)

        val (ordCkT, custCkT) = Bucketing.writeCustkeyTables(spark, dir, work.toString, 8, prefix)
        val (liPkT, partPkT) = Bucketing.writePartkeyTables(spark, dir, work.toString, 8, prefix)
        val cust = Tables.customer(spark, dir)

        val q3b = Bucketing.q3ColocatedFrames(liS, ordS, cust)
        Bucketing.requireNoShuffle(q3b, "x27 store-bucketed q3")
        val q3r = q3b.head()

        val q18b = Bucketing.q18ColocatedFrames(liS, ordS, cust)
        Bucketing.requireNoShuffle(q18b, "x27 store-bucketed q18")
        val q18r = q18b.head()

        val q13b = Bucketing.q13Colocated(spark, ordCkT, custCkT)
        Bucketing.requireShufflesBounded(q13b, "x27 bucketed q13", Set("c_count"))
        val q13r = q13b.as[(Long, Long)].collect().toSeq

        val q14b = Bucketing.q14Colocated(spark, liPkT, partPkT)
        Bucketing.requireShufflesBounded(q14b, "x27 bucketed q14", Set("_b"))
        val q14r = q14b.head()

        val q9b = Bucketing.q9ColocatedFrames(liS, ordS,
          Tables.part(spark, dir), Tables.supplier(spark, dir),
          Tables.table(spark, dir, "nation"))
        Bucketing.requireShufflesBounded(q9b, "x27 store-bucketed q9",
          Set("nation", "o_year", "_b"))
        val q9r = q9b.head()

        // everything is collected above, so the returned frame is independent
        // of the scratch tables dropped in the finally block
        q13r.toDF("c_count", "custdist").select(
          $"c_count", $"custdist",
          lit(q3r.getLong(0)).as("q3_top_orderkey"),
          lit(q3r.getDouble(3)).as("q3_top_revenue"),
          lit(q14r.getDouble(2)).as("q14_promo_share"),
          lit(q18r.getLong(2)).as("q18_top_orderkey"),
          lit(q18r.getDouble(5)).as("q18_top_qty"),
          lit(q9r.getString(0)).as("q9_first_nation"),
          lit(q9r.getDouble(2)).as("q9_first_profit"))
          .orderBy($"custdist".desc, $"c_count".desc)
      } finally {
        Seq(s"${prefix}_orders_ck", s"${prefix}_customer_ck",
          s"${prefix}_lineitem_pk", s"${prefix}_part_pk")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
    }
  }
}
