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
  *   - builds 8-bucket orderkey/custkey/partkey layouts in a scratch dir
  *     (auto-broadcast disabled so the fixture-scale fact-fact joins
  *     exercise the co-location, not a tiny-table broadcast)
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

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-x27").toString
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val ordKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevB = spark.conf.get(bcastKey)
    val prevO = spark.conf.get(ordKey)
    spark.conf.set(bcastKey, "-1")
    spark.conf.set(ordKey, "true")
    try {
      val (liT, ordT) = Bucketing.writeOrderkeyTables(spark, dir, work, 8, "x27")
      val (ordCkT, custCkT) = Bucketing.writeCustkeyTables(spark, dir, work, 8, "x27")
      val (liPkT, partPkT) = Bucketing.writePartkeyTables(spark, dir, work, 8, "x27")
      val cust = Tables.customer(spark, dir)

      val q3b = Bucketing.q3Colocated(spark, liT, ordT, cust)
      Bucketing.requireNoShuffle(q3b, "x27 bucketed q3")
      val q3r = q3b.head()

      val q18b = Bucketing.q18Colocated(spark, liT, ordT, cust)
      Bucketing.requireNoShuffle(q18b, "x27 bucketed q18")
      val q18r = q18b.head()

      val q13b = Bucketing.q13Colocated(spark, ordCkT, custCkT)
      Bucketing.requireShufflesBounded(q13b, "x27 bucketed q13", Set("c_count"))
      val q13r = q13b.as[(Long, Long)].collect().toSeq

      val q14b = Bucketing.q14Colocated(spark, liPkT, partPkT)
      Bucketing.requireShufflesBounded(q14b, "x27 bucketed q14", Set("_b"))
      val q14r = q14b.head()

      val q9b = Bucketing.q9Colocated(spark, liT, ordT,
        Tables.part(spark, dir), Tables.supplier(spark, dir),
        Tables.table(spark, dir, "nation"))
      Bucketing.requireShufflesBounded(q9b, "x27 bucketed q9",
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
      spark.conf.set(bcastKey, prevB)
      spark.conf.set(ordKey, prevO)
      Seq(s"x27_lineitem_b", "x27_orders_b", "x27_orders_ck",
        "x27_customer_ck", "x27_lineitem_pk", "x27_part_pk")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
