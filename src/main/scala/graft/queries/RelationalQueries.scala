package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational surface over the TPC-H-ish testdata: joins (broadcast +
  * shuffled), grouped/rollup aggregation, semi/anti joins, window ranking.
  *
  * Numeric policy for oracle parity: the 2-decimal money doubles are cast to
  * `decimal(18,2)` BEFORE any arithmetic, aggregated exactly, and cast to
  * double once at the end — bit-identical in Spark and DuckDB regardless of
  * partial-aggregation order. (A raw double SUM is order-dependent and can
  * differ in the last ulp between engines.)
  */
object RelationalQueries {

  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1 shape: wide grouped aggregation over lineitem. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, top-10 revenue.
    * customer is the small side → broadcast; lineitem⋈orders shuffles on the
    * key both sides already need. Top-k goes through TakeOrderedAndProject,
    * not a global sort.
    */
  def topUnshippedOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-table join — dimensions (region→nation) broadcast,
    * fact-side joins shuffle once on orderkey.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val supp = Tables.supplier(spark, dir)
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_nationkey"), col("n_name"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join (EXISTS): customers having at least one big order. */
  def semiJoinBigSpenders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): parts with no shipment before 1996. */
  def antiJoinNeverOrdered(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Window ranking: top-2 orders per customer by price (deterministic
    * tie-break on orderkey).
    */
  def windowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** ROLLUP aggregation over order status × priority. */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Correlated scalar subqueries through the `spark.sql` surface (Catalyst
    * decorrelates them into aggregating joins): orders whose price is more
    * than twice their customer's average. Arithmetic stays in decimal so the
    * boundary comparison is exact against the oracle.
    */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    // view name unique to this query: Verify/Bench run queries concurrently
    // on one session, and temp views are session-global state
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v_sub")
    spark.sql(
      """SELECT o_orderkey FROM orders_v_sub o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders_v_sub o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |           FROM orders_v_sub o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** GROUPING SETS aggregation (finer than rollup: two independent cuts). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders_v_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top-20. */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q4 shape: order-priority counts over orders with at least one
    * late-shipped line (correlated EXISTS with an inequality — Catalyst
    * rewrites to a left-semi join on key + residual condition).
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    Tables.orders(spark, dir)
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape: the pure-scan revenue-forecast aggregate (every
    * predicate and the projection push into the parquet reader).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * money(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q13 shape: customer order-count distribution (LEFT OUTER join —
    * customers with zero orders must appear — then a second aggregation over
    * the first's results).
    */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count() skips the null rows
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Exact median via `percentile` (interpolating, matches quantile_cont). */
  def medianQuantity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
}
