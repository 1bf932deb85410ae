package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned, co-located) tables — the shuffle-elimination
  * technique for repeated large-×-large joins (SURVEY §4 "physical:
  * partitioning"): both sides are written hash-bucketed and sorted on the
  * join key, so Catalyst plans the join with ZERO exchanges — at 100 TB the
  * dominant cost of a fact-fact join is the shuffle, and bucketing pays it
  * once at write time instead of per query.
  *
  * The orderkey family below is the r13 verdict's standing demonstration:
  * q3/q18's remaining >2×-DuckDB gap at sf10 is a single fact-scale shuffle
  * (the 30M-row orderkey join / the 15M-group orderkey aggregate) that a
  * single box pays through serialization while single-node DuckDB uses
  * shared-memory radix joins. With lineitem and orders bucketed on
  * orderkey, BOTH shapes plan with no shuffle exchange at all — the
  * aggregate's `ClusteredDistribution(l_orderkey, …)` is satisfied by the
  * bucket partitioning (l_orderkey is a subset of the grouping), the
  * fact-fact join is co-located, dims still broadcast, and the top-10
  * finishes in `TakeOrderedAndProject`. [[requireNoShuffle]] pins the
  * contract; `BenchDecompose`'s `q3_bucketed`/`q18_bucketed` stages pair it
  * with DuckDB timings.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`. The
    * pre-write `repartition(buckets, key)` gives each write task exactly
    * one bucket, so every bucket is ONE file — with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` the scan
    * then reports per-bucket ordering and the co-located sort-merge join
    * skips its sorts too (multi-file buckets would force a merge-sort per
    * bucket before the join).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: no Exchange appears
    * in the plan (verify with `.explain`).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Fail unless every shuffle in the plan sits ABOVE a partial aggregate
    * whose grouping is exactly `boundedGroupCols` — i.e. the only data that
    * ever moves is the post-aggregation result, bounded per task by the
    * distinct values of those columns, never a fact-scale row set. This is
    * the contract for shapes like q13 where the final tiny re-aggregation
    * (distribution over `c_count`, ~40 distinct values) legitimately
    * shuffles a few hundred rows while all fact-side work (the per-custkey
    * count, the customer join) stays inside the bucket partitioning.
    */
  def requireShufflesBounded(df: DataFrame, what: String,
      boundedGroupCols: Set[String]): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    /** True only when every row the shuffle streams has ALREADY passed a
      * bounded aggregate on its DIRECT input path. Recursion stops cold at
      * join nodes and nested shuffles (an aggregate somewhere below a join
      * bounds that join INPUT, not the join's — potentially fact-scale —
      * output), and subqueries never vouch for the streamed rows (they
      * feed a scalar/broadcast, not this shuffle).
      */
    def boundedInput(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec =>
        // a GLOBAL partial aggregate (empty grouping) emits one row per task
        // — always bounded; otherwise match the grouping by output NAME (an
        // Alias(coalesce(cnt,0), "c_count") from a collapsed projection
        // still counts), not by input references
        a.groupingExpressions.isEmpty ||
          a.groupingExpressions.map(_.name).toSet.subsetOf(boundedGroupCols)
      case _: BaseJoinExec => false
      case _: ShuffleExchangeLike => false
      case a: AdaptiveSparkPlanExec => boundedInput(a.executedPlan)
      case q: QueryStageExec => boundedInput(q.plan)
      case other => other.children.nonEmpty && other.children.forall(boundedInput)
    }
    def check(p: SparkPlan): Unit = {
      p match {
        case s: ShuffleExchangeLike =>
          require(kids(s).forall(boundedInput),
            s"$what: a shuffle moves un-aggregated (fact-scale) rows —\n" +
              df.queryExecution.executedPlan)
        case _ =>
      }
      kids(p).foreach(check); p.subqueries.foreach(check)
    }
    check(df.queryExecution.executedPlan)
  }

  /** Fail unless the plan is SHUFFLE-free (broadcast exchanges are allowed —
    * they move a dim, not the fact). Walks pre- or post-AQE plans and
    * subqueries; call before timing (initial plan) or after an action
    * (final plan) — a shuffle can never appear at runtime that was not in
    * the initial plan, AQE only removes or re-plans existing exchanges.
    */
  def requireNoShuffle(df: DataFrame, what: String): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case s: ShuffleExchangeLike => Seq(s: SparkPlan)
        case _ => Seq.empty[SparkPlan]
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(shuffles) ++ p.subqueries.flatMap(shuffles)
    }
    val found = shuffles(df.queryExecution.executedPlan)
    require(found.isEmpty,
      s"$what must plan exchange-free over bucketed tables, found " +
        s"${found.size} shuffle(s):\n${df.queryExecution.executedPlan}")
  }

  // exact long-cents money arithmetic, same rule as RelationalQueries:
  // the 2-dp testdata domain sums exactly in hundredths
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")
  private def dpc =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** One-time setup for the orderkey family: bucketed, sorted, column-pruned
    * copies of lineitem and orders under `workDir`, registered as
    * `<prefix>_lineitem_b` / `<prefix>_orders_b`. Idempotent per session
    * (re-registering overwrites). Returns the two table names.
    */
  def writeOrderkeyTables(spark: SparkSession, sfDir: String, workDir: String,
      buckets: Int, prefix: String = "graft"): (String, String) = {
    val liT = s"${prefix}_lineitem_b"
    val ordT = s"${prefix}_orders_b"
    val li = graft.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"),
      col("l_discount"), col("l_quantity"),
      // q9 reads these two; q3/q18 scans still prune them away
      col("l_partkey"), col("l_suppkey"))
    val ord = graft.Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      col("o_orderpriority"), col("o_totalprice"))
    writeBucketed(li, liT, s"$workDir/lineitem_b", "l_orderkey", buckets)
    writeBucketed(ord, ordT, s"$workDir/orders_b", "o_orderkey", buckets)
    (liT, ordT)
  }

  /** TPC-H Q3 over orderkey-bucketed lineitem/orders: same semantics as
    * `RelationalQueries.topUnshippedOrders`, zero shuffle exchanges — the
    * fact-fact orderkey join is co-located, the customer dim broadcasts,
    * and the `GROUP BY (l_orderkey, …)` reuses the bucket partitioning
    * (l_orderkey ⊆ grouping satisfies the clustered distribution).
    */
  def q3Colocated(spark: SparkSession, liTable: String, ordTable: String,
      customer: DataFrame): DataFrame =
    q3ColocatedFrames(spark.table(liTable), spark.table(ordTable), customer)

  /** Frame-based q3 — the same exchange-free shape over ANY co-partitioned
    * pair of lineitem/orders frames: catalog bucketed tables OR a
    * `format("graft")` store compacted with [[graft.logs.ClusterSpec.BucketBy]]
    * (whose relation reports the same HashPartitioning).
    */
  def q3ColocatedFrames(li: DataFrame, ordIn: DataFrame,
      customer: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = ordIn
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .join(graft.plans.Hints.dimBroadcast(cust),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(dpc).cast("double") / 10000.0).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q18 over orderkey-bucketed lineitem/orders: same semantics as
    * `RelationalQueries.largeOrders`, zero shuffle exchanges — the 15M-group
    * orderkey aggregate runs inside the bucket partitioning and its output
    * joins the same-bucketed orders without moving either side.
    */
  def q18Colocated(spark: SparkSession, liTable: String, ordTable: String,
      customer: DataFrame): DataFrame =
    q18ColocatedFrames(spark.table(liTable), spark.table(ordTable), customer)

  /** Frame-based q18 — see [[q3ColocatedFrames]]. */
  def q18ColocatedFrames(li: DataFrame, ord: DataFrame,
      customer: DataFrame): DataFrame = {
    val bigKeys = li
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
      .filter(col("sum_qty_c") > lit(30000L))
    ord
      .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
      .join(graft.plans.Hints.dimBroadcast(
        customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), (col("sum_qty_c").cast("double") / 100.0).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q9 over the SAME orderkey-bucketed tables as q3/q18: same
    * semantics as `RelationalQueries.productProfit`. Every dimension
    * broadcasts (filtered part, supplier, nation); the one fact-fact join —
    * lineitem⋈orders on orderkey, the query's single fact-scale shuffle in
    * the stock plan — is co-located, and the (nation, year) aggregate is
    * bounded (≈25×7 groups × tasks), so only subtotal rows ever move
    * ([[requireShufflesBounded]]).
    */
  def q9Colocated(spark: SparkSession, liTable: String, ordTable: String,
      part: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame =
    q9ColocatedFrames(spark.table(liTable), spark.table(ordTable),
      part, supplier, nation)

  /** Frame-based q9 — see [[q3ColocatedFrames]]. */
  def q9ColocatedFrames(li: DataFrame, ord: DataFrame,
      part: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    li
      .join(graft.plans.Hints.dimBroadcast(
        part.filter(col("p_name").like("red%")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.plans.Hints.dimBroadcast(
        supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      // materialize the partition id pre-grouping (see q14Colocated)
      .select(col("n_name").as("nation"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"),
        spark_partition_id().as("_b"),
        col("l_extendedprice"), col("l_discount"))
      .groupBy(col("nation"), col("o_year"), col("_b"))
      .agg(sum(dpc).as("_r"))
      .groupBy(col("nation"), col("o_year"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** One-time setup for the custkey family (q13's key): orders bucketed and
    * sorted on `o_custkey`, customer on `c_custkey`, same bucket count — the
    * left-outer customer⟕orders join co-locates and the per-custkey order
    * count reuses the bucket partitioning. Column-pruned to what q13 reads.
    */
  def writeCustkeyTables(spark: SparkSession, sfDir: String, workDir: String,
      buckets: Int, prefix: String = "graft"): (String, String) = {
    val ordT = s"${prefix}_orders_ck"
    val custT = s"${prefix}_customer_ck"
    writeBucketed(
      graft.Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey")),
      ordT, s"$workDir/orders_ck", "o_custkey", buckets)
    writeBucketed(
      graft.Tables.customer(spark, sfDir).select(col("c_custkey")),
      custT, s"$workDir/customer_ck", "c_custkey", buckets)
    (ordT, custT)
  }

  /** TPC-H Q13 over custkey-bucketed orders/customer: same semantics as
    * `RelationalQueries.orderCountDistribution` (customers with zero orders
    * included), with ALL fact-side work inside the bucket partitioning —
    * the per-custkey order count aggregates exchange-free, the left-outer
    * customer join is co-located (HashPartitioning survives the aggregate),
    * and the only shuffles left move the ~40-distinct-value `c_count`
    * distribution after map-side partial aggregation
    * ([[requireShufflesBounded]] pins it).
    */
  def q13Colocated(spark: SparkSession, ordTable: String,
      custTable: String): DataFrame = {
    val perCust = spark.table(ordTable)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    spark.table(custTable)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** One-time setup for the partkey family (q14's join key, also q9's
    * dominant join): lineitem bucketed+sorted on `l_partkey`, part on
    * `p_partkey`, column-pruned to what q14 reads. (A deployment picks ONE
    * bucketing per physical fact copy — orderkey is lineitem's sweet spot
    * for TPC-H — but each family is demonstrated independently here; at
    * 100 TB a second sort order is exactly what a projection/index copy
    * would provide.)
    */
  def writePartkeyTables(spark: SparkSession, sfDir: String, workDir: String,
      buckets: Int, prefix: String = "graft"): (String, String) = {
    val liT = s"${prefix}_lineitem_pk"
    val partT = s"${prefix}_part_pk"
    writeBucketed(
      graft.Tables.lineitem(spark, sfDir).select(
        col("l_partkey"), col("l_shipdate"), col("l_extendedprice"), col("l_discount")),
      liT, s"$workDir/lineitem_pk", "l_partkey", buckets)
    writeBucketed(
      graft.Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type")),
      partT, s"$workDir/part_pk", "p_partkey", buckets)
    (liT, partT)
  }

  /** TPC-H Q14 over partkey-bucketed lineitem/part: same semantics (and the
    * same two-level long-cents arithmetic) as `RelationalQueries
    * .promoRevenue`, with the month-window fact scan joining part CO-LOCATED
    * — no shuffled fact rows and no full-dim broadcast build; the only
    * exchanges move per-task subtotal rows ([[requireShufflesBounded]] with
    * the partition-id group, plus the global re-sum's empty grouping).
    */
  def q14Colocated(spark: SparkSession, liTable: String,
      partTable: String): DataFrame = {
    spark.table(liTable)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(spark.table(partTable), col("l_partkey") === col("p_partkey"))
      // materialize the partition id as a named column BEFORE grouping:
      // grouping on the raw nondeterministic expression would be pulled out
      // as `_nondeterministic` and defeat requireShufflesBounded's
      // name-based contract
      .select(col("p_type"), col("l_extendedprice"), col("l_discount"),
        spark_partition_id().as("_b"))
      .groupBy(col("_b"))
      .agg(
        sum(when(col("p_type") === "PROMO", dpc).otherwise(lit(0L))).as("_p"),
        sum(dpc).as("_t"))
      .agg(
        (sum(col("_p").cast("decimal(20,0)")).cast("double") / 10000.0).as("promo_revenue"),
        (sum(col("_t").cast("decimal(20,0)")).cast("double") / 10000.0).as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }
}
