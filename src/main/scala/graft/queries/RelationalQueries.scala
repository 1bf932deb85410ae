package graft.queries

import graft.Tables
import graft.plans.Hints
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

  /** Money as exact integer CENTS: `floor(x*100 + 0.5)` is one primitive
    * double op per row (the testdata money is 2-dp, so `x*100` is within
    * 1e-9 of an integer and the +0.5 floor is exact nearest-rounding;
    * `round()` would go through a per-row BigDecimal — measured 2.4x the
    * whole query at the 10x rehearsal), then all per-row arithmetic is
    * primitive long math inside whole-stage codegen — no per-row decimal
    * multiply/rescale, which is what made the decimal(18,2) aggregates 4x
    * DuckDB's int128 path. The DuckDB oracle restates the identical cents
    * pipeline (its BIGINT sum is a HUGEINT — also exact), so the final
    * double cast + division is bit-identical.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")

  /** TPC-H Q1 shape: wide grouped aggregation over lineitem — exact
    * long-cents arithmetic (see [[cents]]) summed HIERARCHICALLY: the
    * per-row path sums pure longs per (group, shuffle-partition) — the
    * bucket is `spark_partition_id()`, constant per task, so map-side
    * combine collapses each partition to one subtotal row per group —
    * and the handful of long subtotals re-sum as decimal(20,0) on the
    * second (group-only) level. Exact at any scale: a per-partition long
    * subtotal of cents-squared products (~4e8/row) would need >2e10 rows
    * in ONE partition to overflow, two orders past any sane partition
    * size, and the decimal re-sum is unbounded. The same values as a
    * one-level decimal sum (integer arithmetic, any grouping), at pure
    * primitive codegen cost.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val ec = cents(col("l_extendedprice"))
    val dc = cents(col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        spark_partition_id().as("_b"))
      .agg(
        sum(cents(col("l_quantity"))).as("_q"),
        sum(ec).as("_e"),
        sum(ec * (lit(100L) - dc)).as("_d"),
        count(lit(1)).as("_n"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("_q").cast("decimal(20,0)")).cast("double") / 100.0).as("sum_qty"),
        (sum(col("_e").cast("decimal(20,0)")).cast("double") / 100.0).as("sum_base_price"),
        (sum(col("_d").cast("decimal(20,0)")).cast("double") / 10000.0).as("sum_disc_price"),
        sum(col("_n")).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

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
    // orders x customer first: the BUILDING+date filters leave ~3% of
    // orders, so the orderkey join against lineitem (the only big shuffle
    // here) sees a pre-shrunk build side AQE can turn into a broadcast at
    // runtime; joining lineitem x orders first shuffles the full filtered
    // fact table before the customer filter ever bites (2x at the 10x
    // rehearsal)
    val ordCust = ord.join(Hints.dimBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ordCust, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      // plain long-cents sum (see [[dpc]]): one order's lines are structurally
      // few, so the per-group long subtotal can't overflow at any sf
      .agg((sum(dpc).cast("double") / 10000.0).as("revenue"))
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
      .join(Hints.dimBroadcast(cust.select(col("c_custkey"), col("c_nationkey"), col("n_name"))),
        col("o_custkey") === col("c_custkey"))
      .join(Hints.dimBroadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      // hierarchical long-cents (the q1 pattern): per-(group, partition)
      // long subtotals, decimal re-sum over the handful of subtotal rows
      .groupBy(col("n_name"), spark_partition_id().as("_b"))
      .agg(sum(dpc).as("_r"))
      .groupBy(col("n_name"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0).as("revenue"))
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
  /** Run `sql` with `df` exposed under a per-call-unique temp view name,
    * dropping the view immediately after the (eager) analysis — `spark.sql`
    * resolves at Dataset construction, so the returned frame's analyzed plan
    * no longer references the name, and the catalog stays residue-free
    * (`Bench`'s `catalog_residue` metric) with no cross-thread name races.
    */
  private def withTempView(spark: SparkSession, df: DataFrame,
      sql: String => String): DataFrame = {
    val v = s"graft_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(v)
    try spark.sql(sql(v)) finally spark.catalog.dropTempView(v)
  }

  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame =
    withTempView(spark, Tables.orders(spark, dir), v =>
      s"""SELECT o_orderkey FROM $v o
         |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
         |      (SELECT COUNT(*) FROM $v o2 WHERE o2.o_custkey = o.o_custkey)
         |    > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         |           FROM $v o2 WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin)

  /** GROUPING SETS aggregation (finer than rollup: two independent cuts). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    withTempView(spark, Tables.orders(spark, dir), v =>
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n
         |FROM $v
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)

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
      // plain long-cents: one customer's returned lines are structurally few
      .agg((sum(dpc).cast("double") / 10000.0).as("revenue"))
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
    * predicate and the projection push into the parquet reader); the
    * price x discount product is exact long-cents math, summed
    * hierarchically (see [[pricingSummary]] for the pattern).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .groupBy(spark_partition_id().as("_b"))
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).as("_r"),
        count(lit(1)).as("_n"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0)
          .as("revenue"),
        // empty scan: the keyed first level emits ZERO rows, but a global
        // count(*) must still answer 0 (revenue stays null, like a plain
        // SUM over nothing)
        coalesce(sum(col("_n")), lit(0L)).as("n"))

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

  private def discPrice =
    money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount")))

  /** discPrice in exact long hundredths-of-cents (see [[cents]]): one
    * primitive multiply per row inside whole-stage codegen, against
    * [[discPrice]]'s per-row Decimal allocation — measured 15× on a
    * full-lineitem aggregate at the 100× rehearsal scale. Sums divide by
    * 10000.0 AFTER the exact integer aggregate; each oracle restates the
    * identical cents pipeline so the one double rounding is shared.
    * Per-(group, partition) long subtotals overflow only past ~9e9 rows
    * per group per partition (dpc < 1e9); groups with unbounded row counts
    * re-sum subtotals as decimal(20,0) — the q1 hierarchical pattern.
    */
  private def dpc = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** TPC-H Q7 shape: bilateral trade volume between two nations by year.
    * Scale: nation/supplier are broadcast dims; the customer⋈orders⋈lineitem
    * chain shuffles once per key it already needs. The two-direction predicate
    * is applied AFTER the cheap dimension joins, not as a cross filter.
    */
  def nationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(spark, dir).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("ck"))
      .join(broadcast(n2), col("s_nationkey") === col("sk"))
      .filter((col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_2") ||
        (col("cust_nation") === "NATION_2" && col("supp_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        date_format(col("l_shipdate"), "yyyy").as("l_year"),
        spark_partition_id().as("_b"))
      .agg(sum(dpc).as("_r"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape: a supplier nation's market share inside one customer
    * region, by order year. The share is a single IEEE division of two
    * exactly-aggregated decimal sums — bit-identical to the oracle.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val custNations = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("ck"))
    val suppNations = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Hints.dimBroadcast(Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimBroadcast(custNations), col("c_nationkey") === col("ck"))
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Hints.dimBroadcast(suppNations), col("s_nationkey") === col("sk"))
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"),
        spark_partition_id().as("_b"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", dpc).otherwise(lit(0L))).as("_n"),
        sum(dpc).as("_t"))
      .groupBy(col("o_year"))
      .agg(
        (sum(col("_n").cast("decimal(20,0)")).cast("double") / 10000.0).as("nation_volume"),
        (sum(col("_t").cast("decimal(20,0)")).cast("double") / 10000.0).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q14 shape: promo revenue share for one ship month — a conditional
    * aggregate ratio over a tight scan window (both predicates push to
    * parquet row groups; part is a broadcast dim). Exact long-cents
    * arithmetic per row (see [[cents]]); the share is computed from the
    * two already-divided doubles, restated the same way in the oracle.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dpc = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      // deliberately NOT dimBroadcast (see Hints doc): the month window
      // shrinks the fact side to ~1%, so shuffling two small sides beats a
      // single-threaded driver build of the FULL part dim (r13: 0.6 s vs
      // 1.0 s at sf10); AQE still broadcasts while part is actually small
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(spark_partition_id().as("_b"))
      .agg(
        sum(when(col("p_type") === "PROMO", dpc).otherwise(lit(0L))).as("_p"),
        sum(dpc).as("_t"))
      .agg(
        (sum(col("_p").cast("decimal(20,0)")).cast("double") / 10000.0).as("promo_revenue"),
        (sum(col("_t").cast("decimal(20,0)")).cast("double") / 10000.0).as("total_revenue"))
      .withColumn("promo_share", lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  /** TPC-H Q15 shape: the top supplier(s) by quarterly revenue — an aggregate
    * reused twice (per-supplier revenue, then its max) without recomputation
    * concerns at scale: the revenue aggregate is tiny (|suppliers| rows), so
    * the max is a broadcast-back scalar.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      // plain long-cents: one supplier's quarter lines are bounded (lineitem
      // and supplier cardinalities scale together)
      .agg((sum(dpc).cast("double") / 10000.0).as("total_revenue"))
      // the aggregate feeds BOTH the max scalar and the equality filter;
      // without the cache Spark inlines it and aggregates the fact table
      // twice (the q11 lesson). persist() is supplier-cardinality. The
      // former empty-partition window computed the same max but moved the
      // whole aggregate into ONE partition — fine at |suppliers| today,
      // a single-task wall once dimensions grow with the corpus.
      .persist()
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    Tables.supplier(spark, dir)
      .join(rev.join(broadcast(maxRev))
          .filter(col("total_revenue") === col("max_rev")).drop("max_rev"),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q18 shape: large-volume orders — a HAVING filter on a grouped sum
    * feeding a join back to the order/customer detail, top-10 by price.
    */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    // quantity in exact hundredths (2-dp testdata money rule applies to
    // quantities too): a long sum per order instead of per-row Decimals —
    // the 15M-group aggregate is this query's whole cost at scale
    val bigKeys = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
      .filter(col("sum_qty_c") > lit(30000L))
    Tables.orders(spark, dir)
      .join(bigKeys, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), (col("sum_qty_c").cast("double") / 100.0).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions — the
    * whole OR-of-ANDs predicate evaluates inside one codegen stage after a
    * broadcast join with the part dim.
    */
  def disjunctivePredicates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Hints.dimBroadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      // global group over a scale-growing match set → hierarchical cents
      .groupBy(spark_partition_id().as("_b"))
      .agg(sum(dpc).as("_r"), count(lit(1)).as("_n"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0).as("revenue"),
        sum(col("_n")).as("n"))

  /** TPC-H Q22 shape: well-funded customers with no LARGE order — a scalar
    * average subquery (computed once, broadcast back) + left-anti join.
    * (The anti side is large orders, not all orders: a dense orders table
    * makes "no orders at all" empty at every scale factor.)
    */
  def globalSalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    // the same explicit exact-sum/count division as the oracle (engine-native
    // avg() would aggregate doubles in engine-specific order)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(money(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(money(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** CUBE aggregation — completes the grouping family (rollup g1, grouping
    * sets g3): all four cuts of status × priority in one pass.
    */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** TPC-H Q2 shape (adapted: the testdata has no partsupp, so the
    * part↔supplier relation is the distinct (partkey, suppkey) pairs observed
    * in lineitem, and "min supply cost" becomes min supplier balance): for
    * each part type, the minimum-balance supplier that ships it, lowest
    * suppkey on ties. Scale: the argmin join-back operates on the tiny
    * (type, supplier) aggregate, never on lineitem twice; dims broadcast.
    */
  def minBalanceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(Hints.dimBroadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("l_suppkey")).distinct()
    val withBal = pairs
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_type"), col("s_suppkey"), money(col("s_acctbal")).as("bal_d"))
    // min-per-type via a window over the ONE pass, not aggregate+join-back:
    // Spark inlines the repeated frame, so the join form recomputes the
    // whole lineitem distinct pipeline (the q21/t15 lesson). The window
    // partition is p_type — bounded by suppliers-per-type, never fact-sized
    val byType = Window.partitionBy(col("p_type"))
    withBal
      .withColumn("min_bal_d", min(col("bal_d")).over(byType))
      .filter(col("bal_d") === col("min_bal_d"))
      .groupBy(col("p_type"), col("min_bal_d"))
      .agg(min(col("s_suppkey")).as("s_suppkey"))
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        Seq("s_suppkey"))
      .select(col("p_type"), col("s_suppkey"), col("s_name"),
        col("min_bal_d").cast("double").as("min_bal"))
      .orderBy(col("p_type"))
  }

  /** TPC-H Q9 shape (profit by supplier nation and order year for one part
    * family; the testdata has no partsupp cost, so profit is the discounted
    * price). Dimensions broadcast; the fact chain shuffles once on orderkey.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Hints.dimBroadcast(Tables.part(spark, dir).filter(col("p_name").like("red%"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"),
        spark_partition_id().as("_b"))
      .agg(sum(dpc).as("_r"))
      .groupBy(col("nation"), col("o_year"))
      .agg((sum(col("_r").cast("decimal(20,0)")).cast("double") / 10000.0).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11 shape (important stock: parts whose aggregate lineitem value
    * exceeds a fraction of the global total). The global total is a scalar
    * broadcast back over the tiny per-part aggregate — the full fact table is
    * scanned exactly once.
    *
    * The per-part aggregate feeds BOTH the threshold scalar and the main
    * filter; Spark inlines repeated DataFrame references and ReuseExchange
    * does not fire across the broadcast-threshold subtree, so without a
    * cache the lineitem scan + partkey shuffle would run twice (confirmed
    * in the executed plan: 2 scans, 0 ReusedExchange). `persist()` pins the
    * part-cardinality aggregate — tiny next to the fact table at any scale
    * — so both consumers read one materialization and lineitem is scanned
    * once. The CacheManager keys on the canonicalized plan, so repeated
    * calls reuse rather than leak entries.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    // long-cents per part (one part's lines are bounded); the threshold and
    // the filter stay on the CENTS scale end-to-end so the boundary
    // comparison is the same double comparison the oracle restates
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
      .persist()
    // scale-free threshold (1.2× the mean per-part value): a fixed fraction
    // of the grand total selects ~nothing once the part count grows, while a
    // mean multiple tracks the distribution at every scale factor
    val threshold = perPart.agg(
      (lit(1.2) * sum(col("value_c").cast("decimal(20,0)")).cast("double") /
        count(lit(1))).as("thresh"))
    perPart.join(broadcast(threshold))
      .filter(col("value_c").cast("double") > col("thresh"))
      .select(col("l_partkey"), (col("value_c").cast("double") / 100.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (priority class counts per line status for one ship
    * year; the testdata has no shipmode/commitdate, so the group key is
    * l_linestatus and "late" semantics live in Q21). One shuffle join on
    * orderkey, conditional counts in a single aggregate pass.
    */
  def priorityLines(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** TPC-H Q16 shape: distinct supplier counts per (brand, type, size) for a
    * size set, excluding one brand and "complaint" suppliers (negative
    * balance stands in for the comment scan). The exclusion set is a
    * broadcast anti join. Both broadcast joins run BEFORE any shuffle so
    * the selective part filter prunes the fact rows first, and there is no
    * pre-`distinct()` — `countDistinct` already dedups (two-phase partial
    * aggregate), so a distinct would only add a full-width extra shuffle
    * of the unfiltered pair set.
    */
  /** q16's pre-distinct rollup — the same dedup-first restatement as a3's
    * [[brandSupplierRollup]], exposed so the routing seam can substitute a
    * maintained pre-aggregate: one (brand, type, size, suppkey) row per
    * distinct combination. A pure DISTINCT (no carried count): the outer
    * query doesn't read a multiplicity, and an unused aggregate would be
    * pruned out of the stock plan by the optimizer — the registered
    * fragment must be exactly what survives optimization or `sameResult`
    * can never match it.
    */
  def partSupplierRollup(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(Hints.dimBroadcast(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#11" &&
            col("p_size").isin(1, 5, 9, 14, 20, 27, 33, 40))),
        col("l_partkey") === col("p_partkey"))
      .join(Hints.dimBroadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct()
  }

  def supplierCountByPart(spark: SparkSession, dir: String): DataFrame =
    // dedup-first (same rationale as distinctSuppliersPerBrand): collapse on
    // (brand, type, size, suppkey) once, then the distinct count is a plain
    // count over the rollup — value-identical to countDistinct (suppkey is
    // non-null; count(col) skips nulls exactly like COUNT(DISTINCT)), and
    // the rollup fragment becomes routable to a maintained artifact
    partSupplierRollup(spark, dir)
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** TPC-H Q17 shape: revenue from small-quantity orders of one brand —
    * the per-part average quantity is a correlated aggregate over the SAME
    * rows the outer query reads.
    *
    * Because the brand predicate is keyed on `l_partkey` (a lineitem row is
    * in a Brand#12 part or not, row-independent), the per-part average over
    * the brand-filtered subset equals the average over the full table for
    * every surviving partkey — so the filter goes FIRST, and the average
    * rides a window over the ~0.1% of rows that survive the broadcast part
    * join. One lineitem scan, one (tiny) partkey shuffle; the naive shape
    * (group ALL of lineitem by partkey, join back) scans the fact table
    * twice and aggregates 99.9% of parts only to drop them at the join.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .join(Hints.dimBroadcast(Tables.part(spark, dir).filter(col("p_brand") === "Brand#12")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      // exactly the join-back arithmetic: CAST(SUM(DECIMAL(18,2)) AS DOUBLE)
      // / COUNT(*), evaluated per partkey
      .withColumn("avg_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(money(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q20 shape: suppliers in one nation that shipped a meaningful
    * volume of one part family — a nested aggregate feeding a semi join.
    */
  def potentialPromotion(spark: SparkSession, dir: String): DataFrame = {
    val shippers = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Hints.dimBroadcast(Tables.part(spark, dir).filter(col("p_name").like("red%"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("ship_qty"))
      .filter(col("ship_qty") > lit(50).cast("decimal(18,2)"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: suppliers who were the only late shipper in a finished
    * multi-supplier order ("late" = shipped >60 days after the order date —
    * the testdata has no commit/receipt dates).
    *
    * Single-pass formulation: the textbook EXISTS / NOT EXISTS self-joins
    * reference the lineitem⋈orders CTE three times, and Spark INLINES
    * repeated CTE refs — three fact-table shuffles where one suffices (at
    * sf1 this was the slowest TPC-H query in the suite, 3× the cost of its
    * neighbors). Both existence checks are order-scoped, so they collapse
    * to window aggregates over the ONE join output, partitioned by the
    * join key the rows already hash on (zero extra shuffles):
    *   ∃ other supplier        ⟺ min(l_suppkey) ≠ max(l_suppkey)
    *   ∄ other LATE supplier   ⟺ min(late supp) = max(late supp), given
    *                             this row is itself late.
    * The DuckDB oracle keeps the EXISTS formulation — two independent
    * derivations of the same rows.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        // + INTERVAL, not date_add: date_add would truncate a timestamp
        // orderdate to midnight and silently diverge from the oracle's
        // `o_orderdate + INTERVAL 60 DAY`
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val lateSupp = when(col("late"), col("l_suppkey"))
    lo.withColumn("supp_lo", min(col("l_suppkey")).over(w))
      .withColumn("supp_hi", max(col("l_suppkey")).over(w))
      .withColumn("late_lo", min(lateSupp).over(w))
      .withColumn("late_hi", max(lateSupp).over(w))
      .filter(col("late") && col("supp_lo") =!= col("supp_hi") &&
        col("late_lo") === col("late_hi"))
      .join(Hints.dimBroadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Exact grouped COUNT(DISTINCT): suppliers per part brand. The distinct
    * runs as Spark's two-phase expand+aggregate; part is a broadcast dim.
    */
  /** The (brand, suppkey) rollup a3 aggregates over — exposed as its own
    * builder so the x28 routing gate can register THE SAME fragment with
    * [[graft.plans.PlanRewrites]] (sameResult matching needs the identical
    * plan, and one shared builder cannot drift from the stock query).
    */
  def brandSupplierRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(Hints.dimBroadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey")).agg(count(lit(1)).as("c"))

  def distinctSuppliersPerBrand(spark: SparkSession, dir: String): DataFrame =
    // dedup-first: countDistinct mixed with count(*) plans an Expand that
    // doubles the joined fact rows through the aggregate; collapsing on
    // (brand, suppkey) first is one map-side-combining shuffle and the
    // totals ride along as a sum
    brandSupplierRollup(spark, dir)
      .groupBy(col("p_brand"))
      // count(l_suppkey) skips a NULL-supplier group row, matching
      // count(DISTINCT l_suppkey) semantics; the row total keeps every row
      .agg(count(col("l_suppkey")).as("n_suppliers"), sum(col("c")).as("n_lineitems"))
      .orderBy(col("p_brand"))
}
