package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the TPC-H queries that run >2× DuckDB at
  * sf10 (q3, q9, q13, q14, q18, a3 — VERDICT r9–r12's standing attribution
  * item). Each query is split into its scan / join / aggregate stages and
  * every stage is timed in isolation (noop sink, warm cache, best of two),
  * so the paired DuckDB decomposition (`duck_decompose.py`, same stages in
  * SQL) attributes the gap to a specific operator instead of a ratio.
  *
  * Usage: `BenchDecompose <sfDir>`; respects SPARK_GRAFT_CACHE_LEVEL
  * (MEMORY_ONLY = the bench's serving shape, NONE = the parquet-scan
  * DuckDB-comparable shape). One JSON line per stage; summary line last.
  */
object BenchDecompose {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")
  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def discPrice =
    money(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - money(col("l_discount")))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
      Tables.enableCache()
      Seq("lineitem", "orders", "customer", "part", "supplier", "nation")
        .foreach(t => Tables.table(spark, sfDir, t).count())
    }

    def li = Tables.lineitem(spark, sfDir)
    def ord = Tables.orders(spark, sfDir)
    def cust = Tables.customer(spark, sfDir)
    def part = Tables.part(spark, sfDir)

    val stages: Seq[(String, () => DataFrame)] = Seq(
      // ---- raw scan rates ------------------------------------------------
      "li_count" -> (() => li.groupBy().agg(count(lit(1)).as("n"))),
      // decode 2 money columns + cents arithmetic, no filter/join
      "li_scan_cents" -> (() => li.agg(
        sum(cents(col("l_extendedprice"))).as("s1"),
        sum(cents(col("l_discount"))).as("s2"))),
      // same but decimal arithmetic (the pre-r11 shape) for the cents delta
      "li_scan_decimal" -> (() => li.agg(
        sum(discPrice).cast("double").as("s"))),
      // ---- q14: one-month window -----------------------------------------
      // filter + aggregate only (no part join): isolates scan+filter cost
      "q14_scanfilter" -> (() => li
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .agg(sum(cents(col("l_extendedprice"))).as("s"), count(lit(1)).as("n"))),
      // + the broadcast part join, still trivial agg: isolates probe cost
      "q14_join" -> (() => li
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(graft.plans.Hints.dimBroadcast(
          part.select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))),
      "q14_full" -> (() => queries.RelationalQueries.promoRevenue(spark, sfDir)),
      // ---- q3 --------------------------------------------------------------
      // the shrunken build side alone (orders⋈customer under both filters)
      "q3_ordcust" -> (() => ord
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .join(graft.plans.Hints.dimBroadcast(
          cust.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("n"))),
      // the big join, trivial agg (no groupBy shuffle): isolates join cost
      "q3_join" -> (() => {
        val oc = ord
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
          .join(graft.plans.Hints.dimBroadcast(
            cust.filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"))
        li.filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"))
      }),
      "q3_full" -> (() => queries.RelationalQueries.topUnshippedOrders(spark, sfDir)),
      // ---- q18 -------------------------------------------------------------
      // the orderkey aggregate alone — the only unavoidable fact shuffle
      "q18_bigkeys" -> (() => li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty_d"))
        .filter(col("sum_qty_d") > lit(300).cast("decimal(18,2)"))
        .agg(count(lit(1)).as("n"))),
      "q18_full" -> (() => queries.RelationalQueries.largeOrders(spark, sfDir)),
      // ---- q13 -------------------------------------------------------------
      // join + first aggregate, no second agg/sort
      "q13_join" -> (() => cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .agg(count(lit(1)).as("n"))),
      "q13_full" -> (() => queries.RelationalQueries.orderCountDistribution(spark, sfDir)),
      // ---- q9 --------------------------------------------------------------
      // fact ⋈ red-parts only (broadcast), trivial agg
      "q9_partjoin" -> (() => li
        .join(graft.plans.Hints.dimBroadcast(
          part.filter(col("p_name").like("red%")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))),
      // + the orders shuffle join
      "q9_ordjoin" -> (() => li
        .join(graft.plans.Hints.dimBroadcast(
          part.filter(col("p_name").like("red%")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))),
      "q9_full" -> (() => queries.RelationalQueries.productProfit(spark, sfDir)),
      // ---- a3 --------------------------------------------------------------
      // the dedup-first pre-aggregate (the only fact shuffle)
      "a3_presum" -> (() => li.select(col("l_partkey"), col("l_suppkey"))
        .join(graft.plans.Hints.dimBroadcast(
          part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n"))),
      "a3_full" -> (() => queries.RelationalQueries.distinctSuppliersPerBrand(spark, sfDir)),
      // ---- residual single-box floors (r14 verdict #6: q21/q17/q16) --------
      "q21_full" -> (() => queries.RelationalQueries.waitingSuppliers(spark, sfDir)),
      "q17_full" -> (() => queries.RelationalQueries.smallQuantityRevenue(spark, sfDir)),
      "q16_full" -> (() => queries.RelationalQueries.supplierCountByPart(spark, sfDir)),
      // ---- variants: the levers the base stages point at --------------------
      // q14's +2.3s over its scan stage is the 2M-row part broadcast (a
      // SINGLE-THREADED driver hash build); the filtered fact side is ~1/84
      // of lineitem, so a shuffle-hash join moves ~700k rows instead
      "v_q14_join_shuffle" -> (() => li
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(part.select(col("p_partkey"), col("p_type")).hint("shuffle_hash"),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))),
      // q3: same question for the ~3%-of-orders build side
      "v_q3_join_shuffle" -> (() => {
        val oc = ord
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
          .join(graft.plans.Hints.dimBroadcast(
            cust.filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"))
        li.filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"))
      }),
      // q18: decimal sum vs long-hundredths sum through the 15M-group agg
      "v_q18_bigkeys_long" -> (() => li.groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .filter(col("sum_qty_c") > lit(30000L))
        .agg(count(lit(1)).as("n"))),
      // q9: long-cents profit arithmetic through the full query shape
      "v_q9_cents" -> (() => li
        .join(graft.plans.Hints.dimBroadcast(
          part.filter(col("p_name").like("red%")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("s"))),
      // q13: pre-aggregate orders per custkey BEFORE joining customer — the
      // join then moves 1 row per customer instead of 1 per order
      "v_q13_preagg" -> (() => {
        val perCust = ord.groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
        cust.join(graft.plans.Hints.dimBroadcast(perCust),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      })
    )

    val reps = sys.env.getOrElse("SPARK_GRAFT_DECOMPOSE_REPS", "4").toInt
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    def runStage(name: String, mk: () => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm once untimed, then median of `reps-1` (this box's CPU drift
      // makes best-of-two lie — r13 saw a sub-stage time above its superset)
      once()
      val ts = Seq.fill(math.max(1, reps - 1))(once()).sorted
      val t = ts(ts.length / 2)
      out(name) = t
      println(f"""{"stage":"$name","sec":$t%.3f,"spread":"${ts.head}%.2f-${ts.last}%.2f"}""")
    }
    // optional stage filter for targeted reruns (comma list of prefixes)
    val only = sys.env.get("SPARK_GRAFT_DECOMPOSE_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    stages.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }.foreach { case (name, mk) => runStage(name, mk) }

    // ---- bucketed orderkey family (storage-layout fix for q3/q18) --------
    // one-time layout cost, reported separately (NOT a per-query stage: at
    // 100 TB the bucketed write is paid once per ingest, amortized over
    // every orderkey join after it)
    if (!sys.env.get("SPARK_GRAFT_SKIP_BUCKETED").contains("1")) {
      val scratch = sys.env.getOrElse("GRAFT_TMPDIR",
        sys.props("java.io.tmpdir")) + "/graft-bucketed"
      val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
      // one file per bucket (writeBucketed pre-repartitions) + this conf →
      // the scan reports per-bucket ordering and the SMJ skips its sorts
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val tb0 = System.nanoTime()
      val (liT, ordT) = ext.Bucketing.writeOrderkeyTables(
        spark, sfDir, scratch, buckets, prefix = "bench")
      val tb = (System.nanoTime() - tb0) / 1e9
      out("bucket_write") = tb
      println(f"""{"stage":"bucket_write","sec":$tb%.3f,"spread":"once"}""")
      // cache parity with the base stages (which read the MEMORY_ONLY table
      // cache): the per-query question is join/agg cost, not parquet decode
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        Seq(liT, ordT).foreach { t =>
          spark.table(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          spark.table(t).count()
        }
      }
      def custDf = Tables.customer(spark, sfDir)
      val q3b = () => ext.Bucketing.q3Colocated(spark, liT, ordT, custDf)
      val q18b = () => ext.Bucketing.q18Colocated(spark, liT, ordT, custDf)
      ext.Bucketing.requireNoShuffle(q3b(), "q3_bucketed")
      ext.Bucketing.requireNoShuffle(q18b(), "q18_bucketed")
      runStage("q3_bucketed", q3b)
      runStage("q18_bucketed", q18b)
      // q9 rides the SAME orderkey layout: dims broadcast, the one
      // fact-fact join co-locates, only (nation, year) subtotals move
      val q9b = () => ext.Bucketing.q9Colocated(spark, liT, ordT,
        Tables.part(spark, sfDir), Tables.supplier(spark, sfDir),
        Tables.table(spark, sfDir, "nation"))
      ext.Bucketing.requireShufflesBounded(q9b(), "q9_bucketed",
        Set("nation", "o_year", "_b"))
      runStage("q9_bucketed", q9b)
      // custkey family (q13): separate layout, same principle — only the
      // post-aggregation c_count distribution is allowed to move
      val tc0 = System.nanoTime()
      val (ordCkT, custCkT) = ext.Bucketing.writeCustkeyTables(
        spark, sfDir, scratch, buckets, prefix = "bench")
      val tc = (System.nanoTime() - tc0) / 1e9
      out("bucket_write_ck") = tc
      println(f"""{"stage":"bucket_write_ck","sec":$tc%.3f,"spread":"once"}""")
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        Seq(ordCkT, custCkT).foreach { t =>
          spark.table(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          spark.table(t).count()
        }
      }
      val q13b = () => ext.Bucketing.q13Colocated(spark, ordCkT, custCkT)
      ext.Bucketing.requireShufflesBounded(q13b(), "q13_bucketed", Set("c_count"))
      runStage("q13_bucketed", q13b)
      // partkey family (q14): co-located month-window join, subtotals only
      val tp0 = System.nanoTime()
      val (liPkT, partPkT) = ext.Bucketing.writePartkeyTables(
        spark, sfDir, scratch, buckets, prefix = "bench")
      val tp = (System.nanoTime() - tp0) / 1e9
      out("bucket_write_pk") = tp
      println(f"""{"stage":"bucket_write_pk","sec":$tp%.3f,"spread":"once"}""")
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        Seq(liPkT, partPkT).foreach { t =>
          spark.table(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          spark.table(t).count()
        }
      }
      val q14b = () => ext.Bucketing.q14Colocated(spark, liPkT, partPkT)
      ext.Bucketing.requireShufflesBounded(q14b(), "q14_bucketed", Set("_b"))
      runStage("q14_bucketed", q14b)
      // a3 is AGG-bound (the 60M-row (brand, suppkey) partial aggregate IS
      // the query) — the layout answer is a maintained pre-aggregation, not
      // bucketing: write the (brand, suppkey) rollup once (the exact shape
      // MatView maintains incrementally per ingest batch — gate x17), then
      // a3 is a tiny second-level aggregate over ~(brands × suppliers) rows
      val ta0 = System.nanoTime()
      val preaggPath = s"$scratch/a3_preagg"
      Tables.lineitem(spark, sfDir).select(col("l_partkey"), col("l_suppkey"))
        .join(graft.plans.Hints.dimBroadcast(
          Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey")).agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(preaggPath)
      val ta = (System.nanoTime() - ta0) / 1e9
      out("a3_preagg_write") = ta
      println(f"""{"stage":"a3_preagg_write","sec":$ta%.3f,"spread":"once"}""")
      val a3p = () => spark.read.parquet(preaggPath)
        .groupBy(col("p_brand"))
        .agg(count(col("l_suppkey")).as("n_suppliers"), sum(col("c")).as("n_lineitems"))
        .orderBy(col("p_brand"))
      runStage("a3_preagg", a3p)
      // ---- ROUTED stock plans (PlanRewrites, gate x28): the STOCK-named
      // builders, with the optimizer substituting the artifacts above —
      // what a user gets without calling any layout API by name ----
      graft.plans.PlanRewrites.register("bench_a3",
        queries.RelationalQueries.brandSupplierRollup(spark, sfDir),
        spark.read.parquet(preaggPath)
          .select(col("p_brand"), col("l_suppkey"), col("c")))
      try {
        val a3r = () => queries.RelationalQueries.distinctSuppliersPerBrand(spark, sfDir)
        require(graft.plans.PlanScans.fileScans(a3r())
          .flatMap(_.relation.location.rootPaths.map(_.toString))
          .exists(_.contains("a3_preagg")), "a3_routed must hit the artifact")
        runStage("a3_routed", a3r)
      } finally graft.plans.PlanRewrites.unregister("bench_a3")
      // q3_routed needs FULL-column bucketed copies (scan substitution is
      // schema-exact); written once, physical pruning still reads 4 columns
      val tf0 = System.nanoTime()
      ext.Bucketing.writeBucketed(Tables.lineitem(spark, sfDir),
        "bench_li_full", s"$scratch/li_full", "l_orderkey", buckets)
      ext.Bucketing.writeBucketed(Tables.orders(spark, sfDir),
        "bench_ord_full", s"$scratch/ord_full", "o_orderkey", buckets)
      val tf = (System.nanoTime() - tf0) / 1e9
      out("bucket_write_full") = tf
      println(f"""{"stage":"bucket_write_full","sec":$tf%.3f,"spread":"once"}""")
      // cache parity with every other stage (base tables and the bucketed
      // family all read the MEMORY_ONLY cache)
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        Seq("bench_li_full", "bench_ord_full").foreach { t =>
          spark.table(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          spark.table(t).count()
        }
      }
      graft.plans.PlanRewrites.register("bench_q3_li",
        Tables.lineitem(spark, sfDir), spark.table("bench_li_full"))
      graft.plans.PlanRewrites.register("bench_q3_ord",
        Tables.orders(spark, sfDir), spark.table("bench_ord_full"))
      try {
        val q3r = () => queries.RelationalQueries.topUnshippedOrders(spark, sfDir)
        ext.Bucketing.requireNoShuffle(q3r(), "q3_routed")
        runStage("q3_routed", q3r)
        // q21 rides the SAME orderkey registrations: the lineitem⋈orders(F)
        // join co-locates and the per-orderkey window reuses the bucket
        // partitioning — the only shuffles left move the per-supplier
        // numwait subtotals
        val q21r = () => queries.RelationalQueries.waitingSuppliers(spark, sfDir)
        ext.Bucketing.requireShufflesBounded(q21r(), "q21_routed", Set("s_name"))
        runStage("q21_routed", q21r)
        // q9: the single fact-fact orderkey join co-locates; dims broadcast;
        // only (nation, o_year) subtotal rows move
        val q9r = () => queries.RelationalQueries.productProfit(spark, sfDir)
        // the stock builder groups on raw spark_partition_id(), which
        // Catalyst extracts as `_nondeterministic` (and the year expression
        // as `_groupingexpression`) — bounded groupings under their
        // physical names
        ext.Bucketing.requireShufflesBounded(q9r(), "q9_routed",
          Set("nation", "o_year", "n_name", "_groupingexpression", "_nondeterministic"))
        runStage("q9_routed", q9r)
        // q18: the 15M-group orderkey aggregate and its orders join run
        // inside the bucket partitioning; the stock builder's UNhinted
        // customer join plans a shuffle that AQE converts to broadcast at
        // runtime (the filtered side is tiny), so the static-plan contract
        // lives on the Colocated variant, not here
        runStage("q18_routed",
          () => queries.RelationalQueries.largeOrders(spark, sfDir))
      } finally {
        graft.plans.PlanRewrites.unregister("bench_q3_li")
        graft.plans.PlanRewrites.unregister("bench_q3_ord")
        Seq("bench_li_full", "bench_ord_full")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
      // q17 needs the PARTKEY layout (its window partitions by l_partkey):
      // a full-column partkey-bucketed copy routes the stock builder
      val tq0 = System.nanoTime()
      ext.Bucketing.writeBucketed(Tables.lineitem(spark, sfDir),
        "bench_li_pk_full", s"$scratch/li_pk_full", "l_partkey", buckets)
      val tq = (System.nanoTime() - tq0) / 1e9
      out("bucket_write_pk_full") = tq
      println(f"""{"stage":"bucket_write_pk_full","sec":$tq%.3f,"spread":"once"}""")
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        spark.table("bench_li_pk_full")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        spark.table("bench_li_pk_full").count()
      }
      graft.plans.PlanRewrites.register("bench_q17_li",
        Tables.lineitem(spark, sfDir), spark.table("bench_li_pk_full"))
      ext.Bucketing.writeBucketed(Tables.part(spark, sfDir),
        "bench_part_pk_full", s"$scratch/part_pk_full", "p_partkey", buckets)
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        spark.table("bench_part_pk_full")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        spark.table("bench_part_pk_full").count()
      }
      graft.plans.PlanRewrites.register("bench_q14_part",
        Tables.part(spark, sfDir), spark.table("bench_part_pk_full"))
      try {
        val q17r = () => queries.RelationalQueries.smallQuantityRevenue(spark, sfDir)
        // global agg only: the brand-filtered window reuses the partkey
        // bucket partitioning, so no fact rows move
        ext.Bucketing.requireShufflesBounded(q17r(), "q17_routed", Set.empty)
        runStage("q17_routed", q17r)
        // q14: the month-window fact ⋈ part join co-locates on the partkey
        // layouts; only per-task (_b) subtotals move
        val q14r = () => queries.RelationalQueries.promoRevenue(spark, sfDir)
        ext.Bucketing.requireShufflesBounded(q14r(), "q14_routed",
          Set("_b", "_nondeterministic"))
        runStage("q14_routed", q14r)
      } finally {
        graft.plans.PlanRewrites.unregister("bench_q17_li")
        graft.plans.PlanRewrites.unregister("bench_q14_part")
        Seq("bench_li_pk_full", "bench_part_pk_full")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
      // q13: custkey layouts — full-column customer/orders copies so the
      // stock left-outer join and the per-custkey count co-locate; only the
      // ~40-value c_count distribution moves
      val t13 = System.nanoTime()
      ext.Bucketing.writeBucketed(Tables.orders(spark, sfDir),
        "bench_ord_ck_full", s"$scratch/ord_ck_full", "o_custkey", buckets)
      ext.Bucketing.writeBucketed(Tables.customer(spark, sfDir),
        "bench_cust_ck_full", s"$scratch/cust_ck_full", "c_custkey", buckets)
      val t13s = (System.nanoTime() - t13) / 1e9
      out("bucket_write_ck_full") = t13s
      println(f"""{"stage":"bucket_write_ck_full","sec":$t13s%.3f,"spread":"once"}""")
      if (!sys.env.get("SPARK_GRAFT_CACHE_LEVEL").contains("NONE")) {
        Seq("bench_ord_ck_full", "bench_cust_ck_full").foreach { t =>
          spark.table(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          spark.table(t).count()
        }
      }
      graft.plans.PlanRewrites.register("bench_q13_ord",
        Tables.orders(spark, sfDir), spark.table("bench_ord_ck_full"))
      graft.plans.PlanRewrites.register("bench_q13_cust",
        Tables.customer(spark, sfDir), spark.table("bench_cust_ck_full"))
      try {
        val q13r = () => queries.RelationalQueries.orderCountDistribution(spark, sfDir)
        ext.Bucketing.requireShufflesBounded(q13r(), "q13_routed", Set("c_count"))
        runStage("q13_routed", q13r)
      } finally {
        graft.plans.PlanRewrites.unregister("bench_q13_ord")
        graft.plans.PlanRewrites.unregister("bench_q13_cust")
        Seq("bench_ord_ck_full", "bench_cust_ck_full")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
      // q16: the distinct aggregate IS the query — the layout answer is the
      // a3 play: maintain the (brand,type,size,suppkey) rollup once, route
      // the stock-named builder through it
      val t16 = System.nanoTime()
      val preagg16 = s"$scratch/q16_preagg"
      graft.plans.PlanRewrites.withoutRewrites {
        queries.RelationalQueries.partSupplierRollup(spark, sfDir)
          .write.mode("overwrite").parquet(preagg16)
      }
      val t16s = (System.nanoTime() - t16) / 1e9
      out("q16_preagg_write") = t16s
      println(f"""{"stage":"q16_preagg_write","sec":$t16s%.3f,"spread":"once"}""")
      graft.plans.PlanRewrites.register("bench_q16",
        queries.RelationalQueries.partSupplierRollup(spark, sfDir),
        spark.read.parquet(preagg16).select(col("p_brand"), col("p_type"),
          col("p_size"), col("l_suppkey")))
      try {
        val q16r = () => queries.RelationalQueries.supplierCountByPart(spark, sfDir)
        require(graft.plans.PlanScans.fileScans(q16r())
          .flatMap(_.relation.location.rootPaths.map(_.toString))
          .exists(_.contains("q16_preagg")), "q16_routed must hit the artifact")
        runStage("q16_routed", q16r)
      } finally graft.plans.PlanRewrites.unregister("bench_q16")
    }
    val qj = out.map { case (n, t) => "\"" + n + "\":" + f"$t%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"decompose","queries":$qj,"sf":"$sfDir","cache":"${sys.env.getOrElse("SPARK_GRAFT_CACHE_LEVEL", "MEMORY_AND_DISK")}"}""")
    spark.stop()
  }
}
