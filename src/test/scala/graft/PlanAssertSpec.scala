package graft

/** Plan-level scale gates: these assertions pin the PHYSICAL properties the
  * 100 TB design depends on, so a refactor that silently degrades a plan
  * (global sort instead of top-k, cartesian instead of equi-join, lost
  * pushdown) fails CI rather than a production run.
  */
class PlanAssertSpec extends SparkSpec {

  private def plan(name: String): String = {
    // default maxMetadataStringLength=100 elides PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q3_top_revenue", "q10_returned_revenue", "q18_large_orders"))
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q lost its top-k plan")
  }

  test("no query plans a cartesian product") {
    // e2e queries build fixture stores inside dataFrame() and d6 executes its
    // iterative loop eagerly — their plans are covered by their own specs
    val skip = Set("e2e_log_pipeline", "e2e_log_pipeline_hive", "d6_dedup_clusters")
    for (q <- SparkEntry.queries.keys.toSeq.sorted if !skip(q)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("grouped top-k uses the bounded aggregate, not a window sort") {
    val p = plan("g6_topk_per_group")
    assert(!p.contains("Window"), s"g6 fell back to a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"g6 lost its typed bounded aggregate:\n$p")
  }

  test("star joins broadcast their dimensions") {
    for (q <- Seq("q5_local_volume", "q8_market_share", "q9_product_profit"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast dims")
  }

  test("predicates and projections push into the parquet scan") {
    val p6 = plan("q6_forecast_revenue")
    assert(p6.contains("GreaterThanOrEqual(l_shipdate"), "q6 date bound not pushed")
    assert(p6.contains("LessThan(l_quantity"), "q6 quantity bound not pushed")
    assert(!p6.contains("l_returnflag"), "q6 reads columns the query never touches")
    val s6 = plan("s6_scan_filter_project")
    assert(s6.contains("PushedFilters: [") && s6.contains("EqualTo(event_type,error)"),
      "s6 selector predicate not pushed")
  }

  test("repeated runs of the persist()-backed queries do not grow the cache") {
    // q11/q15/t13 persist a shared aggregate at plan-build time; the
    // terminal action runs in the CALLER, so the builder cannot unpersist.
    // The contract instead: CacheManager dedupes by canonicalized plan, so
    // a long-lived session calling these repeatedly pins ONE entry per
    // query, not one per call (SURVEY §7.12). This gate fails if a rewrite
    // breaks canonicalization (e.g. a non-deterministic expression in the
    // cached subtree) and turns repeat calls into a cache leak.
    spark.sharedState.cacheManager.clearCache()
    val qs = Seq("q11_important_parts", "q15_top_supplier", "t13_tfidf")
    def runAll(): Unit = qs.foreach(q => SparkEntry.queries(q)(spark, sf).collect())
    runAll()
    val after1 = spark.sparkContext.getPersistentRDDs.size
    runAll(); runAll()
    val after3 = spark.sparkContext.getPersistentRDDs.size
    assert(after3 == after1,
      s"cache grew across repeated runs: $after1 entries after 1 run, $after3 after 3")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q11 reads lineitem only through the shared per-part cache") {
    // the per-part aggregate feeds both the threshold scalar and the main
    // filter; without the persist Spark inlines it and scans lineitem twice
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val lp = SparkEntry.queries("q11_important_parts")(spark, sf)
      .queryExecution.optimizedPlan
    val direct = lp.collect {
      case r: LogicalRelation if r.relation.toString.contains("lineitem") => r }
    val cached = lp.collect { case i: InMemoryRelation => i }
    assert(direct.isEmpty, s"q11 scans lineitem outside the cache:\n$lp")
    assert(cached.size == 2, s"q11 lost a shared cache consumer:\n$lp")
  }

  test("q17 scans lineitem exactly once, brand-filtered before the average") {
    val p = plan("q17_small_quantity")
    val scans = p.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(scans == 1, s"q17 scans lineitem $scans times:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q17 lost its broadcast part dim:\n$p")
    assert(p.contains("Window"), s"q17 lost its windowed per-part average:\n$p")
  }

  test("t13 reads the corpus once and never force-broadcasts the vocabulary") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val lp = SparkEntry.queries("t13_tfidf")(spark, sf)
      .queryExecution.optimizedPlan
    val direct = lp.collect {
      case r: LogicalRelation if r.relation.toString.contains("documents") => r }
    assert(direct.isEmpty, s"t13 re-scans the corpus outside the tf cache:\n$lp")
    assert(lp.collect { case i: InMemoryRelation => i }.size == 2,
      s"t13 lost a tf cache consumer:\n$lp")
    // df grows with the corpus: the scoring join must carry NO static
    // broadcast hint (AQE may still broadcast at runtime when small)
    val hinted = lp.collect { case j: Join if j.hint != JoinHint.NONE => j }
    assert(hinted.isEmpty, s"t13 forces a broadcast:\n${hinted.mkString("\n")}")
  }

  test("t4 fingerprint dup-gate joins on the text hash, not the raw text") {
    // raw `text` as an equi-join key would move full document bodies through
    // hash partitioning and key comparison — the key must be xxhash64(text)
    val t4 = SparkEntry.queries("t4_text_fingerprint")(spark, sf)
      .queryExecution.executedPlan.toString()
    val joinKeyLines = t4.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin")).toSeq
    assert(joinKeyLines.nonEmpty, s"t4 lost its equi-join:\n$t4")
    assert(joinKeyLines.forall(l => !l.contains("[text")
        && !l.contains(" text#") && !l.contains("(text#")),
      s"t4 joins on raw text:\n${joinKeyLines.mkString("\n")}")
  }
}
