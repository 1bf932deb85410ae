package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY §2 or the at-scale
  * extension surface (BASELINE.json north star). Entries present in
  * [[oracleSql]] are hash-checked against DuckDB on the same parquet tables;
  * the rest (custom hashes / LSH / stub codec — not SQL-expressible) get the
  * rows-only gate plus ScalaTest coverage.
  *
  * Numeric parity rules used throughout (so hashes actually match):
  *  - money doubles → decimal(18,2) BEFORE arithmetic, exact aggregation,
  *    one cast to double at the end;
  *  - ratio doubles are single IEEE divisions of exact integers;
  *  - nanosecond timestamps stay in Long (`epoch_ns(ts)` on the DuckDB side);
  *  - every query ends in a deterministic ORDER BY with a unique tie-break.
  */
object SparkEntry {

  /** Flagship: the full log pipeline (CRI files → ingest → positional store →
    * selector query) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineE2E.run(GraftSession.configure(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2) over the log-shaped `events` table —
    "s6_scan_filter_project" -> (LogParityQueries.scanFilterProject(_, _)),
    "p1_selector_conjunction" -> (LogParityQueries.selectorConjunction(_, _)),
    "p2_since_time_filter" -> (LogParityQueries.sinceFilter(_, _)),
    "p3_output_columns" -> (LogParityQueries.outputColumns(_, _)),
    "o1_order_by_time" -> (LogParityQueries.orderByTime(_, _)),
    "o2_top1_latest" -> (LogParityQueries.top1Latest(_, _)),
    "a1_count_matching" -> (LogParityQueries.countMatching(_, _)),
    "a2_distinct_types" -> (LogParityQueries.distinctTypes(_, _)),
    "u1_union_all" -> (LogParityQueries.unionAll(_, _)),
    "s2_cri_roundtrip" -> (LogParityQueries.criRoundtrip(_, _)),
    "x1_daily_type_counts" -> (LogParityQueries.dailyTypeCounts(_, _)),
    "x2_inter_arrival" -> (LogParityQueries.interArrival(_, _)),
    "x3_pivot_daily" -> (LogParityQueries.pivotDailyCounts(_, _)),
    "x4_json_extract" -> (LogParityQueries.jsonExtract(_, _)),
    "x5_asof_join" -> (LogParityQueries.asofJoin(_, _)),
    "x6_sessionization" -> (LogParityQueries.sessionization(_, _)),
    "e2e_log_pipeline" -> (PipelineE2E.run(_, _)),
    "e2e_log_pipeline_hive" -> (PipelineE2E.runHive(_, _)),
    // — generic relational surface (TPC-H-ish) —
    "q1_pricing_summary" -> (RelationalQueries.pricingSummary(_, _)),
    "q3_top_revenue" -> (RelationalQueries.topUnshippedOrders(_, _)),
    "q5_local_volume" -> (RelationalQueries.localSupplierVolume(_, _)),
    "j1_semi_join" -> (RelationalQueries.semiJoinBigSpenders(_, _)),
    "j2_anti_join" -> (RelationalQueries.antiJoinNeverOrdered(_, _)),
    "w1_window_top_orders" -> (RelationalQueries.windowTopOrders(_, _)),
    "g1_rollup_orders" -> (RelationalQueries.rollupOrders(_, _)),
    "g2_median_quantity" -> (RelationalQueries.medianQuantity(_, _)),
    "g3_grouping_sets" -> (RelationalQueries.groupingSets(_, _)),
    "q10_returned_revenue" -> (RelationalQueries.returnedItemRevenue(_, _)),
    "q6_forecast_revenue" -> (RelationalQueries.forecastRevenue(_, _)),
    "q13_order_distribution" -> (RelationalQueries.orderCountDistribution(_, _)),
    "q4_order_priority" -> (RelationalQueries.orderPriorityCheck(_, _)),
    "q7_nation_volume" -> (RelationalQueries.nationVolume(_, _)),
    "q8_market_share" -> (RelationalQueries.marketShare(_, _)),
    "q14_promo_revenue" -> (RelationalQueries.promoRevenue(_, _)),
    "q15_top_supplier" -> (RelationalQueries.topSupplier(_, _)),
    "q18_large_orders" -> (RelationalQueries.largeOrders(_, _)),
    "q19_disjunctive_predicates" -> (RelationalQueries.disjunctivePredicates(_, _)),
    "q22_sales_opportunity" -> (RelationalQueries.globalSalesOpportunity(_, _)),
    "g4_cube" -> (RelationalQueries.cubeOrders(_, _)),
    "q2_min_balance_supplier" -> (RelationalQueries.minBalanceSupplier(_, _)),
    "q9_product_profit" -> (RelationalQueries.productProfit(_, _)),
    "q11_important_parts" -> (RelationalQueries.importantParts(_, _)),
    "q12_priority_lines" -> (RelationalQueries.priorityLines(_, _)),
    "q16_supplier_cnt" -> (RelationalQueries.supplierCountByPart(_, _)),
    "q17_small_quantity" -> (RelationalQueries.smallQuantityRevenue(_, _)),
    "q20_potential_promotion" -> (RelationalQueries.potentialPromotion(_, _)),
    "q21_waiting_suppliers" -> (RelationalQueries.waitingSuppliers(_, _)),
    "a3_distinct_suppliers" -> (RelationalQueries.distinctSuppliersPerBrand(_, _)),
    "u2_intersect" -> (LogParityQueries.intersectUsers(_, _)),
    "u3_except" -> (LogParityQueries.exceptUsers(_, _)),
    "x7_running_total" -> (LogParityQueries.runningTotal(_, _)),
    "j3_correlated_subquery" -> (RelationalQueries.correlatedSubquery(_, _)),
    // — training-data pipeline extensions —
    "d1_dedup_exact" -> (ExtensionQueries.dedupExact(_, _)),
    "d2_dedup_ngram_jaccard" -> (ExtensionQueries.dedupNgramJaccard(_, _)),
    "d3_dedup_minhash_lsh" -> (ExtensionQueries.dedupMinhashLsh(_, _)),
    "d4_dedup_simhash" -> (ExtensionQueries.dedupSimhash(_, _)),
    "d5_dedup_embedding" -> (ExtensionQueries.dedupEmbedding(_, _)),
    "d6_dedup_clusters" -> (ExtensionQueries.dedupClusters(_, _)),
    "t1_text_tokens" -> (ExtensionQueries.textTokens(_, _)),
    "t2_text_quality" -> (ExtensionQueries.textQuality(_, _)),
    "t3_text_langid" -> (ExtensionQueries.textLangId(_, _)),
    "t4_text_fingerprint" -> (ExtensionQueries.textFingerprint(_, _)),
    "t5_text_top_tokens" -> (ExtensionQueries.textTopTokens(_, _)),
    "v1_knn_brute_force" -> (ExtensionQueries.knnBruteForce(_, _)),
    "v2_knn_lsh" -> (ExtensionQueries.knnLsh(_, _)),
    "v3_knn_ivf" -> (ExtensionQueries.knnIvf(_, _)),
    "v4_knn_ivf_index" -> (ExtensionQueries.knnIvfIndex(_, _)),
    "v8_knn_pq" -> (ExtensionQueries.knnPq(_, _)),
    "v9_knn_ivfpq" -> (ExtensionQueries.knnIvfPq(_, _)),
    "m1_multimodal_decode" -> (ExtensionQueries.multimodalDecode(_, _)),
    "m2_multimodal_frames" -> (ExtensionQueries.multimodalFrames(_, _)),
    "a4_approx_distinct" -> (ExtensionQueries.approxDistinctUsers(_, _)),
    "a5_approx_quantiles" -> (ExtensionQueries.approxQuantiles(_, _)),
    "z1_hash_sample" -> (ExtensionQueries.hashSample(_, _)),
    "z2_train_val_split" -> (ExtensionQueries.trainValSplit(_, _)),
    "z3_stratified_sample" -> (ExtensionQueries.stratifiedSample(_, _)),
    "z4_pack_bins" -> (ExtensionQueries.packBins(_, _)),
    "t6_repetition_filter" -> (ExtensionQueries.repetitionFilter(_, _)),
    "t7_oov_rate" -> (ExtensionQueries.oovRate(_, _)),
    "d7_decontamination" -> (ExtensionQueries.decontamination(_, _)),
    "d8_dedup_keep_canonical" -> (ExtensionQueries.dedupKeepCanonical(_, _)),
    "t8_pii_redaction" -> (ExtensionQueries.piiRedaction(_, _)),
    "t9_token_rarity" -> (ExtensionQueries.tokenRarity(_, _)),
    "t13_tfidf" -> (ExtensionQueries.tfidfScores(_, _)),
    "t14_quality_rules" -> (ExtensionQueries.qualityRules(_, _)),
    "t15_substring_dedup" -> (ExtensionQueries.substringDedup(_, _)),
    // oracle projection: ppl is spec-gated (transcendental), Catalyst prunes it
    "t10_lm_bigram" -> ((s, dir) => ExtensionQueries.lmBigramScore(s, dir)
      .select("doc_id", "n_bigrams", "sum_bigram_freq", "sum_ctx_freq", "typicality")
      .orderBy("doc_id")),
    "z5_chunk_documents" -> (ExtensionQueries.chunkDocuments(_, _)),
    "z8_mixture_sample" -> (ExtensionQueries.mixtureSample(_, _)),
    "z6_export_shards" -> (ExtensionQueries.exportShardManifest(_, _)),
    "x8_range_join" -> (ExtensionQueries.rangeJoinRecent(_, _)),
    "v5_kmeans" -> (ExtensionQueries.kmeansClusterGates(_, _)),
    "g5_heavy_hitters" -> (ExtensionQueries.heavyHitterGates(_, _)),
    "x9_scd_intervals" -> (ExtensionQueries.scdIntervals(_, _)),
    "z7_curriculum_sample" -> (ExtensionQueries.curriculumSample(_, _)),
    "d9_cross_source_dups" -> (ExtensionQueries.crossSourceDupMatrix(_, _)),
    "x10_funnel" -> (ExtensionQueries.funnelConversion(_, _)),
    "x11_snapshot_cdc" -> (StoreCdcQuery.run(_, _)),
    "x12_schema_evolution" -> (StoreEvolutionQuery.run(_, _)),
    "x13_stream_store" -> (StoreStreamQuery.run(_, _)),
    "x14_since_pruned" -> (StorePrunedQuery.run(_, _)),
    "x15_row_delete" -> (StoreDeleteQuery.run(_, _)),
    "x16_merge_upsert" -> (StoreMergeQuery.run(_, _)),
    "x19_graft_source" -> (StoreSourceQuery.run(_, _)),
    "x20_stream_tail" -> (StoreTailQuery.run(_, _)),
    "x21_maintain" -> (StoreMaintainQuery.run(_, _)),
    "x22_stream_sink" -> (StoreSinkQuery.run(_, _)),
    "x17_incremental_matview" -> (StoreMatViewQuery.run(_, _)),
    "d10_stream_dedup" -> (StreamDedupQuery.run(_, _)),
    "d11_stream_neardup" -> (StreamNearDupQuery.run(_, _)),
    "x18_metadata_tables" -> (StoreMetaQuery.run(_, _)),
    "x23_metadata_agg" -> (StoreMetaAggQuery.run(_, _)),
    "x24_column_pruned" -> (StoreColPrunedQuery.run(_, _)),
    "x25_data_minmax" -> (StoreDataMinMaxQuery.run(_, _)),
    "x26_dv_meta_count" -> (StoreDvMetaQuery.run(_, _)),
    "x27_bucketed_joins" -> (BucketedJoinQuery.run(_, _)),
    "x28_plan_routing" -> (StoreRoutedQuery.run(_, _)),
    "v6_random_projection" -> (ExtensionQueries.randomProjectionGates(_, _)),
    "t11_bpe_vocab" -> (ExtensionQueries.bpeVocabGates(_, _)),
    "v7_quantize_int8" -> (ExtensionQueries.quantizationGates(_, _)),
    "g6_topk_per_group" -> (ExtensionQueries.topKPerGroup(_, _)),
    "t12_bpe_encode" -> (ExtensionQueries.bpeEncodeGates(_, _)),
    "m3_multimodal_resize" -> (ExtensionQueries.multimodalResize(_, _))
  )

  /** Exact 3-gram Jaccard pair list (threshold 0.8) recomputed from the raw
    * text — the d2 oracle body, shared by the d3/d4 gate oracles, which only
    * need its COUNT.
    */
  private val exactJaccardPairsBody: String =
    """WITH ws AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                for i in range(1, len(w) - 1)]) AS gs
      |  FROM ws WHERE len(w) >= 3),
      |g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
      |sizes AS (SELECT doc_id, len(gs) AS sz FROM grams),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.8""".stripMargin

  /** DuckDB-runnable oracle per hash-checkable query (same column names, same
    * ORDER BY — the driver sorts columns by name and hashes values).
    */
  def oracleSql: Map[String, String] = Map(
    "s6_scan_filter_project" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type = 'error' AND value > 100 ORDER BY event_id""".stripMargin,
    "p1_selector_conjunction" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id = 13 AND event_type = 'view' ORDER BY event_id""".stripMargin,
    "p2_since_time_filter" ->
      """SELECT event_id, epoch_us(ts) AS time_us FROM events
        |WHERE epoch_us(ts) >= 1706140800000000 ORDER BY event_id""".stripMargin,
    "p3_output_columns" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' ||
        |    lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z' AS time_iso,
        |  event_type, substr(props, 1, 8) AS msg_left
        |FROM events ORDER BY event_id""".stripMargin,
    "o1_order_by_time" ->
      """SELECT event_id, epoch_us(ts) AS time_us, event_type FROM events
        |ORDER BY time_us, event_id""".stripMargin,
    "o2_top1_latest" ->
      """SELECT event_id, epoch_us(ts) AS time_us FROM events
        |ORDER BY time_us DESC, event_id LIMIT 1""".stripMargin,
    "a1_count_matching" ->
      """SELECT count(*) AS n FROM events WHERE props LIKE '%"k": 7%'""",
    "a2_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "u1_union_all" ->
      """SELECT * FROM (
        |  SELECT event_id, epoch_us(ts) AS time_us, event_type FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, epoch_us(ts) AS time_us, event_type FROM events WHERE event_type = 'error'
        |) ORDER BY time_us, event_id""".stripMargin,
    "s2_cri_roundtrip" ->
      """SELECT epoch_us(ts) AS time_us,
        |  CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
        |  'F' AS logtag, props AS message
        |FROM events ORDER BY time_us, message""".stripMargin,
    "x1_daily_type_counts" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "x2_inter_arrival" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,
    "x3_pivot_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "x4_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "x5_asof_join" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'error'),
        |     r AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS time_us,
        |       r.event_id AS click_id, epoch_us(r.ts) AS click_time_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "e2e_log_pipeline" ->
      """SELECT epoch_us(ts) AS time_us,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' ||
        |    lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z' AS time_iso,
        |  'dev' AS cluster, 'ns0' AS namespace, 'node-a' AS node,
        |  'pod-' || CAST(user_id % 5 AS VARCHAR) AS pod, 'app' AS container,
        |  CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
        |  'F' AS logtag, props AS message
        |FROM events WHERE user_id % 3 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id % 5 ORDER BY ts, event_id) <= 100000
        |ORDER BY time_us, message""".stripMargin,
    "e2e_log_pipeline_hive" ->
      """SELECT epoch_us(ts) AS time_us,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' ||
        |    lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z' AS time_iso,
        |  'dev' AS cluster, 'ns0' AS namespace, 'node-a' AS node,
        |  'pod-' || CAST(user_id % 5 AS VARCHAR) AS pod, 'app' AS container,
        |  CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
        |  'F' AS logtag, props AS message
        |FROM events WHERE user_id % 3 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id % 5 ORDER BY ts, event_id) <= 100000
        |ORDER BY time_us, message""".stripMargin,
    // x14: the `--since` cutoff is pinned at the newest event; DuckDB
    // restates the surviving window straight from events — over- or
    // under-pruning by the FileStats sidecar flips the hash
    "x14_since_pruned" ->
      """SELECT epoch_us(ts) AS time_us, props AS message
        |FROM events
        |WHERE epoch_ns(ts) >= (SELECT max(epoch_ns(ts)) FROM events)
        |  - 604800000000000
        |ORDER BY time_us, message""".stripMargin,
    // x19: the format("graft") connector gate — ingest + append + replay +
    // time travel run engine-side (require()s); DuckDB restates the final
    // --since 7d aggregate straight from events, so a file wrongly skipped
    // by the connector's stats tier flips the hash
    "x19_graft_source" ->
      """SELECT 'pod-' || CAST(user_id % 4 AS VARCHAR) AS pod,
        |  count(*) AS n,
        |  CAST(SUM(length(props)) AS BIGINT) AS msg_chars
        |FROM events
        |WHERE epoch_ns(ts) >= (SELECT max(epoch_ns(ts)) FROM events)
        |  - 604800000000000
        |GROUP BY 1 ORDER BY pod""".stripMargin,
    // x20: the streaming graft SOURCE — bootstrap snapshot + a commit
    // tailed mid-stream must land every event exactly once in the sink;
    // DuckDB restates the per-pod totals from events (same aggregate shape
    // as x19, but the rows travel through readStream micro-batches)
    "x20_stream_tail" ->
      """SELECT 'pod-' || CAST(user_id % 4 AS VARCHAR) AS pod,
        |  count(*) AS n,
        |  CAST(SUM(length(props)) AS BIGINT) AS msg_chars
        |FROM events
        |GROUP BY 1 ORDER BY pod""".stripMargin,
    // x22: the streaming graft SINK — the store-to-store bus (bootstrap
    // tail of the source store committed micro-batch-atomically into a
    // second store, with a mid-stream source commit and an idle checkpoint
    // restart that must commit nothing); DuckDB restates the per-pod
    // totals from events, so any drop/double on the bus flips the hash
    "x22_stream_sink" ->
      """SELECT 'pod-' || CAST(user_id % 4 AS VARCHAR) AS pod,
        |  count(*) AS n,
        |  CAST(SUM(length(props)) AS BIGINT) AS msg_chars
        |FROM events
        |GROUP BY 1 ORDER BY pod""".stripMargin,
    // x21: debt-gated maintenance — a small-file storm plus pending
    // deletion vectors must come out of ONE maintenance pass compacted and
    // materialized (engine-gated, layout inferred), with the idempotent
    // second pass flipping nothing; DuckDB restates the surviving per-pod
    // totals, so maintenance losing or resurrecting a row flips the hash
    "x21_maintain" ->
      """SELECT 'pod-' || CAST(user_id % 4 AS VARCHAR) AS pod,
        |  count(*) AS n,
        |  CAST(SUM(length(props)) AS BIGINT) AS msg_chars
        |FROM events
        |WHERE NOT (strftime(ts, '%Y-%m-%d') =
        |    (SELECT min(strftime(ts, '%Y-%m-%d')) FROM events)
        |  AND (epoch_us(ts) % 97) < 13)
        |GROUP BY 1 ORDER BY pod""".stripMargin,
    // x13: the streaming store sink ingests the SAME fixture through
    // per-micro-batch atomic commits, then the store is compacted LIVE —
    // the expected rows are identical to the batch hive pipeline's
    "x13_stream_store" ->
      """SELECT epoch_us(ts) AS time_us,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' ||
        |    lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z' AS time_iso,
        |  'dev' AS cluster, 'ns0' AS namespace, 'node-a' AS node,
        |  'pod-' || CAST(user_id % 5 AS VARCHAR) AS pod, 'app' AS container,
        |  CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
        |  'F' AS logtag, props AS message
        |FROM events WHERE user_id % 3 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id % 5 ORDER BY ts, event_id) <= 100000
        |ORDER BY time_us, message""".stripMargin,
    // long-cents restatement: per-row money is rounded ONCE to integer
    // cents, sums are exact integers (DuckDB BIGINT sums are HUGEINT), and
    // the double conversion + division happen in the same order as Spark
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "j1_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "j2_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_shipdate < TIMESTAMP '1996-01-01')
        |ORDER BY p_partkey""".stripMargin,
    "w1_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    "g1_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "g2_median_quantity" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "x6_sessionization" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin,
    "t5_text_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS token
        |  FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 30""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |               CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "g3_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  strftime(l_shipdate, '%Y') AS l_year,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT strftime(o_orderdate, '%Y') AS o_year,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year, nation_volume, total_volume,
        |  nation_volume / total_volume AS mkt_share
        |FROM (
        |  SELECT o_year,
        |    CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE) / 10000.0 AS nation_volume,
        |    CAST(SUM(volume) AS DOUBLE) / 10000.0 AS total_volume
        |  FROM v GROUP BY 1)
        |ORDER BY o_year""".stripMargin,
    "q14_promo_revenue" ->
      """WITH s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))
        |      ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
        |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT promo_revenue, total_revenue,
        |  100.0 * promo_revenue / total_revenue AS promo_share
        |FROM s""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS sum_qty_c
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) > 30000)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
        |  CAST(sum_qty_c AS DOUBLE) / 100.0 AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_disjunctive_predicates" ->
      """SELECT CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |               (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "g4_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q2_min_balance_supplier" ->
      """WITH pairs AS (
        |  SELECT DISTINCT p_type, l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |wb AS (
        |  SELECT p_type, l_suppkey AS sk, CAST(s_acctbal AS DECIMAL(18,2)) AS bal_d
        |  FROM pairs JOIN supplier ON l_suppkey = s_suppkey),
        |m AS (SELECT p_type, MIN(bal_d) AS min_bal_d FROM wb GROUP BY 1),
        |pick AS (
        |  SELECT wb.p_type, MIN(wb.sk) AS s_suppkey, m.min_bal_d
        |  FROM wb JOIN m ON wb.p_type = m.p_type AND wb.bal_d = m.min_bal_d
        |  GROUP BY wb.p_type, m.min_bal_d)
        |SELECT pick.p_type, pick.s_suppkey, s_name,
        |  CAST(min_bal_d AS DOUBLE) AS min_bal
        |FROM pick JOIN supplier ON pick.s_suppkey = supplier.s_suppkey
        |ORDER BY p_type""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
        |  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey, SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS value_c
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
        |FROM v
        |WHERE CAST(value_c AS DOUBLE) >
        |      (SELECT 1.2 * CAST(SUM(value_c) AS DOUBLE) / COUNT(*) FROM v)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#11'
        |  AND p_size IN (1, 5, 9, 14, 20, 27, 33, 40)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_quantity" ->
      """WITH pa AS (
        |  SELECT l_partkey AS avg_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#12'
        |JOIN pa ON l_partkey = avg_partkey
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q20_potential_promotion" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "a3_distinct_suppliers" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "u2_intersect" ->
      """SELECT user_id, day FROM (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'purchase')
        |ORDER BY user_id, day""".stripMargin,
    "u3_except" ->
      """SELECT user_id, day FROM (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'view'
        |  EXCEPT
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events WHERE event_type = 'error')
        |ORDER BY user_id, day""".stripMargin,
    "x7_running_total" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM events ORDER BY event_id""".stripMargin,
    "j3_correlated_subquery" ->
      """SELECT o_orderkey FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT props, min(event_id) AS keep_id, count(*) AS n_copies
        |FROM events GROUP BY props ORDER BY props""".stripMargin,
    "d2_dedup_ngram_jaccard" ->
      (exactJaccardPairsBody + "\nORDER BY id_a, id_b"),
    // d3/d4/d5 gate oracles: the checkable number is recomputed from raw
    // data; the booleans are the engine's own verified claims (subset /
    // overlap / recall), which hash-fail the row if any regresses
    "d3_dedup_minhash_lsh" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS subset_ok, " +
        "TRUE AS recall_ok FROM (" + exactJaccardPairsBody + ")"),
    "d4_dedup_simhash" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS nonempty_ok, " +
        "TRUE AS overlap_ok FROM (" + exactJaccardPairsBody + ")"),
    "d5_dedup_embedding" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs_subset,
        |  TRUE AS precision_ok, TRUE AS recall_ok
        |FROM s a JOIN s b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""".stripMargin,
    "t4_text_fingerprint" ->
      """SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents a
        |     JOIN documents b ON a.doc_id < b.doc_id AND a.text = b.text)
        |    AS n_dup_text_pairs,
        |  TRUE AS fp_agree_ok""".stripMargin,
    "a4_approx_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
        |  CAST(count(*) AS BIGINT) AS n_events, TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "a5_approx_quantiles" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "m1_multimodal_decode" ->
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |  ELSE 'video' END AS kind,
        |  CAST(count(*) AS BIGINT) AS n, TRUE AS decode_ok
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    "m2_multimodal_frames" ->
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |  ELSE 'video' END AS kind,
        |  CAST(count(*) AS BIGINT) AS n_media, TRUE AS frames_ok
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    "z1_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((abs(doc_id) % 65536) * 40503) % 65536 < 6554
        |ORDER BY doc_id""".stripMargin,
    "z2_train_val_split" ->
      """SELECT CASE WHEN ((abs(doc_id) % 65536) * 40503) % 65536 < 6554
        |            THEN 'val' ELSE 'train' END AS split,
        |  lang, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "z3_stratified_sample" ->
      """SELECT source, count(*) AS n_docs FROM documents
        |WHERE ((abs(doc_id) % 65536) * 40503) % 65536 <
        |      CASE source WHEN 'src0' THEN 13107 WHEN 'src1' THEN 32768 ELSE 65536 END
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "z4_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT source, cum_before // 2000 AS bin_id, count(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, bin_id""".stripMargin,
    "z8_mixture_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens_total FROM t GROUP BY 1),
        |f AS (
        |  SELECT source, tokens_total,
        |    CAST(floor(least(1.0,
        |      (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.2 ELSE 0.02 END * 8000.0)
        |        / tokens_total) * 65536.0) AS BIGINT) AS mix_threshold
        |  FROM s)
        |SELECT t.source, f.mix_threshold, count(*) AS n_docs_kept,
        |  CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_kept, f.tokens_total
        |FROM t JOIN f ON t.source = f.source
        |WHERE ((abs(t.doc_id) % 65536) * 40503) % 65536 < f.mix_threshold
        |GROUP BY 1, 2, 5 ORDER BY t.source""".stripMargin,
    "t6_repetition_filter" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |b AS (SELECT doc_id, [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bi FROM t)
        |SELECT doc_id, CAST(len(bi) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bi)) AS BIGINT) AS n_distinct,
        |  CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / len(bi) AS dup_frac
        |FROM b WHERE len(bi) > 0 ORDER BY doc_id""".stripMargin,
    "t7_oov_rate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS tok
        |  FROM documents),
        |v AS (SELECT tok FROM t GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 50),
        |m AS (
        |  SELECT doc_id, CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END AS iv
        |  FROM t LEFT JOIN v ON t.tok = v.tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(SUM(iv) AS BIGINT) AS n_in_vocab,
        |  CAST(count(*) - SUM(iv) AS DOUBLE) / count(*) AS oov_rate
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d7_decontamination" ->
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                for i in range(1, len(w) - 1)]) AS gs
        |  FROM ws WHERE len(w) >= 3),
        |g AS (SELECT doc_id, unnest(gs) AS gram FROM grams)
        |SELECT DISTINCT c.doc_id FROM g c
        |WHERE c.doc_id >= 20
        |  AND EXISTS (SELECT 1 FROM g b WHERE b.doc_id < 20 AND b.gram = c.gram)
        |ORDER BY doc_id""".stripMargin,
    "x8_range_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS time_us, event_type FROM events)
        |SELECT l.event_id,
        |  (SELECT COUNT(*) FROM e r
        |   WHERE r.time_us > l.time_us - 60000000 AND r.time_us <= l.time_us) AS n_in_window
        |FROM e l WHERE l.event_type = 'error' ORDER BY event_id""".stripMargin,
    "d6_dedup_clusters" ->
      """WITH RECURSIVE ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                for i in range(1, len(w) - 1)]) AS gs
        |  FROM ws WHERE len(w) >= 3),
        |g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
        |sizes AS (SELECT doc_id, len(gs) AS sz FROM grams),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id AS doc_id, least(id, MIN(r)) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "d8_dedup_keep_canonical" ->
      """WITH RECURSIVE ws AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                for i in range(1, len(w) - 1)]) AS gs
        |  FROM ws WHERE len(w) >= 3),
        |g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
        |sizes AS (SELECT doc_id, len(gs) AS sz FROM grams),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |clusters AS (
        |  SELECT id AS doc_id, least(id, MIN(r)) AS cluster_id FROM reach GROUP BY id),
        |tok AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM ws)
        |SELECT t.doc_id, t.n_tokens FROM tok t
        |LEFT JOIN clusters c ON t.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL
        |UNION ALL
        |SELECT doc_id, n_tokens FROM (
        |  SELECT t.doc_id, t.n_tokens,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |      ORDER BY t.n_tokens DESC, t.doc_id) AS rk
        |  FROM tok t JOIN clusters c ON t.doc_id = c.doc_id) m
        |WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,
    "t8_pii_redaction" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.' || CAST(doc_id % 100 AS VARCHAR)
        |      || ' tel +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\d{1,3}(\.\d{1,3}){3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '\+\d[\d-]{6,}\d')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{1,3}(\.\d{1,3}){3}', '<IP>', 'g'),
        |    '\+\d[\d-]{6,}\d', '<PHONE>', 'g') AS redacted
        |FROM a ORDER BY doc_id""".stripMargin,
    "t14_quality_rules" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS BIGINT) AS n_stop,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[#…]'))) AS BIGINT) AS n_sym
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  n_tokens BETWEEN 25 AND 100 AS r_len,
        |  (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens) AS r_word_len,
        |  n_alpha * 5 >= n_tokens * 4 AS r_alpha,
        |  n_stop >= 2 AS r_stopwords,
        |  n_sym * 10 <= n_tokens AS r_symbol,
        |  (n_tokens BETWEEN 25 AND 100
        |    AND sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens
        |    AND n_alpha * 5 >= n_tokens * 4
        |    AND n_stop >= 2
        |    AND n_sym * 10 <= n_tokens) AS keep_doc
        |FROM m ORDER BY doc_id""".stripMargin,
    // t15: repeated-substring spans — any 8-token window shared by >= 2
    // distinct documents marks its span; overlapping-or-adjacent windows
    // (start gap <= 8) merge into maximal spans (gaps-and-islands); DuckDB
    // recomputes windows/dup grams/coverage from the raw text, so a hash
    // collision, an off-by-one in the window walk, or a bad merge all flip
    // the hash
    "t15_substring_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS t
        |  FROM documents),
        |w AS (SELECT doc_id, unnest(range(1, len(t)-8+2)) AS pos, t
        |      FROM d WHERE len(t) >= 8),
        |g AS (SELECT doc_id, pos, array_to_string(t[pos:pos+7], ' ') AS gram FROM w),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |h AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |          THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |j AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM i),
        |s AS (SELECT doc_id, grp, min(pos) AS s, max(pos)+7 AS e FROM j GROUP BY 1, 2),
        |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |         CAST(sum(e-s+1) AS BIGINT) AS dup_tokens FROM s GROUP BY 1),
        |dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows FROM h GROUP BY 1),
        |nb AS (SELECT doc_id, CAST(greatest(len(t)-7, 0) AS BIGINT) AS n_windows FROM d)
        |SELECT nb.doc_id, nb.n_windows,
        |  COALESCE(dw.n_dup_windows, 0) AS n_dup_windows,
        |  COALESCE(ds.n_spans, 0) AS n_spans,
        |  COALESCE(ds.dup_tokens, 0) AS dup_tokens
        |FROM nb LEFT JOIN dw USING (doc_id) LEFT JOIN ds USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t13_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM t),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM t GROUP BY 1),
        |w AS (SELECT tf.doc_id, tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0) AS w
        |      FROM tf JOIN dfq USING (tok) CROSS JOIN n),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, sum(w) AS wsum
        |      FROM w GROUP BY 1)
        |SELECT a.doc_id, a.n_terms, a.wsum / dl.n_tok AS tfidf
        |FROM a JOIN dl USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    "t9_token_rarity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS tok
        |  FROM documents),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY tok)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(freq) AS BIGINT) AS sum_freq,
        |  CAST(CAST(sum(freq) AS BIGINT) AS DOUBLE) / count(*) AS mean_freq
        |FROM t JOIN f ON t.tok = f.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "t10_lm_bigram" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |ix AS (SELECT doc_id, w, UNNEST(range(1, len(w))) AS i FROM t WHERE len(w) >= 2),
        |p AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM ix),
        |f12 AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
        |f1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
        |j AS (SELECT p.doc_id, f12.c12, f1.c1
        |      FROM p JOIN f12 USING (w1, w2) JOIN f1 USING (w1))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(c12) AS BIGINT) AS sum_bigram_freq,
        |  CAST(sum(c1) AS BIGINT) AS sum_ctx_freq,
        |  CAST(CAST(sum(c12) AS BIGINT) AS DOUBLE) / CAST(sum(c1) AS BIGINT) AS typicality
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "z6_export_shards" ->
      """SELECT ((abs(doc_id) % 65536) * 40503) % 65536 % 8 AS shard_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS BIGINT)) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY shard_id""".stripMargin,
    "z5_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens FROM t WHERE len(w) > 0),
        |s AS (SELECT doc_id, w, n_tokens, unnest(range(0, n_tokens, 12)) AS start_tok FROM n)
        |SELECT doc_id,
        |  CAST(start_tok // 12 AS BIGINT) AS chunk_id,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(least(16, n_tokens - start_tok) AS BIGINT) AS chunk_len,
        |  array_to_string(list_slice(w, start_tok + 1, start_tok + least(16, n_tokens - start_tok)), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "t1_text_tokens" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(w, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
        |FROM t ORDER BY doc_id""".stripMargin,
    "t2_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for','el','la','de','que','y','en','un','por','con','los','le','et','les','des','du','der','die','und','das','von','zu','mit','den','ein','ist','的','了','是','在','我','有','他','这','中','不'], x))) AS DOUBLE) / len(w) AS stopword_ratio,
        |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len
        |FROM t ORDER BY doc_id""".stripMargin,
    "t3_text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(w, x -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], x))) AS BIGINT) AS hits_de,
        |    CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','por','con','los'], x))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(w, x -> list_contains(['le','la','de','et','les','des','en','un','du','que'], x))) AS BIGINT) AS hits_fr,
        |    CAST(len(list_filter(w, x -> list_contains(['的','了','是','在','我','有','他','这','中','不'], x))) AS BIGINT) AS hits_zh
        |  FROM t)
        |SELECT doc_id, hits_de, hits_en, hits_es, hits_fr, hits_zh,
        |  CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) = 0 THEN 'und'
        |       WHEN hits_zh = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'zh'
        |       WHEN hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'fr'
        |       WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'es'
        |       WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'en'
        |       ELSE 'de' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin,
    "v1_knn_brute_force" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qv, e.embedding) AS cos
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // v2/v3/v4 emit a per-query recall gate vs the exact baseline (10
    // neighbors returned, recall@10 ≥ 0.9); on a healthy ANN path both
    // columns are the constants below, so the hash gate verifies ANN result
    // quality — a recall regression flips recall_ok and the row goes red.
    "v2_knn_lsh" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_neighbors,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "v3_knn_ivf" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_neighbors,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "v4_knn_ivf_index" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_neighbors,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    // v8: product-quantized ANN — 8-byte codes (32× compression at dim 64),
    // ADC shortlist + exact rerank; recall@10 ≥ 0.7 per query restated as
    // the same constant-gate shape as the other ANN rows
    "v8_knn_pq" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_neighbors,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    // v9: persisted IVF-PQ — cell partition pruning + 32×-compressed ADC
    // scan (the raw float column never enters it) + exact rerank
    "v9_knn_ivfpq" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_neighbors,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    // v5: distributed spherical k-means, gated on k non-empty clusters over
    // the full corpus with a monotone + genuinely-improving Lloyd objective
    "v5_kmeans" ->
      """SELECT CAST(10 AS BIGINT) AS k_clusters,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_assigned,
        |  TRUE AS no_empty_ok, TRUE AS monotone_ok, TRUE AS improved_ok""".stripMargin,
    // g5: exact top-20 tokens with the Misra-Gries containment gate — the
    // oracle recomputes the exact counts; sketch_ok states the summary's
    // N/(capacity+1) guarantee held for every heavy token
    "g5_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS n_tok, TRUE AS sketch_ok
        |FROM toks GROUP BY token
        |ORDER BY n_tok DESC, token LIMIT 20""".stripMargin,
    "x9_scd_intervals" ->
      """SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER w AS valid_to_us,
        |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "z7_curriculum_sample" ->
      """WITH t AS (
        |  SELECT doc_id, ntile(3) OVER (ORDER BY n_chars, doc_id) AS tercile
        |  FROM documents)
        |SELECT tercile, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM t
        |WHERE ((abs(doc_id) % 65536) * 40503) % 65536 <
        |  CASE tercile WHEN 1 THEN 6554 WHEN 2 THEN 32768 ELSE 65536 END
        |GROUP BY tercile ORDER BY tercile""".stripMargin,
    "d9_cross_source_dups" ->
      """SELECT least(a.source, b.source) AS source_a,
        |  greatest(a.source, b.source) AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_dup_pairs
        |FROM documents a JOIN documents b
        |  ON a.text = b.text AND a.doc_id < b.doc_id AND a.source <> b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x10_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_click_us
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT fc.user_id, fc.first_click_us,
        |  min(p_us) AS first_purchase_us,
        |  CAST(count(*) AS BIGINT) AS n_purchases_1h,
        |  min(p_us) - fc.first_click_us AS gap_us
        |FROM fc JOIN p ON p.user_id = fc.user_id
        |  AND p_us >= first_click_us AND p_us <= first_click_us + 3600000000
        |GROUP BY fc.user_id, fc.first_click_us
        |ORDER BY fc.user_id""".stripMargin,
    // x11: the engine drives ingest → compaction (v2) → snapshot retention
    // (v3) on a real versioned store, then row-level-diffs the snapshots
    // (GraftStore.rowDiff). DuckDB restates the ground truth from events:
    // a content-preserving compaction diffs to ZERO rows, retention's diff
    // is exactly the oldest calendar date (all `removed`, none `added`),
    // and the multiset identity against the retained v2 snapshot held.
    // x12: the engine's answer comes from an actually-evolved store (old
    // files lack `quality`, new files carry it); DuckDB restates the same
    // numbers from `events` with the identical median-date split
    "x12_schema_evolution" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS d, props FROM events),
        |dd AS (SELECT DISTINCT d FROM e),
        |cut AS (SELECT d FROM dd
        |        QUALIFY row_number() OVER (ORDER BY d) =
        |          (SELECT count(*) // 2 + 1 FROM dd))
        |SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN e.d < cut.d THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
        |  CAST(sum(CASE WHEN e.d >= cut.d THEN 1 ELSE 0 END) AS BIGINT) AS n_annotated,
        |  CAST(sum(CASE WHEN e.d >= cut.d THEN length(props) ELSE 0 END) AS DOUBLE) AS sum_quality,
        |  TRUE AS zero_move_ok
        |FROM e, cut""".stripMargin,
    // x15: the engine commits two MERGE-ON-READ deletes (deletion vectors;
    // zero data movement — v2: a content predicate, v3: an overlapping time
    // predicate that exercises vector merging) on a versioned store built
    // from events, then reads the live view back. DuckDB restates every
    // count and the surviving content checksum straight from events; the
    // boolean gates (no deleted row survives, pre-commit snapshot reads
    // complete) are verified engine-side.
    "x15_row_delete" ->
      """WITH m AS (SELECT props,
        |    (length(props) % 7 = 0) AS d1,
        |    ((((epoch_us(ts) * 1000) // 1000) % 97) < 13) AS d2
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN d1 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted_content,
        |  CAST(sum(CASE WHEN d2 AND NOT d1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted_time_new,
        |  CAST(sum(CASE WHEN NOT d1 AND NOT d2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_live,
        |  CAST(sum(CASE WHEN NOT d1 AND NOT d2 THEN length(props) ELSE 0 END)
        |    AS BIGINT) AS live_msg_chars,
        |  TRUE AS live_match_zero,
        |  TRUE AS time_travel_ok
        |FROM m""".stripMargin,
    // x16: one atomic MERGE commit (delete-by-vector for matched keys +
    // append of the update batch). The batch is SQL-derivable from events,
    // so DuckDB rebuilds the post-merge table as (events ∖ matched) ∪
    // updates and restates counts + content checksum; the exact multiset
    // identity and time travel are engine-verified booleans.
    "x16_merge_upsert" ->
      """WITH upd AS (
        |  SELECT event_id, ts, user_id, event_type, value, 'UPD' AS props
        |  FROM events WHERE event_id % 11 = 0),
        |neu AS (
        |  SELECT event_id + 10000000000 AS event_id, ts, user_id, event_type,
        |    value, 'NEW' AS props
        |  FROM events WHERE event_id % 101 = 0),
        |updates AS (SELECT * FROM upd UNION ALL SELECT * FROM neu),
        |final AS (
        |  SELECT event_id, ts, user_id, event_type, value, props FROM events
        |  WHERE event_id NOT IN (SELECT event_id FROM updates)
        |  UNION ALL SELECT * FROM updates)
        |SELECT
        |  CAST((SELECT count(*) FROM events) AS BIGINT) AS n_total,
        |  CAST((SELECT count(*) FROM events
        |        WHERE event_id IN (SELECT event_id FROM updates)) AS BIGINT)
        |    AS n_matched,
        |  CAST((SELECT count(*) FROM updates) AS BIGINT) AS n_inserted,
        |  CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(sum(CASE WHEN props = 'UPD' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_upd_rows,
        |  CAST(sum(CASE WHEN props = 'NEW' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new_rows,
        |  CAST(sum(length(props)) AS BIGINT) AS live_props_chars,
        |  TRUE AS upsert_exact_ok,
        |  TRUE AS time_travel_ok
        |FROM final""".stripMargin,
    // x18: per-date row counts the ENGINE answers from its metadata tier
    // alone (manifest + stats sidecar, zero data-file reads); DuckDB
    // restates them by scanning events for real. Lifecycle booleans
    // (delete debt visible, merge-on-read stats stable, compaction drains,
    // history complete) are engine-verified.
    "x18_metadata_tables" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  TRUE AS stats_cover_all, TRUE AS delete_debt_ok,
        |  TRUE AS mor_stats_unchanged, TRUE AS debt_drained_ok,
        |  TRUE AS history_ok
        |FROM events GROUP BY 1 ORDER BY date""".stripMargin,
    // x23: partition-scoped metadata-only aggregates — the engine answers
    // "rows + time bounds per day since last week" and the freshness probe
    // max(date) from the stats sidecar + directory values (require()d to
    // plan with NO file scan); DuckDB restates every number by scanning
    // events for real, so a wrong dir kept/dropped or a drifted stats line
    // flips the hash
    "x23_metadata_agg" ->
      """WITH cut AS (
        |  SELECT strftime(make_timestamp(
        |    (max(epoch_ns(ts)) - 604800000000000) // 1000), '%Y-%m-%d') AS d
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m-%d') AS date,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(epoch_ns(ts)) // 1000 AS lo_us,
        |  max(epoch_ns(ts)) // 1000 AS hi_us,
        |  TRUE AS total_count_ok,
        |  TRUE AS freshness_probe_ok
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') >= (SELECT d FROM cut)
        |GROUP BY 1 ORDER BY date""".stripMargin,
    // d10: the survivor set of the 3-batch online-dedup stream is pure SQL
    // over documents (first batch wins, then min doc_id); store uniqueness,
    // the re-send no-op, and the batch-API cross-check are engine booleans
    "d10_stream_dedup" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY text
        |      ORDER BY (doc_id % 3), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, source,
        |  TRUE AS unique_ok, TRUE AS resend_noop_ok,
        |  TRUE AS store_matches_expected
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // x24: generalized data skipping — two commits land disjoint uid
    // halves, the engine answers a uid-windowed read through the graft
    // connector with a require() that the scan touched fewer files than
    // the snapshot holds (per-column sidecar stats pruned the listing);
    // DuckDB restates the surviving rows from raw events, so over- or
    // under-pruning flips the hash
    "x24_column_pruned" ->
      """SELECT epoch_ns(ts) // 1000 AS time_us,
        |  1000000000 + CAST(user_id AS BIGINT) AS uid,
        |  TRUE AS files_pruned
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY time_us, uid""".stripMargin,
    // x25: data-column min/max from the stats sidecar — the engine
    // answers per-day uid/etype bounds with a require()d scanless plan
    // (and require()s the double-max probe KEEPS its scan: NaN makes a
    // stats max unsound); DuckDB restates the bounds by scanning events
    "x25_data_minmax" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date,
        |  min(user_id) AS lo_uid, max(user_id) AS hi_uid,
        |  min(event_type) AS lo_et, max(event_type) AS hi_et,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  TRUE AS double_max_scan_ok
        |FROM events GROUP BY 1 ORDER BY date""".stripMargin,
    // x26: DV-aware metadata-only aggregates — with LIVE deletion vectors
    // the engine answers global/grouped COUNT and max(partition col) from
    // stats-minus-deletes with require()d scanless plans (and require()s
    // min(time_ns) KEEPS its scan: a deleted row may hold the extreme);
    // DuckDB restates everything from events minus the strike predicate
    "x26_dv_meta_count" ->
      """WITH live AS (
        |  SELECT * FROM events WHERE (epoch_ns(ts) // 1000) % 97 >= 13),
        |cut AS (
        |  SELECT strftime(make_timestamp(
        |    (max(epoch_ns(ts)) - 604800000000000) // 1000), '%Y-%m-%d') AS d
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m-%d') AS date,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM live) AS total_live,
        |  (SELECT max(strftime(ts, '%Y-%m-%d')) FROM live) AS max_date,
        |  (SELECT min(epoch_ns(ts)) // 1000 FROM live) AS lo_us,
        |  TRUE AS dv_live_ok
        |FROM live
        |WHERE strftime(ts, '%Y-%m-%d') >= (SELECT d FROM cut)
        |GROUP BY 1 ORDER BY date""".stripMargin,
    // x27: bucketed co-located fact joins — the engine runs q3/q18
    // exchange-free and q13/q14/q9 with only subtotal rows moving over
    // pre-bucketed layouts (plan contracts require()d in the gate); the
    // oracle restates the ANSWERS from the plain tables, so the layout
    // rewrite is pinned to produce byte-identical results
    "x27_bucketed_joins" ->
      """WITH q13 AS (
        |  SELECT c_count, count(*) AS custdist FROM (
        |    SELECT c_custkey, count(o_orderkey) AS c_count
        |    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    GROUP BY c_custkey)
        |  GROUP BY c_count),
        |q3 AS (
        |  SELECT l_orderkey AS q3_top_orderkey,
        |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0
        |      AS q3_top_revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1995-03-15'
        |    AND l_shipdate > TIMESTAMP '1995-03-15'
        |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |  ORDER BY q3_top_revenue DESC, l_orderkey LIMIT 1),
        |q14 AS (
        |  SELECT 100.0 *
        |    (CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))
        |      ELSE 0 END) AS DOUBLE) / 10000.0) /
        |    (CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0)
        |    AS q14_promo_share
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'),
        |q18 AS (
        |  SELECT o_orderkey AS q18_top_orderkey,
        |    CAST(sum_qty_c AS DOUBLE) / 100.0 AS q18_top_qty
        |  FROM orders
        |  JOIN (SELECT l_orderkey, SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS sum_qty_c
        |        FROM lineitem GROUP BY l_orderkey
        |        HAVING SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) > 30000) big
        |    ON o_orderkey = l_orderkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1),
        |q9 AS (
        |  SELECT n_name AS q9_first_nation,
        |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0
        |      AS q9_first_profit
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name, strftime(o_orderdate, '%Y')
        |  ORDER BY q9_first_nation, strftime(o_orderdate, '%Y') DESC LIMIT 1)
        |SELECT q13.c_count, q13.custdist,
        |  q3.q3_top_orderkey, q3.q3_top_revenue, q14.q14_promo_share,
        |  q18.q18_top_orderkey, q18.q18_top_qty,
        |  q9.q9_first_nation, q9.q9_first_profit
        |FROM q13 CROSS JOIN q3 CROSS JOIN q14 CROSS JOIN q18 CROSS JOIN q9
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // x28: exact-match plan routing — the engine runs the STOCK-named a3/q3
    // builders but the optimizer substitutes a maintained MatView / bucketed
    // copies (plan shape require()d in the gate: no fact scan in a3, zero
    // exchanges in q3); the oracle restates every value from plain tables,
    // pinning the substitution to byte-identical results
    "x28_plan_routing" ->
      """WITH q3 AS (
        |  SELECT l_orderkey AS q3_top_orderkey,
        |    CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0
        |      AS q3_top_revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1995-03-15'
        |    AND l_shipdate > TIMESTAMP '1995-03-15'
        |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |  ORDER BY q3_top_revenue DESC, l_orderkey LIMIT 1)
        |SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(*) AS n_lineitems,
        |  q3.q3_top_orderkey, q3.q3_top_revenue, true AS routed_ok
        |FROM lineitem JOIN part ON l_partkey = p_partkey CROSS JOIN q3
        |GROUP BY p_brand, q3.q3_top_orderkey, q3.q3_top_revenue
        |ORDER BY p_brand""".stripMargin,
    // d11: streaming NEAR-dedup survivors — order-dependent but
    // non-recursive ("earlier SEEN", not "earlier admitted"), so pure SQL:
    // a doc survives iff no exact-Jaccard pair (τ=0.8, the d2 body) links
    // it to a doc with a smaller (batch, doc_id) arrival key. LSH recall,
    // exact verification, and arrival order are all on the hash; the
    // stream-vs-batch identity and the re-send no-op are engine booleans
    "d11_stream_neardup" ->
      ("WITH pairs AS (" + exactJaccardPairsBody + "),\n" +
        """sym AS (SELECT id_a AS e, id_b AS d FROM pairs
          |  UNION ALL SELECT id_b AS e, id_a AS d FROM pairs),
          |dup AS (SELECT DISTINCT d FROM sym
          |  WHERE (e % 3 < d % 3) OR (e % 3 = d % 3 AND e < d))
          |SELECT doc_id, lang, source,
          |  TRUE AS matches_batch_expected, TRUE AS resend_noop_ok
          |FROM documents WHERE doc_id NOT IN (SELECT d FROM dup)
          |ORDER BY doc_id""".stripMargin),
    // x17: the final materialized view restated from events minus the
    // delete predicate; the incremental-vs-full identity, per-commit delta
    // counts, and no-op/re-base behaviors are engine-verified booleans
    "x17_incremental_matview" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS sum_value_milli,
        |  TRUE AS append_delta_ok,
        |  TRUE AS delete_delta_ok,
        |  TRUE AS compact_delta_zero,
        |  TRUE AS noop_ok,
        |  TRUE AS incremental_matches_full
        |FROM events
        |WHERE NOT (length(props) = 9 AND strftime(ts, '%Y-%m-%d') =
        |  (SELECT min(strftime(ts, '%Y-%m-%d')) FROM events))
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "x11_snapshot_cdc" ->
      """SELECT CAST(0 AS BIGINT) AS compact_changed_rows,
        |  CAST(count(*) AS BIGINT) AS removed_rows,
        |  CAST(0 AS BIGINT) AS added_rows,
        |  TRUE AS cdc_matches_expired_ok
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') =
        |  (SELECT min(strftime(ts, '%Y-%m-%d')) FROM events)""".stripMargin,
    // v6: sign-matrix JL projection 64→32 — the oracle states the pair count
    // of the probe set and that the measured cosine distortion stayed inside
    // the gate bounds (max 0.6, mean 0.2; measured ~0.3/~0.1)
    "v6_random_projection" ->
      """SELECT (SELECT CAST(count(*) * (count(*) - 1) / 2 AS BIGINT)
        |          FROM embeddings WHERE vec_id < 40) AS n_pairs,
        |  TRUE AS max_err_ok, TRUE AS mean_err_ok""".stripMargin,
    // t11: DuckDB independently re-derives BPE merge #1 — the argmax
    // adjacent char pair over the word-count table, (count desc, pair asc)
    // tie order — and states the 8-round trainer's loop invariants
    "t11_bpe_vocab" ->
      """WITH words AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM words GROUP BY w),
        |p AS (
        |  SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair, c
        |  FROM wc WHERE len(w) >= 2),
        |top AS (
        |  SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM p GROUP BY pair
        |  ORDER BY n DESC, pair LIMIT 1)
        |SELECT CAST(8 AS BIGINT) AS n_merges,
        |  (SELECT pair FROM top) AS first_merge_token,
        |  (SELECT n FROM top) AS first_merge_count,
        |  TRUE AS counts_positive_ok, TRUE AS distinct_tokens_ok""".stripMargin,
    "v7_quantize_int8" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |  TRUE AS quant_err_ok, TRUE AS err_nonneg_ok
        |FROM embeddings""".stripMargin,
    "g6_topk_per_group" ->
      """SELECT lang, CAST(rank AS INT) AS rank, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    // t12: DuckDB restates the doc/word totals from raw text; the lossless-
    // segmentation and >=1-token-per-word gates hold for ANY merge table,
    // so a tokenizer bug (dropped char, swallowed word) flips them red
    "t12_bpe_encode" ->
      """SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        |  (SELECT CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT)
        |     FROM documents) AS n_words_total,
        |  TRUE AS chars_conserved_ok, TRUE AS tokens_ge_words_ok""".stripMargin,
    "m3_multimodal_resize" ->
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |  ELSE 'video' END AS kind,
        |  CAST(count(*) AS BIGINT) AS n, TRUE AS resize_ok
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin
  )
}
