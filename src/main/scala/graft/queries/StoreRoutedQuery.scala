package graft.queries

import graft.Tables
import graft.ext.Bucketing
import graft.logs._
import graft.plans.{PlanRewrites, PlanScans}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x28 — exact-match plan ROUTING ([[graft.plans.PlanRewrites]]): the
  * STOCK-named queries, not the layout APIs, get the maintained-artifact
  * plans — the r14 verdict's "a user gets the slow plan unless they call
  * `Bucketing.q3Colocated` by name" gap, closed as an optimizer seam:
  *
  *   - a3 (`distinctSuppliersPerBrand`): its (brand, suppkey) rollup
  *     fragment is registered against a [[MatView]] maintained over a graft
  *     store holding exactly those rows — the stock plan's fact join+rollup
  *     collapses to a view-table scan (`require`d: no lineitem scan left);
  *   - q3 (`topUnshippedOrders`): the lineitem/orders base scans are
  *     registered against full-column bucketed copies — the STOCK plan
  *     (auto-broadcast disabled) goes EXCHANGE-FREE (`require`d).
  *
  * Both routes are value-preserving by construction (`sameResult` exact
  * match, artifact holds the fragment's rows); the DuckDB oracle restates
  * every output value from the plain tables, so the substitution is
  * correctness-gated by the driver protocol like every operator.
  */
object StoreRoutedQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark0: SparkSession, dir: String): DataFrame = {
    import spark0.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-x28")
    val prefix = s"x28_${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"

    // ---- a3 artifact: MatView over a store of the rollup's input rows ----
    val baseRoot = s"$work/a3_base"
    val viewDir = s"$work/a3_view"
    // store the JOINED projection (brand, suppkey) row-per-lineitem so the
    // view's count(*) per key IS the rollup's c; partition on a small
    // derived key (brands carry '#', better kept out of dir names)
    val storeRows = PlanRewrites.withoutRewrites {
      Tables.lineitem(spark0, dir).select($"l_partkey", $"l_suppkey")
        .join(graft.plans.Hints.dimBroadcast(
          Tables.part(spark0, dir).select($"p_partkey", $"p_brand")),
          $"l_partkey" === $"p_partkey")
        .select($"p_brand", $"l_suppkey",
          ($"l_suppkey" % 4).cast("string").as("g"))
    }
    GraftStore.init(spark0, baseRoot)
    AppendCommit.commit(storeRows, baseRoot, partitionCols = Seq("g"))
    MatView.create(spark0, baseRoot, viewDir,
      keys = Seq("p_brand", "l_suppkey"), sums = Seq.empty)
    val viewFrame = MatView.readView(spark0, viewDir)
      .select($"p_brand", $"l_suppkey", $"n_rows".as("c"))

    // ---- q3 artifact: full-column bucketed copies of the fact tables ----
    val liT = s"${prefix}_li"; val ordT = s"${prefix}_ord"
    Bucketing.writeBucketed(Tables.lineitem(spark0, dir), liT,
      s"$work/li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark0, dir), ordT,
      s"$work/ord_b", "o_orderkey", 8)

    // SCOPED registrations (r16, ADVICE r15): the registry is process-global
    // and the bench runs gate queries CONCURRENTLY — an unscoped lineitem/
    // orders base-scan registration silently reroutes every other in-flight
    // query onto x28's temp-dir bucketed copies while registered (same rows,
    // wrong layout under the stopwatch), and a crash before the `finally`
    // would leave it armed JVM-wide. Scoped entries apply only inside
    // sessions carrying this token, so the stock sessions keep stock plans.
    val scope = Some(prefix)
    PlanRewrites.register(s"${prefix}_a3",
      RelationalQueries.brandSupplierRollup(spark0, dir), viewFrame, scope)
    PlanRewrites.register(s"${prefix}_q3li",
      Tables.lineitem(spark0, dir), spark0.table(liT), scope)
    PlanRewrites.register(s"${prefix}_q3ord",
      Tables.orders(spark0, dir), spark0.table(ordT), scope)
    try {
      // stock-NAMED a3 on a scope-carrying clone: must now answer from the
      // view table, fact scan gone
      val a3Rows = graft.ConfScope.withSessionConf(spark0,
        PlanRewrites.ScopeConfKey -> prefix) { s =>
        val a3 = RelationalQueries.distinctSuppliersPerBrand(s, dir)
        val a3Paths = PlanScans.fileScans(a3)
          .flatMap(_.relation.location.rootPaths.map(_.toString))
        require(a3Paths.exists(_.contains("a3_view")),
          s"x28: stock a3 must route to the MatView artifact, scanned $a3Paths")
        require(!a3Paths.exists(_.contains("lineitem")),
          "x28: the routed a3 must not scan the fact table")
        a3.as[(String, Long, Long)].collect().toSeq
      }

      // stock-NAMED q3 on a broadcast-disabled, scope-carrying clone:
      // exchange-free
      val q3r = graft.ConfScope.withSessionConf(spark0,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        PlanRewrites.ScopeConfKey -> prefix) { s =>
        val q3 = RelationalQueries.topUnshippedOrders(s, dir)
        Bucketing.requireNoShuffle(q3, "x28 routed stock q3")
        q3.head()
      }

      a3Rows.toDF("p_brand", "n_suppliers", "n_lineitems").select(
        $"p_brand", $"n_suppliers", $"n_lineitems",
        lit(q3r.getLong(0)).as("q3_top_orderkey"),
        lit(q3r.getDouble(3)).as("q3_top_revenue"),
        lit(true).as("routed_ok"))
        .orderBy($"p_brand")
    } finally {
      PlanRewrites.unregister(s"${prefix}_a3")
      PlanRewrites.unregister(s"${prefix}_q3li")
      PlanRewrites.unregister(s"${prefix}_q3ord")
      Seq(liT, ordT).foreach(t => spark0.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
