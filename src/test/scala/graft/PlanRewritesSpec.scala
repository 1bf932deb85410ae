package graft

import graft.plans.{Hints, PlanRewrites, PlanScans}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[graft.plans.PlanRewrites]] — exact-match routing of stock plans to
  * registered maintained artifacts (the r14 verdict's "auto-routing seam":
  * a user running the STOCK-named query gets the matview/bucketed plan
  * without calling the layout API by name). Proven here:
  *
  *   - the a3 rollup fragment inside `distinctSuppliersPerBrand` routes to
  *     a materialized pre-aggregate; rows identical to the unrouted plan;
  *   - fail-open: a semantically different query (extra filter) is planned
  *     byte-identically — no substitution;
  *   - stock q3 with base-table scans routed to bucketed copies plans
  *     EXCHANGE-FREE and row-identical;
  *   - `withoutRewrites` suppresses routing for maintenance recompute.
  */
class PlanRewritesSpec extends SparkSpec {
  import spark.implicits._

  private def a3Fragment(s: org.apache.spark.sql.SparkSession): DataFrame =
    Tables.lineitem(s, sf).select($"l_partkey", $"l_suppkey")
      .join(Hints.dimBroadcast(
        Tables.part(s, sf).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"l_suppkey").agg(count(lit(1)).as("c"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  private def scanPaths(df: DataFrame): Seq[String] =
    PlanScans.fileScans(df).flatMap(_.relation.location.rootPaths.map(_.toString))

  test("a3 rollup routes to a registered pre-aggregate; fail-open on a different plan") {
    val work = Files.createTempDirectory("graft-rewrite-a3")
    val pre = work.resolve("a3_pre").toString
    a3Fragment(spark).write.mode("overwrite").parquet(pre)
    val stockRows = rows(queries.RelationalQueries.distinctSuppliersPerBrand(spark, sf))
    PlanRewrites.register("spec_a3", a3Fragment(spark),
      spark.read.parquet(pre).select($"p_brand", $"l_suppkey", $"c"))
    try {
      val routed = queries.RelationalQueries.distinctSuppliersPerBrand(spark, sf)
      val paths = scanPaths(routed)
      assert(paths.exists(_.contains("a3_pre")),
        s"stock a3 must scan the registered artifact, scanned: $paths")
      assert(!paths.exists(_.contains("lineitem")),
        "the fact scan must be gone — the rollup is answered by the artifact")
      assert(rows(routed) == stockRows, "routing must be value-preserving")
      // fail-open: one extra filter → no sameResult → stock plan untouched
      val different = Tables.lineitem(spark, sf)
        .select($"l_partkey", $"l_suppkey")
        .filter($"l_suppkey" > 10)
        .join(Hints.dimBroadcast(
          Tables.part(spark, sf).select($"p_partkey", $"p_brand")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_suppkey").agg(count(lit(1)).as("c"))
      assert(scanPaths(different).exists(_.contains("lineitem")),
        "a semantically different fragment must NOT be substituted")
      // maintenance escape hatch: recompute reads base data, not itself
      PlanRewrites.withoutRewrites {
        assert(scanPaths(a3Fragment(spark)).exists(_.contains("lineitem")))
      }
    } finally PlanRewrites.unregister("spec_a3")
  }

  test("stock q3 routes to bucketed copies and plans exchange-free, rows identical") {
    val work = Files.createTempDirectory("graft-rewrite-q3")
    // FULL-column bucketed copies: scan substitution is schema-exact, and
    // physical column pruning still reads only what q3 needs
    val liT = "rw_lineitem_b"; val ordT = "rw_orders_b"
    graft.ext.Bucketing.writeBucketed(Tables.lineitem(spark, sf), liT,
      work.resolve("li").toString, "l_orderkey", 8)
    graft.ext.Bucketing.writeBucketed(Tables.orders(spark, sf), ordT,
      work.resolve("ord").toString, "o_orderkey", 8)
    val stockRows = rows(queries.RelationalQueries.topUnshippedOrders(spark, sf))
    PlanRewrites.register("spec_q3_li", Tables.lineitem(spark, sf), spark.table(liT))
    PlanRewrites.register("spec_q3_ord", Tables.orders(spark, sf), spark.table(ordT))
    try ConfScope.withSessionConf(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { s =>
      val routed = queries.RelationalQueries.topUnshippedOrders(s, sf)
      routed.write.format("noop").mode("overwrite").save()
      graft.ext.Bucketing.requireNoShuffle(routed, "routed stock q3")
      assert(rows(routed) == stockRows, "routing must be value-preserving")
    } finally {
      PlanRewrites.unregister("spec_q3_li")
      PlanRewrites.unregister("spec_q3_ord")
      spark.sql(s"DROP TABLE IF EXISTS $liT")
      spark.sql(s"DROP TABLE IF EXISTS $ordT")
    }
  }

  test("q16's DISTINCT rollup fragment routes in the stock plan") {
    // regression for the pruning lesson: the registered fragment must be
    // exactly what survives optimization — partSupplierRollup is a pure
    // distinct precisely so the stock q16 subtree sameResults it
    val work = Files.createTempDirectory("graft-rewrite-q16")
    val pre = work.resolve("q16_pre").toString
    queries.RelationalQueries.partSupplierRollup(spark, sf)
      .write.mode("overwrite").parquet(pre)
    val stockRows = rows(queries.RelationalQueries.supplierCountByPart(spark, sf))
    PlanRewrites.register("spec_q16",
      queries.RelationalQueries.partSupplierRollup(spark, sf),
      spark.read.parquet(pre)
        .select($"p_brand", $"p_type", $"p_size", $"l_suppkey"))
    try {
      val routed = queries.RelationalQueries.supplierCountByPart(spark, sf)
      val paths = scanPaths(routed)
      assert(paths.exists(_.contains("q16_pre")),
        s"stock q16 must scan the registered artifact, scanned: $paths")
      assert(!paths.exists(_.contains("lineitem")))
      assert(rows(routed) == stockRows, "routing must be value-preserving")
    } finally PlanRewrites.unregister("spec_q16")
  }

  test("register rejects schema drift and self-referential replacements") {
    intercept[IllegalArgumentException] {
      PlanRewrites.register("spec_bad",
        a3Fragment(spark),
        a3Fragment(spark).withColumnRenamed("c", "n"))
    }
    intercept[IllegalArgumentException] {
      PlanRewrites.register("spec_self", a3Fragment(spark), a3Fragment(spark))
    }
    assert(!PlanRewrites.registered.contains("spec_bad"))
    assert(!PlanRewrites.registered.contains("spec_self"))
  }
}
