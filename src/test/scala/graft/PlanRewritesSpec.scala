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

  test("scoped registration routes only inside the token-carrying session") {
    val work = Files.createTempDirectory("graft-rewrite-scope")
    val pre = work.resolve("a3_pre").toString
    a3Fragment(spark).write.mode("overwrite").parquet(pre)
    PlanRewrites.register("spec_scoped", a3Fragment(spark),
      spark.read.parquet(pre).select($"p_brand", $"l_suppkey", $"c"),
      scope = Some("spec-token"))
    try {
      // the registering (unscoped) session keeps the stock plan
      assert(scanPaths(a3Fragment(spark)).exists(_.contains("lineitem")),
        "a scoped entry must NOT route in a session without the token")
      // a clone carrying the token routes
      ConfScope.withSessionConf(spark,
        PlanRewrites.ScopeConfKey -> "spec-token") { s =>
        val routed = queries.RelationalQueries.distinctSuppliersPerBrand(s, sf)
        assert(scanPaths(routed).exists(_.contains("a3_pre")),
          "the token-carrying clone must route to the artifact")
      }
      // a clone carrying a DIFFERENT token does not
      ConfScope.withSessionConf(spark,
        PlanRewrites.ScopeConfKey -> "other-token") { s =>
        assert(scanPaths(queries.RelationalQueries.distinctSuppliersPerBrand(s, sf))
          .exists(_.contains("lineitem")))
      }
    } finally PlanRewrites.unregister("spec_scoped")
  }

  test("two sites matching one definition get distinct exprIds and correct rows") {
    val work = Files.createTempDirectory("graft-rewrite-dup")
    val pre = work.resolve("a3_pre").toString
    a3Fragment(spark).write.mode("overwrite").parquet(pre)
    // a self-join referencing the SAME registered fragment twice: without
    // per-site re-instancing both branches would share the replacement's
    // attribute ids (the DeduplicateRelations hazard)
    // a UNION consumes every fragment column on both branches, so neither
    // column pruning nor join-constraint inference can narrow a subtree
    // away from the registered shape
    def doubled(s: org.apache.spark.sql.SparkSession): DataFrame =
      a3Fragment(s).unionByName(a3Fragment(s))
        .groupBy($"p_brand", $"l_suppkey").agg(sum($"c").as("s"))
        .orderBy($"p_brand", $"l_suppkey")
    val stockRows = rows(doubled(spark))
    PlanRewrites.register("spec_dup", a3Fragment(spark),
      spark.read.parquet(pre).select($"p_brand", $"l_suppkey", $"c"))
    try {
      val routed = doubled(spark)
      val paths = scanPaths(routed)
      assert(paths.count(_.contains("a3_pre")) >= 1 &&
        !paths.exists(_.contains("lineitem")),
        s"both fragment sites must route to the artifact, scanned: $paths")
      // duplicate attribute ids across branches are exactly what the
      // re-instancing prevents
      val leaves = routed.queryExecution.optimizedPlan.collectLeaves()
      val ids = leaves.flatMap(_.output.map(_.exprId))
      assert(ids.distinct.length == ids.length,
        s"leaf output exprIds must be unique across branches: $ids")
      assert(rows(routed) == stockRows, "dual-site routing must be value-preserving")
    } finally PlanRewrites.unregister("spec_dup")
  }

  test("a populated registry adds no measurable optimizer overhead (fingerprint screen)") {
    val work = Files.createTempDirectory("graft-rewrite-many")
    val pre = work.resolve("a3_pre").toString
    a3Fragment(spark).write.mode("overwrite").parquet(pre)
    // 50 entries that can never match (each a STRUCTURALLY distinct plan —
    // a per-entry literal shift; a mere alias difference would no longer
    // distinguish them, since r17 made matching name-insensitive like
    // sameResult itself): the r15 verdict's apply-cost criterion — every
    // node of every query used to pay 2×|registry| canonicalized
    // comparisons; now a non-matching entry costs one type-vector compare
    val artifact = spark.read.parquet(pre)
    (1 to 50).foreach { i =>
      PlanRewrites.register(s"spec_many_$i",
        a3Fragment(spark).select(($"c" + i).as(s"c_$i")),
        artifact.select(($"c" + i).as(s"c_$i")))
    }
    try {
      def planMs(): Double = {
        val t0 = System.nanoTime()
        // force full optimization of a realistic multi-join plan
        queries.RelationalQueries.topUnshippedOrders(spark, sf)
          .queryExecution.optimizedPlan
        (System.nanoTime() - t0) / 1e6
      }
      val withRegistry = (1 to 5).map(_ => planMs()).min
      (1 to 50).foreach(i => PlanRewrites.unregister(s"spec_many_$i"))
      val without = (1 to 5).map(_ => planMs()).min
      // generous bound: planning is tens of ms; the screen keeps the delta
      // far under a 3× blowup even on a noisy box
      assert(withRegistry < without * 3 + 50,
        f"50 registrations must not blow up planning: $withRegistry%.1f ms vs $without%.1f ms")
    } finally (1 to 50).foreach(i => PlanRewrites.unregister(s"spec_many_$i"))
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

  test("routing is output-name-insensitive, like sameResult (r17)") {
    // the same fragment authored with a different alias name sameResult-
    // equals the definition (canonicalization erases alias names); the old
    // (name,type) fingerprint screen silently refused to route it
    val work = Files.createTempDirectory("graft-rewrite-rename")
    val pre = work.resolve("a3_pre").toString
    a3Fragment(spark).write.mode("overwrite").parquet(pre)
    PlanRewrites.register("spec_rename", a3Fragment(spark),
      spark.read.parquet(pre).select($"p_brand", $"l_suppkey", $"c"))
    try {
      val renamed = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
        .join(Hints.dimBroadcast(
          Tables.part(spark, sf).select($"p_partkey", $"p_brand")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_suppkey").agg(count(lit(1)).as("n"))
      val paths = scanPaths(renamed)
      assert(paths.exists(_.contains("a3_pre")),
        s"same fragment with a different alias name must still route, scanned: $paths")
      assert(renamed.columns.toSeq == Seq("p_brand", "l_suppkey", "n"),
        "the substitution Project must re-alias onto the caller's names")
    } finally PlanRewrites.unregister("spec_rename")
  }

  test("register rejects alias-bearing non-Project replacements (r17)") {
    // freshInstance can only re-instance leaves and Project aliases; an
    // Aggregate-bearing replacement matched at two sites would share alias
    // exprIds across branches — fail fast at registration instead
    val ex = intercept[IllegalArgumentException] {
      PlanRewrites.register("spec_agg_repl",
        a3Fragment(spark).select($"p_brand", $"l_suppkey",
          ($"c" + 12345).as("c")),
        a3Fragment(spark).select($"p_brand", $"l_suppkey", $"c", $"c".as("c2"))
          .groupBy($"p_brand", $"l_suppkey", $"c2")
          .agg((max($"c") + 12345).as("c"))
          .select($"p_brand", $"l_suppkey", $"c"))
    }
    assert(ex.getMessage.contains("scans/projections/filters"))
    assert(!PlanRewrites.registered.contains("spec_agg_repl"))
  }
}
