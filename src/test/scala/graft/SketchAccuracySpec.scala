package graft

import graft.queries.ExtensionQueries
import org.apache.spark.sql.functions._

/** Approximate operators can't hash-match a cross-engine oracle on the
  * sketch VALUES (layouts are engine-specific), so accuracy is asserted two
  * ways: the a4/a5 queries now carry self-verifying gates (exact counts the
  * DuckDB oracle restates + in-envelope booleans), and this spec re-derives
  * the tolerance bound directly against the exact computation so a gate bug
  * can't hide a drifting sketch.
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct counts are within the configured relative error") {
    val approx = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("a"))
      .select($"event_type", $"a").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .select($"event_type", $"n").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val a = approx(t)
      val err = math.abs(a - e).toDouble / e
      assert(err <= 0.05, s"$t: approx $a vs exact $e (err $err)")
    }
    // and the oracle-gated query agrees with itself: every envelope boolean true
    val gate = ExtensionQueries.approxDistinctUsers(spark, sf)
    assert(gate.filter(!$"approx_ok").count() == 0)
  }

  test("approx quantiles are within tolerance of the exact percentiles") {
    val approx = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.95, 0.99), 10000)").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    for ((p, eq) <- exact; (a, e) <- approx(p).zip(eq)) {
      val err = math.abs(a - e) / e
      assert(err <= 0.05, s"$p: approx $a vs exact $e (err $err)")
    }
    val gate = ExtensionQueries.approxQuantiles(spark, sf)
    assert(gate.filter(!$"p50_ok" || !$"p95_ok" || !$"p99_ok").count() == 0)
  }
}
