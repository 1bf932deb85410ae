package graft

import graft.queries.ExtensionQueries
import org.apache.spark.sql.functions._

/** Approximate operators have no cross-engine oracle (sketch layouts are
  * engine-specific), so their gate is a tolerance bound against the exact
  * computation on the same data.
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct counts are within the configured relative error") {
    val approx = ExtensionQueries.approxDistinctUsers(spark, sf)
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .select($"event_type", $"n").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val a = approx(t)
      val err = math.abs(a - e).toDouble / e
      assert(err <= 0.05, s"$t: approx $a vs exact $e (err $err)")
    }
  }

  test("approx quantiles bracket the exact percentiles") {
    val approx = ExtensionQueries.approxQuantiles(spark, sf)
      .select($"o_orderpriority", array($"p50", $"p95", $"p99").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    for ((p, eq) <- exact; (a, e) <- approx(p).zip(eq)) {
      val err = math.abs(a - e) / e
      assert(err <= 0.05, s"$p: approx $a vs exact $e (err $err)")
    }
  }
}
