package graft

import graft.ext.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lastBefore picks the latest right row at-or-before each left time") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 150L, "l3"))
      .toDF("k", "t", "lval")
    val right = Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (2L, 160L, "r@160"))
      .toDF("k", "t", "rval")
    val got = AsofJoin.lastBefore(left, right, Seq("k"), "t")
      .select($"k", $"lval", $"right_rval").orderBy($"k", $"lval")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, "l1", Some("r@100")),  // inclusive: r.t == l.t matches
      (1L, "l2", Some("r@150")),  // latest before 200
      (2L, "l3", None)))          // right row at 160 is AFTER 150 -> no match
  }

  test("null right-payload fields do not blend across right rows") {
    val left = Seq((1L, 300L, "l1")).toDF("k", "t", "lval")
    val right = Seq((1L, 100L, Some("a1"), Some("b1")), (1L, 200L, Some("a2"), None))
      .toDF("k", "t", "a", "b")
    val got = AsofJoin.lastBefore(left, right, Seq("k"), "t")
      .select($"right_a", $"right_b").collect().head
    // must be the t=200 row exactly: a2 with a GENUINE null b — not b1
    assert(got.getString(0) == "a2" && got.isNullAt(1))
  }

  test("plan is one sort per key merge, not a nested-loop range join") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter($"event_type" === "error").select($"user_id", $"ts", $"event_id")
    val r = ev.filter($"event_type" === "click").select($"user_id", $"ts", $"event_id")
    val plan = AsofJoin.lastBefore(l, r, Seq("user_id"), "ts")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }
}
