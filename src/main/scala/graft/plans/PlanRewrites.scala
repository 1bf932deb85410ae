package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Narrow, exact-match plan routing — the engine's materialized-view /
  * layout-copy substitution seam (the Delta/Iceberg "redirect the stock
  * plan to the maintained artifact" play, and the reason a user gets the
  * fast plan WITHOUT calling `Bucketing.q3Colocated` or reading a
  * [[graft.logs.MatView]] by name).
  *
  * A registration is a pair of plans with identical results by CONTRACT:
  * `definition` (a fragment of some stock query — a pre-aggregate, a base
  * table scan) and `replacement` (the maintained artifact holding exactly
  * that fragment's rows — a MatView read, a bucketed store/table copy).
  * During optimization, any plan subtree that [[LogicalPlan.sameResult]]s a
  * registered definition is swapped for the replacement, with the
  * replacement's output re-aliased onto the subtree's exprIds so everything
  * above resolves unchanged. Everything else fails open: no registration →
  * byte-identical planning; a subtree that differs in ANY semantic way
  * (extra filter, different column set, different source) simply doesn't
  * `sameResult` and is left alone.
  *
  * Matching is `sameResult` on OPTIMIZED plans (both sides normalize
  * through the same optimizer, and canonicalization erases exprIds and
  * hints), the same mechanism `CacheManager` uses to recognize cached
  * fragments — not a heuristic rewrite, so a substitution can only fire on
  * a fragment provably identical to what was registered.
  *
  * Staleness is the registrant's contract, exactly like Spark's own cache:
  * register AFTER the artifact is refreshed against the current base data,
  * unregister (or re-register) when the base changes. Maintenance jobs that
  * RECOMPUTE a definition (a view refresh) must run under
  * [[withoutRewrites]] or they would read their own output.
  *
  * Registry is process-global and thread-safe; the rule itself installs
  * alongside [[GraftMetadataAggregate]] (see [[graft.GraftSession.configure]])
  * so cloned sessions ([[graft.ConfScope]]) route identically.
  */
object PlanRewrites extends Rule[LogicalPlan] {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (LogicalPlan, LogicalPlan)]()

  private val disabled = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Register `replacement` as the routed answer for any plan subtree with
    * `definition`'s result. Column names and types must line up 1:1 —
    * downstream expressions were resolved against the definition's schema.
    * (Nullability may differ: a maintained parquet artifact reads back
    * nullable even when the defining aggregate was not; the row-identity
    * contract makes runtime null-ness identical.)
    */
  def register(name: String, definition: DataFrame, replacement: DataFrame): Unit = {
    val d = definition.queryExecution.optimizedPlan
    val r = replacement.queryExecution.optimizedPlan
    require(d.output.length == r.output.length &&
      d.output.zip(r.output).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType
      },
      s"rewrite '$name': replacement schema ${r.schema.simpleString} must match " +
        s"definition ${d.schema.simpleString} (names and types, in order)")
    // a replacement structurally identical to its definition would
    // re-substitute itself forever at the optimizer's fixed point
    require(!d.sameResult(r),
      s"rewrite '$name': replacement is plan-identical to the definition")
    registry.put(name, (d, r))
  }

  def unregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  def registered: Set[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSet
  }

  /** Run `body` with routing suppressed on THIS thread — for maintenance
    * that recomputes a registered definition from base data.
    */
  def withoutRewrites[A](body: => A): A = {
    disabled.set(java.lang.Boolean.TRUE)
    try body finally disabled.set(java.lang.Boolean.FALSE)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || disabled.get()) return plan
    import scala.jdk.CollectionConverters._
    val entries = registry.values().asScala.toSeq
    plan.transformDown {
      case p if entries.exists(_._1.sameResult(p)) =>
        val (_, r) = entries.find(_._1.sameResult(p)).get
        // re-alias the replacement's columns onto the matched subtree's
        // exprIds (positional: sameResult ⇒ outputs correspond in order), so
        // references above the substitution stay resolved
        Project(p.output.zip(r.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, r)
    }
  }
}
