package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

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
  * a fragment provably identical to what was registered. `sameResult`
  * canonicalizes both subtrees, which is not free: each candidate node is
  * first screened by a precomputed (name, type) output fingerprint, so a
  * registry of dozens of entries costs one cheap vector compare per plan
  * node and canonicalizes only on a fingerprint hit (r15 verdict item 6 —
  * the old exists+find shape canonicalized every entry against every node
  * twice).
  *
  * Registrations may carry a SCOPE: a scoped entry applies only inside a
  * session whose `graft.rewrites.scope` session conf equals that scope
  * (set it on a [[graft.ConfScope]] clone). Unscoped entries apply
  * everywhere, as before. Gate queries that register shared base tables
  * (x28) scope their registrations so a concurrently-running query in the
  * same JVM keeps its stock plan — same rows either way, but timings must
  * measure the layout the query asked for, and a crash between register
  * and the `finally` must not leave routing armed for the whole JVM.
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

  /** Session conf key selecting which SCOPED registrations apply. */
  val ScopeConfKey = "graft.rewrites.scope"

  private final case class Entry(definition: LogicalPlan,
      replacement: LogicalPlan,
      fingerprint: Seq[DataType],
      scope: Option[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private val disabled = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Output TYPES only (r17, ADVICE r16): canonicalization erases alias
    * names, so `sameResult` treats a subtree differing from the definition
    * only in output column names as identical — a name-bearing fingerprint
    * silently narrowed the documented CacheManager-equivalent contract
    * (e.g. a trailing `.toDF(names...)` rename would never route). The
    * substitution Project re-aliases the replacement onto the matched
    * subtree's names/exprIds anyway, so names never needed to agree.
    */
  private def outFingerprint(p: LogicalPlan): Seq[DataType] =
    p.output.map(_.dataType)

  /** Register `replacement` as the routed answer for any plan subtree with
    * `definition`'s result. Column names and types must line up 1:1 —
    * downstream expressions were resolved against the definition's schema.
    * (Nullability may differ: a maintained parquet artifact reads back
    * nullable even when the defining aggregate was not; the row-identity
    * contract makes runtime null-ness identical.)
    *
    * `scope = Some(token)` restricts the entry to sessions whose
    * [[ScopeConfKey]] conf equals `token` (see class doc).
    */
  def register(name: String, definition: DataFrame, replacement: DataFrame,
      scope: Option[String] = None): Unit = {
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
    // freshInstance (multi-site substitution) re-instances leaf relations
    // and Project aliases only — enforce that assumption here (r17, ADVICE
    // r16): a replacement carrying aliases in any OTHER node kind
    // (Aggregate, Window, Generate) matched at two sites in one query would
    // share those alias exprIds across branches, the DeduplicateRelations
    // hazard freshInstance exists to prevent. Registered replacements are
    // artifact READS (scans + projections + filters), so this fails fast
    // only on a shape the seam never promised to support.
    val offending = r.collect {
      case n if !n.isInstanceOf[Project] &&
        n.expressions.exists(_.exists(_.isInstanceOf[Alias])) => n.nodeName
    }
    require(offending.isEmpty,
      s"rewrite '$name': replacement must be scans/projections/filters — " +
        s"alias-bearing node(s) ${offending.distinct.mkString(",")} cannot be " +
        "re-instanced for multi-site substitution")
    registry.put(name, Entry(d, r, outFingerprint(d), scope))
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

  /** A structurally fresh copy of a replacement plan: leaf relations get new
    * instances (fresh output exprIds) and Project aliases get fresh exprIds,
    * with all ancestor references rewritten. Used when ONE query matches the
    * same registered definition at two sites — substituting the identical
    * plan object twice would duplicate its exprIds across join branches,
    * exactly the state `DeduplicateRelations` exists to prevent.
    * (Registered replacements are artifact reads — scans plus projections —
    * so leaves + project aliases cover their named expressions.)
    */
  private def freshInstance(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithNewOutput {
      case m: MultiInstanceRelation =>
        val fresh = m.newInstance().asInstanceOf[LogicalPlan]
        (fresh, m.asInstanceOf[LogicalPlan].output.zip(fresh.output))
      case p @ Project(list, child) if list.exists(_.isInstanceOf[Alias]) =>
        val newList = list.map {
          case a: Alias =>
            Alias(a.child, a.name)(qualifier = a.qualifier,
              explicitMetadata = a.explicitMetadata,
              nonInheritableMetadataKeys = a.nonInheritableMetadataKeys)
          case o => o
        }
        val np = Project(newList, child)
        (np, p.output.zip(np.output))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || disabled.get()) return plan
    import scala.jdk.CollectionConverters._
    val scopeToken = conf.getConfString(ScopeConfKey, "")
    val entries = registry.values().asScala.toSeq
      .filter(e => e.scope.forall(_ == scopeToken))
    if (entries.isEmpty) return plan
    // entries already substituted once in THIS tree: later sites get a
    // fresh-exprId instance so two branches never share attribute ids
    val used = new java.util.IdentityHashMap[Entry, java.lang.Boolean]()
    plan.transformDown { case p =>
      // one cheap fingerprint compare per (node, entry); sameResult — which
      // canonicalizes both subtrees — only on a fingerprint hit, via a
      // single find
      val fp = outFingerprint(p)
      entries.find(e => e.fingerprint == fp && e.definition.sameResult(p)) match {
        case None => p
        case Some(e) =>
          val r = if (used.containsKey(e)) freshInstance(e.replacement)
                  else { used.put(e, java.lang.Boolean.TRUE); e.replacement }
          // re-alias the replacement's columns onto the matched subtree's
          // exprIds (positional: sameResult ⇒ outputs correspond in
          // order), so references above the substitution stay resolved
          Project(p.output.zip(r.output).map { case (o, n) =>
            Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
          }, r)
      }
    }
  }
}
