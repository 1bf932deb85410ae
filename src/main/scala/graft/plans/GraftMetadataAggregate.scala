package graft.plans

import graft.sources.GraftFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only aggregates over `format("graft")` relations — the
  * optimizer-rule twin of the DSv2 `SupportsPushDownAggregates` contract
  * (and of [[graft.logs.MetaTables]]' manual surface): a global
  * `COUNT(*)` / `MIN(time_ns)` / `MAX(time_ns)` with no filter collapses to
  * a [[LocalRelation]] computed from the commit-time `_graft_filestats`
  * sidecar, so the query answers from manifest-tier metadata with ZERO data
  * file I/O. At 100 TB that is the difference between an instant answer and
  * a full-store scan — the Iceberg/Delta "stats-only query" play.
  *
  * Safety gates, all conservative:
  *   - fires only on the graft connector's fast tier ([[GraftFileIndex]] —
  *     which exists only when no deletion vectors are live, so physical row
  *     counts ARE logical row counts);
  *   - only when EVERY snapshot file has a fresh stats line
  *     ([[GraftFileIndex.completeStats]]); one out-of-protocol file
  *     disables the rewrite wholesale (fail open to the real scan);
  *   - only global aggregates directly over the (possibly column-pruned)
  *     relation — any Filter/GROUP BY/DISTINCT/agg-filter breaks the match
  *     and the plan runs untouched;
  *   - `MIN`/`MAX` only when every file carries the bound (an all-null
  *     `time_ns` file has none, and parquet-style min/max ignore nulls
  *     exactly like the aggregate does on non-empty data).
  */
object GraftMetadataAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      statsOf(child) match {
        case Some(st) =>
          val values = aggExprs.map(evalFromStats(_, st))
          if (values.forall(_.isDefined))
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** The complete per-file stats behind `child`, when `child` is exactly a
    * graft fast-tier relation (modulo attribute-only column pruning).
    */
  private def statsOf(child: LogicalPlan): Option[Seq[graft.logs.FileStats.FileStat]] =
    child match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: GraftFileIndex => idx.completeStats
          case _ => None
        }
      case Project(projectList, inner) if projectList.forall(isPassthrough) =>
        statsOf(inner)
      case _ => None
    }

  private def isPassthrough(e: NamedExpression): Boolean = e match {
    case _: AttributeReference => true
    case Alias(_: AttributeReference, _) => true
    case _ => false
  }

  /** `Some(value)` when this output expression is answerable from stats. */
  private def evalFromStats(e: NamedExpression,
      st: Seq[graft.logs.FileStats.FileStat]): Option[Any] = {
    def fromAgg(ae: AggregateExpression): Option[Any] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => Some(st.map(_.rows).sum)
        case Min(a: Attribute) if a.name == "time_ns" =>
          val bounds = st.map(_.minNs)
          if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.min) else None
        case Max(a: Attribute) if a.name == "time_ns" =>
          val bounds = st.map(_.maxNs)
          if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.max) else None
        case _ => None
      }
    e match {
      case Alias(ae: AggregateExpression, _) => fromAgg(ae)
      case ae: AggregateExpression => fromAgg(ae)
      case _ => None
    }
  }
}
