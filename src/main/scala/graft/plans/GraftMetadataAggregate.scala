package graft.plans

import graft.sources.GraftFileIndex
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only aggregates over `format("graft")` relations — the
  * optimizer-rule twin of the DSv2 `SupportsPushDownAggregates` contract
  * (and of [[graft.logs.MetaTables]]' manual surface): `COUNT(*)` /
  * `MIN(time_ns)` / `MAX(time_ns)`, globally or GROUPED BY partition
  * columns, with no filter, collapse to a [[LocalRelation]] computed from
  * the commit-time `_graft_filestats` sidecar — the query answers from
  * manifest-tier metadata with ZERO data file I/O. At 100 TB that is the
  * difference between an instant answer and a full-store scan ("rows per
  * day, whole store" is the canonical ops query), the Iceberg/Delta
  * "stats-only query" play.
  *
  * Safety gates, all conservative:
  *   - fires only on the graft connector's fast tier ([[GraftFileIndex]] —
  *     which exists only when no deletion vectors are live, so physical row
  *     counts ARE logical row counts);
  *   - only when EVERY snapshot file has a fresh stats line
  *     ([[GraftFileIndex.completeStats]]); one out-of-protocol file
  *     disables the rewrite wholesale (fail open to the real scan);
  *   - grouping keys must be bare partition-column attributes (values come
  *     from directory names, which every file in the dir shares); anything
  *     else — a Filter, a data-column group, DISTINCT, an agg filter —
  *     breaks the match and the plan runs untouched;
  *   - `MIN`/`MAX` only when every file in the group carries the bound (an
  *     all-null `time_ns` file has none, and parquet-style min/max ignore
  *     nulls exactly like the aggregate does on non-empty data).
  */
object GraftMetadataAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(child) match {
        case Some((idx, resolve)) =>
          rewrite(agg, groupingExprs.map(_.asInstanceOf[AttributeReference]),
            aggExprs, idx, resolve).getOrElse(agg)
        case None => agg
      }
  }

  private def rewrite(agg: Aggregate, grouping: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression], idx: GraftFileIndex,
      resolve: Map[ExprId, Attribute]): Option[LogicalPlan] = {
    val partCols = idx.partitionSchema.fieldNames
    // grouping keys resolve BY exprId to the relation's own attributes —
    // an intervening rename (`select($"node".as("date"))`) resolves to the
    // UNDERLYING column, so it either matches the real partition column or
    // breaks the rewrite; a name match alone would answer from the wrong
    // directory values
    val groupingBase: Seq[Option[Attribute]] =
      grouping.map(g => resolve.get(g.exprId))
    if (groupingBase.exists(b => b.isEmpty || !partCols.contains(b.get.name)))
      return None
    if (grouping.isEmpty) {
      idx.completeStats.flatMap { st =>
        val values = aggExprs.map(evalFromStats(_, st, Map.empty, resolve))
        if (values.forall(_.isDefined))
          Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
        else None
      }
    } else {
      idx.statsByPartitionValues.flatMap { perDir =>
        // project each partition dir's values onto the grouping columns,
        // then merge dirs that agree on them (grouping by a PREFIX of the
        // partitioning, e.g. by date over a date/hour layout)
        val gIdx = groupingBase.map(b => partCols.indexOf(b.get.name))
        val merged = perDir
          .groupBy { case (vals, _) => gIdx.map(vals(_)) }
          .toSeq.map { case (key, dirs) => (key, dirs.flatMap(_._2)) }
        val rows = merged.map { case (key, st) =>
          val byId = grouping.zipWithIndex.map { case (g, i) =>
            g.exprId -> key(i)
          }.toMap
          val values = aggExprs.map(evalFromStats(_, st, byId, resolve))
          if (values.forall(_.isDefined))
            Some(InternalRow.fromSeq(values.map(_.get)))
          else None
        }
        if (rows.forall(_.isDefined))
          Some(LocalRelation(agg.output, rows.map(_.get)))
        else None
      }
    }
  }

  /** The graft fast-tier index behind `child` when `child` is the relation
    * under attribute-only projections, PLUS the resolution map from each
    * visible attribute's exprId to the RELATION attribute it carries —
    * aliases resolve through to the underlying column, so every downstream
    * column test matches physical identity, never a projected name.
    */
  private def indexOf(
      child: LogicalPlan): Option[(GraftFileIndex, Map[ExprId, Attribute])] =
    child match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: GraftFileIndex =>
            Some((idx, lr.output.map(a => (a.exprId, a: Attribute)).toMap))
          case _ => None
        }
      case Project(projectList, inner) =>
        indexOf(inner).flatMap { case (idx, innerMap) =>
          val entries = projectList.map {
            case a: AttributeReference =>
              innerMap.get(a.exprId).map(u => a.exprId -> u)
            case al @ Alias(a: AttributeReference, _) =>
              innerMap.get(a.exprId).map(u => al.exprId -> u)
            case _ => None
          }
          if (entries.forall(_.isDefined)) Some((idx, entries.flatten.toMap))
          else None
        }
      case _ => None
    }

  /** `Some(internal value)` when this output expression is answerable from
    * the group's stats (aggregates) or the directory values (grouping keys,
    * matched by exprId).
    */
  private def evalFromStats(e: NamedExpression,
      st: Seq[graft.logs.FileStats.FileStat],
      groupValue: Map[ExprId, Any],
      resolve: Map[ExprId, Attribute]): Option[Any] = {
    def isTimeNs(a: Attribute): Boolean =
      resolve.get(a.exprId).exists(_.name == "time_ns")
    def fromAgg(ae: AggregateExpression): Option[Any] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null => Some(st.map(_.rows).sum)
        case Min(a: Attribute) if isTimeNs(a) =>
          val bounds = st.map(_.minNs)
          if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.min) else None
        case Max(a: Attribute) if isTimeNs(a) =>
          val bounds = st.map(_.maxNs)
          if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.max) else None
        case _ => None
      }
    e match {
      case Alias(ae: AggregateExpression, _) => fromAgg(ae)
      case ae: AggregateExpression => fromAgg(ae)
      case a: AttributeReference if groupValue.contains(a.exprId) =>
        Some(groupValue(a.exprId))
      case Alias(a: AttributeReference, _) if groupValue.contains(a.exprId) =>
        Some(groupValue(a.exprId))
      case _ => None
    }
  }
}
