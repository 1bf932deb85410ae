package graft.plans

import graft.sources.{GraftFileIndex, GraftFrameRelation}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, BoundReference, ExprId, Expression, Literal, NamedExpression, PlanExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Metadata-only aggregates over `format("graft")` relations — the
  * optimizer-rule twin of the DSv2 `SupportsPushDownAggregates` contract
  * (and of [[graft.logs.MetaTables]]' manual surface): `COUNT(*)` /
  * `MIN`/`MAX` of `time_ns`, of a PARTITION column (`max(date)` — the
  * "how fresh is the store" probe, answered from directory values), or of
  * ANY data column whose per-file [[graft.logs.FileStats.ColStat]] bounds
  * cover the group (`min(uid)`, `max(tag)` — see `dataMinMax`'s gates),
  * globally or GROUPED BY partition columns, collapse to a
  * [[LocalRelation]] computed from the commit-time `_graft_filestats`
  * sidecar — the query answers from manifest-tier metadata with ZERO data
  * file I/O. At 100 TB that is the
  * difference between an instant answer and a full-store scan ("rows per
  * day, whole store" is the canonical ops query), the Iceberg/Delta
  * "stats-only query" play.
  *
  * TWO relation tiers participate:
  *   - the vector-free fast tier ([[GraftFileIndex]] under a
  *     [[HadoopFsRelation]]) — physical row counts ARE logical row counts,
  *     so count and min/max all answer;
  *   - the merge-on-read tier ([[GraftFrameRelation]] carrying
  *     [[graft.sources.GraftDvMeta]]) — the deletes sidecar knows EXACT
  *     per-file deleted counts, so `COUNT = Σ stats.rows − Σ deleted` stays
  *     zero-I/O under live deletion vectors; `MIN`/`MAX` of a DATA column
  *     fail open for any group with deletions (a deleted row may hold the
  *     extreme), while partition-column min/max stay exact — every row of a
  *     dir shares the dir's value, witnessed by LIVE rows only.
  *
  * Safety gates, all conservative:
  *   - only when EVERY snapshot file has a fresh stats line
  *     ([[GraftFileIndex.completeStats]]); one out-of-protocol file
  *     disables the rewrite wholesale (fail open to the real scan);
  *   - grouping keys must be bare partition-column attributes (values come
  *     from directory names, which every file in the dir shares); a
  *     `Filter` participates ONLY when its predicate touches partition
  *     columns alone (then it selects whole directories exactly — every
  *     row in a dir shares the dir's values, so `filter(date >= D).count()`
  *     is still answered with zero I/O, the Delta/Iceberg partition-scoped
  *     stats-count); anything else — a data-column predicate, a
  *     data-column group, DISTINCT, an agg filter, a subquery or
  *     nondeterministic condition — breaks the match and the plan runs
  *     untouched;
  *   - `MIN`/`MAX` only when every file in the group carries the bound (an
  *     all-null `time_ns` file has none, and parquet-style min/max ignore
  *     nulls exactly like the aggregate does on non-empty data).
  */
object GraftMetadataAggregate extends Rule[LogicalPlan] {

  /** One partition dir's answerable metadata: its internal-typed partition
    * values, every file's commit-time stats, and the dir's exact
    * deleted-row total (0 on the vector-free tier).
    */
  private type Dir = (Seq[Any], Seq[graft.logs.FileStats.FileStat], Long)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.forall(_.isInstanceOf[AttributeReference]) =>
      indexOf(child) match {
        case Some((partitionSchema, perDir, resolve, conds)) =>
          rewrite(agg, groupingExprs.map(_.asInstanceOf[AttributeReference]),
            aggExprs, partitionSchema, perDir, resolve, conds).getOrElse(agg)
        case None => agg
      }
  }

  private def rewrite(agg: Aggregate, grouping: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression], partitionSchema: StructType,
      perDirAll: Seq[Dir], resolve: Map[ExprId, Attribute],
      conds: Seq[Expression]): Option[LogicalPlan] = {
    val partCols = partitionSchema.fieldNames.toSeq
    // grouping keys resolve BY exprId to the relation's own attributes —
    // an intervening rename (`select($"node".as("date"))`) resolves to the
    // UNDERLYING column, so it either matches the real partition column or
    // breaks the rewrite; a name match alone would answer from the wrong
    // directory values
    val groupingBase: Seq[Option[Attribute]] =
      grouping.map(g => resolve.get(g.exprId))
    if (groupingBase.exists(b => b.isEmpty || !partCols.contains(b.get.name)))
      return None
    // a Filter joins the shortcut only when it selects whole directories:
    // deterministic, subquery-free, every referenced column a partition
    // column (resolved by exprId, so renames can't smuggle a data column)
    val condsAnswerable = conds.forall { c =>
      c.deterministic &&
        !c.exists(_.isInstanceOf[PlanExpression[_]]) &&
        c.references.forall(a =>
          resolve.get(a.exprId).exists(u => partCols.contains(u.name)))
    }
    if (!condsAnswerable) return None
    val perDir: Seq[Dir] =
      if (conds.isEmpty) perDirAll
      else {
        val bound = conds.reduce(And).transform {
          case a: AttributeReference =>
            val i = partCols.indexOf(resolve(a.exprId).name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        val pred = Predicate.createInterpreted(bound)
        // NULL predicate results drop the dir — exactly a row Filter's
        // semantics, and exact because every row in a dir carries the
        // dir's partition values
        perDirAll.filter { case (vals, _, _) => pred.eval(InternalRow.fromSeq(vals)) }
      }
    if (grouping.isEmpty) {
      val values = aggExprs.map(
        evalFromStats(_, perDir, partCols, Map.empty, resolve))
      if (values.forall(_.isDefined))
        Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get)))))
      else None
    } else {
      // project each partition dir's values onto the grouping columns,
      // then merge dirs that agree on them (grouping by a PREFIX of the
      // partitioning, e.g. by date over a date/hour layout). A group
      // whose files hold zero LIVE rows is DROPPED — a real scan
      // produces no group for it (only the global aggregate reports
      // count=0 over nothing), so a committed zero-row file — or a dir
      // whose rows are all vector-deleted — must not invent a (key, 0)
      // row or a phantom DISTINCT value.
      val gIdx = groupingBase.map(b => partCols.indexOf(b.get.name))
      val merged = perDir
        .groupBy { case (vals, _, _) => gIdx.map(vals(_)) }
        .toSeq.map { case (key, dirs) => (key, dirs) }
        .filter { case (_, dirs) => liveRows(dirs) > 0 }
      val rows = merged.map { case (key, dirs) =>
        val byId = grouping.zipWithIndex.map { case (g, i) =>
          g.exprId -> key(i)
        }.toMap
        val values = aggExprs.map(
          evalFromStats(_, dirs, partCols, byId, resolve))
        if (values.forall(_.isDefined))
          Some(InternalRow.fromSeq(values.map(_.get)))
        else None
      }
      if (rows.forall(_.isDefined))
        Some(LocalRelation(agg.output, rows.map(_.get)))
      else None
    }
  }

  private def liveRows(dirs: Seq[Dir]): Long =
    dirs.map { case (_, st, del) => st.map(_.rows).sum - del }.sum

  /** The graft metadata surface behind `child` when `child` is a graft
    * relation (either tier) under attribute-only projections and filters:
    * the partition schema, the per-dir stats+deleted rows, the resolution
    * map from each visible attribute's exprId to the RELATION attribute it
    * carries — aliases resolve through to the underlying column, so every
    * downstream column test matches physical identity, never a projected
    * name — plus every `Filter` condition met on the way down (the caller
    * decides whether those are answerable; their attributes stay resolvable
    * because inner exprIds are kept in the map alongside projected ones).
    */
  private def indexOf(child: LogicalPlan)
      : Option[(StructType, Seq[Dir], Map[ExprId, Attribute], Seq[Expression])] =
    child match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case idx: GraftFileIndex =>
            idx.statsByPartitionValues.map { perDir =>
              (idx.partitionSchema,
                perDir.map { case (vals, st) => (vals, st, 0L) },
                lr.output.map(a => (a.exprId, a: Attribute)).toMap,
                Seq.empty[Expression])
            }
          case _ => None
        }
      case lr @ LogicalRelation(r: GraftFrameRelation, _, _, _, _) =>
        r.dvMeta.map { m =>
          (m.partitionSchema, m.perDir,
            lr.output.map(a => (a.exprId, a: Attribute)).toMap,
            Seq.empty[Expression])
        }
      case Project(projectList, inner) =>
        indexOf(inner).flatMap { case (ps, perDir, innerMap, conds) =>
          val entries = projectList.map {
            case a: AttributeReference =>
              innerMap.get(a.exprId).map(u => a.exprId -> u)
            case al @ Alias(a: AttributeReference, _) =>
              innerMap.get(a.exprId).map(u => al.exprId -> u)
            case _ => None
          }
          if (entries.forall(_.isDefined))
            Some((ps, perDir, innerMap ++ entries.flatten, conds))
          else None
        }
      case Filter(cond, inner) =>
        indexOf(inner).map { case (ps, perDir, innerMap, conds) =>
          (ps, perDir, innerMap, conds :+ cond)
        }
      case _ => None
    }

  /** `Some(internal value)` when this output expression is answerable from
    * the group's per-dir stats (row aggregates), the directory VALUES
    * themselves (`min`/`max` over a partition column — `max(date)` is the
    * canonical "how fresh is the store" probe, exact from dir names with
    * zero I/O), or the grouping keys (matched by exprId). Scalar
    * expressions AROUND those leaves (`cast(max(date) as string)`,
    * `min(time_ns) div 1000` — CollapseProject folds post-agg projections
    * into the Aggregate, so they arrive here) are handled by substituting
    * each evaluated leaf as a [[Literal]] and constant-folding the rest;
    * any residue (an unanswerable aggregate, a non-grouping column, a
    * nondeterministic call) fails the whole rewrite open.
    *
    * Deletion-vector interaction: `COUNT` subtracts the group's exact
    * deleted total; data-column (incl. `time_ns`) `MIN`/`MAX` answer only
    * for deletion-free groups (a deleted row may hold the extreme);
    * partition-column min/max stay exact with LIVE rows as the witness.
    */
  private def evalFromStats(e: NamedExpression,
      dirs: Seq[Dir],
      partCols: Seq[String],
      groupValue: Map[ExprId, Any],
      resolve: Map[ExprId, Attribute]): Option[Any] = {
    val st = dirs.flatMap(_._2)
    val deleted = dirs.map(_._3).sum
    def isTimeNs(a: Attribute): Boolean =
      resolve.get(a.exprId).exists(_.name == "time_ns")
    /** min/max over a PARTITION column: exact from directory values —
      * restricted to dirs that actually hold LIVE rows (a zero-row file, or
      * a fully-deleted dir, cannot witness a value) with the null partition
      * ignored, exactly the row aggregate's null semantics. Atomic
      * partition types are Comparable in their internal form (Int, Long,
      * UTF8String, date-days).
      */
    def partMinMax(a: Attribute, wantMin: Boolean): Option[Any] =
      resolve.get(a.exprId).map(_.name).filter(partCols.contains).map { n =>
        val i = partCols.indexOf(n)
        val vals = dirs.filter { case (_, s, del) => s.map(_.rows).sum - del > 0 }
          .map(_._1(i)).filter(_ != null)
        if (vals.isEmpty) null
        else {
          val ord = new Ordering[Any] {
            def compare(x: Any, y: Any): Int =
              x.asInstanceOf[Comparable[Any]].compareTo(y)
          }
          if (wantMin) vals.min(ord) else vals.max(ord)
        }
      }
    /** min/max over an arbitrary DATA column, answered from the sidecar's
      * per-column whole-file bounds ([[graft.logs.FileStats.ColStat]]) —
      * the Delta/Iceberg stats-only min/max generalized past `time_ns`.
      * Gates, all fail-open:
      *   - never under live deletions in the group (callers gate on
      *     `deleted == 0` — a deleted row may hold the extreme);
      *   - every rows>0 file in the group must carry the column with the
      *     kind its Spark type expects (a zero-row file witnesses nothing
      *     and is vacuously covered; an all-null-column file has no entry
      *     and correctly disables the shortcut — its nulls don't feed the
      *     aggregate, but a sibling could, and "some file lacks bounds"
      *     must read as "don't know", never as null);
      *   - timestamps are excluded wholesale: a ColStat 'l' raw long is
      *     MICROS or NANOS depending on the writer's logical annotation
      *     and the kind char cannot tell them apart, while TimestampType
      *     literals are always micros;
      *   - floating columns answer MIN only (parquet min/max exclude NaN
      *     and NaN is the LARGEST value under Spark semantics, so a
      *     stats max under-reports; a NaN-free min is exact), and a ±0.0
      *     min fails open (the sign bit of a zero min is not recoverable
      *     from stats text vs what a real scan would return);
      *   - string bounds must be pure ASCII on every file (where parquet's
      *     unsigned-byte ordering, Java's UTF-16 ordering, and Spark's
      *     UTF8String ordering all agree — the same guard the pruning
      *     consumer applies).
      */
    def dataMinMax(a: Attribute, wantMin: Boolean): Option[Any] = {
      import org.apache.spark.sql.types._
      val u = resolve.get(a.exprId).getOrElse(return None)
      if (partCols.contains(u.name)) return None
      val kind: Char = a.dataType match {
        case LongType | IntegerType | ShortType | ByteType | DateType => 'l'
        case DoubleType | FloatType => 'd'
        case StringType => 's'
        case _ => return None // timestamps, decimals, nested: not answerable
      }
      val live = st.filter(_.rows > 0)
      if (live.isEmpty) return Some(null) // zero rows survive: SQL min = null
      val bounds = live.map(_.cols.get(u.name))
      // exact-kind equality is load-bearing for strings: 'S' stats (from a
      // possibly-truncating foreign writer) are valid BOUNDS but their max
      // can be a fabricated string absent from the data — answering
      // max(col) from one would return a value that does not exist. 'S'
      // therefore falls through to a real scan; pruning still uses it.
      if (!bounds.forall(_.exists(_.kind == kind))) return None
      val cs = bounds.map(_.get)
      try kind match {
        case 'l' =>
          val vs = cs.map(c => (if (wantMin) c.min else c.max).toLong)
          val v = if (wantMin) vs.min else vs.max
          a.dataType match {
            case LongType => Some(v)
            case IntegerType | DateType => Some(v.toInt)
            case ShortType => Some(v.toShort)
            case ByteType => Some(v.toByte)
            case _ => None
          }
        case 'd' =>
          if (!wantMin) None
          else {
            val vs = cs.map(_.min.toDouble)
            if (vs.exists(x => x.isNaN || x == 0.0d)) None
            else {
              val v = vs.min
              Some(if (a.dataType == FloatType) v.toFloat else v)
            }
          }
        case _ =>
          if (!cs.forall(c => c.min.forall(_ < 128) && c.max.forall(_ < 128)))
            None
          else {
            val vs = cs.map(c => if (wantMin) c.min else c.max)
            Some(org.apache.spark.unsafe.types.UTF8String.fromString(
              if (wantMin) vs.min else vs.max))
          }
      } catch { case _: NumberFormatException => None }
    }
    def fromAgg(ae: AggregateExpression): Option[Any] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          Some(st.map(_.rows).sum - deleted)
        case Min(a: Attribute) if isTimeNs(a) && deleted == 0 =>
          val bounds = st.map(_.minNs)
          if (bounds.isEmpty) Some(null) // zero rows survive: SQL min = null
          else if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.min)
          else dataMinMax(a, wantMin = true)
        case Max(a: Attribute) if isTimeNs(a) && deleted == 0 =>
          val bounds = st.map(_.maxNs)
          if (bounds.isEmpty) Some(null)
          else if (bounds.forall(_.nonEmpty)) Some(bounds.flatten.max)
          else dataMinMax(a, wantMin = false)
        case Min(a: Attribute) =>
          partMinMax(a, wantMin = true)
            .orElse(if (deleted == 0) dataMinMax(a, wantMin = true) else None)
        case Max(a: Attribute) =>
          partMinMax(a, wantMin = false)
            .orElse(if (deleted == 0) dataMinMax(a, wantMin = false) else None)
        case _ => None
      }
    if (!e.deterministic) return None
    var answerable = true
    val substituted = e.transform {
      case ae: AggregateExpression =>
        fromAgg(ae) match {
          case Some(v) => Literal(v, ae.dataType)
          case None => answerable = false; ae
        }
      case a: AttributeReference if groupValue.contains(a.exprId) =>
        Literal(groupValue(a.exprId), a.dataType)
    }
    val body = substituted match {
      case Alias(c, _) => c
      case other => other
    }
    if (!answerable || body.references.nonEmpty ||
        body.exists(_.isInstanceOf[AggregateExpression])) None
    else scala.util.Try(body.eval(InternalRow.empty)).toOption
  }
}
