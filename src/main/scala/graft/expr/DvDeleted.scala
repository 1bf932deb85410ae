package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `dv_deleted(file_path, row_position)` — the deletion-vector membership
  * probe ([[graft.logs.DeleteVectors.applyKeep]]'s filter body) as a
  * codegen Catalyst expression: one hash lookup of the row's file in a
  * BROADCAST range table (fetched once per executor, never shipped per
  * task) and a binary search of the position over that file's sorted,
  * non-overlapping `[start, end]` ranges — O(log ranges-of-file) per row,
  * fused into the scan's whole-stage codegen with no boxing (the
  * Scala-UDF ancestor paid ~300 ns/row in Long boxing + encoder
  * round-trips; at 10⁸ rows per 100 TB scan-slice that is the difference
  * between the DV read costing the scan and costing 5× the scan).
  *
  * Keys are [[UTF8String]] so the probe compares the scan's metadata
  * column directly — zero per-row String conversion. The broadcast handle
  * itself serializes with the expression (it is KB-sized); the table rides
  * the block manager.
  */
case class DvDeleted(left: Expression, right: Expression,
    bc: Broadcast[Map[UTF8String, (Array[Long], Array[Long])]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dv_deleted expects (STRING, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_deleted"

  override protected def nullSafeEval(path: Any, pos: Any): Any =
    DvDeleted.contains(bc, path.asInstanceOf[UTF8String],
      pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dvRanges", bc,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (p, x) =>
      s"${ev.value} = graft.expr.DvDeleted.contains($bcRef, $p, $x);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeleted =
    copy(left = newLeft, right = newRight)
}

object DvDeleted {

  /** Generated-code entry point (also the interpreted eval body). */
  def contains(bc: Broadcast[_], path: UTF8String, pos: Long): Boolean =
    bc.value.asInstanceOf[Map[UTF8String, (Array[Long], Array[Long])]]
      .get(path) match {
      case Some((starts, ends)) =>
        var lo = 0
        var hi = starts.length - 1
        var hit = false
        while (lo <= hi && !hit) {
          val mid = (lo + hi) >>> 1
          if (pos < starts(mid)) hi = mid - 1
          else if (pos > ends(mid)) lo = mid + 1
          else hit = true
        }
        hit
      case None => false
    }
}
