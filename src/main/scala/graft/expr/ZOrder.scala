package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Z-order (Morton) clustering key — the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`: sorting by a bit-interleaved key co-locates rows
  * that are close in EVERY dimension, so per-file/row-group min-max (and
  * bloom) stats stay narrow on all of them at once, where a lexicographic
  * sort keeps only its leading column narrow.
  *
  * Spark-first split: the per-dimension 32-bit ranks are ordinary codegen'd
  * built-ins — `xxhash64` scatter for equality-probed strings (no bounds
  * needed), linear scaling between caller-measured [min, max] bounds for
  * integral columns (the bounds-then-encode shape Delta uses) — and only
  * the bit interleave itself is a custom kernel, a one-child expression
  * over `array<long>`.
  */
object ZOrderKernels {

  /** Interleave the top `64/n` bits of each 32-bit rank, round-robin from
    * the most significant bit. Null ranks read as 0 (nulls cluster first).
    */
  def interleave(ranks: ArrayData): Long = {
    val n = ranks.numElements()
    if (n == 0) return 0L
    // 63 usable bits, NOT 64: a set sign bit would make the key negative
    // and invert the sort order exactly for the upper half of dimension 0
    val bitsPer = math.min(32, 63 / n)
    var out = 0L
    var b = 0
    while (b < bitsPer) {
      var d = 0
      while (d < n) {
        val r = if (ranks.isNullAt(d)) 0L else ranks.getLong(d)
        out = (out << 1) | ((r >>> (31 - b)) & 1L)
        d += 1
      }
      b += 1
    }
    out
  }
}

/** `morton_interleave(array<long>) → long` */
case class MortonInterleave(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"
  override def nullSafeEval(input: Any): Any =
    ZOrderKernels.interleave(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ZOrderKernels.interleave($c)")
  override protected def withNewChildInternal(newChild: Expression): MortonInterleave =
    copy(child = newChild)
}

object ZOrderFunctions {

  /** Unsigned 32-bit rank of one dimension. Strings scatter by hash (they
    * are equality-probed — any stable scatter clusters equal values);
    * integral columns scale linearly inside the measured [min, max].
    */
  def rank32(c: Column, dt: DataType, min: Long, max: Long): Column = dt match {
    case StringType =>
      shiftrightunsigned(xxhash64(c), 32)
    case _ =>
      if (max <= min) lit(0L)
      else {
        val frac = (c.cast("double") - lit(min.toDouble)) /
          lit((max - min).toDouble)
        val clamped = least(greatest(frac, lit(0.0)), lit(1.0))
        (clamped * lit(0xFFFFFFFFL.toDouble)).cast("long")
      }
  }

  /** Morton key over mixed string/integral dimensions; `bounds(i)` is the
    * measured (min, max) of integral dimension i (ignored for strings).
    */
  def zorder64(dims: Seq[(Column, DataType)], bounds: Seq[(Long, Long)]): Column = {
    require(dims.nonEmpty && dims.length == bounds.length,
      "zorder64 needs one (min,max) bound per dimension")
    Compat.column(MortonInterleave(Compat.expression(
      array(dims.zip(bounds).map { case ((c, dt), (mn, mx)) =>
        rank32(c, dt, mn, mx)
      }: _*))))
  }
}
