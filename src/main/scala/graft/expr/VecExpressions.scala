package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** JVM-static float-vector kernels shared by interpreted eval and codegen.
  *
  * Tight primitive loops over `ArrayData` — no boxing, no per-element lambda
  * dispatch. This is why these exist instead of composing
  * `aggregate(zip_with(...))`: higher-order functions allocate a lambda frame
  * per element, which at 100 TB × 64-dim is the hot loop.
  */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Sign-matrix (Achlioptas) random projection to `outDim` dims: entry
    * (i,j) of the implicit projection matrix is ±1 from the splitmix64
    * finalizer — the matrix is never materialized, so the projection ships
    * as pure code, deterministic across executors/engines/runs. Preserves
    * inner products in expectation (Johnson-Lindenstrauss); used to shrink
    * embedding payloads before the ANN/near-dup stages — at 100 TB the
    * projected corpus is outDim/dim of the shuffle bytes every downstream
    * stage pays.
    */
  def randomProject(v: ArrayData, outDim: Int, seed: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](outDim)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val h = SketchKernels.mix64(seed ^ (i.toLong * 131071L + j))
        s += (if ((h & 1L) == 0L) v.getFloat(i).toDouble else -v.getFloat(i).toDouble)
        i += 1
      }
      out(j) = (s * inv).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric int8 quantization round-trip check in one pass: quantize with
    * the vector's own max-abs scale (q = round(x·127/maxabs) ∈ [−127,127]),
    * dequantize, and return the worst reconstruction error NORMALIZED by the
    * theoretical half-step bound maxabs/254 — ≤ 1 (+ float noise) iff the
    * quantizer is correct. Int8 payloads are ¼ the bytes of float32 through
    * every downstream shuffle; this kernel is the correctness gate for that
    * compression (v7).
    */
  def int8QuantErr(v: ArrayData): Double = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0.0) return 0.0
    val scale = 127.0 / maxAbs
    val halfStep = maxAbs / 254.0
    var worst = 0.0
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val q = math.round(x * scale).toDouble // in [-127, 127] by construction
      val err = math.abs(x - q / scale)
      if (err > worst) worst = err
      i += 1
    }
    worst / halfStep
  }
}

/** `cosine_sim(array<float>, array<float>) → double`, codegen-enabled. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `dot_product(array<float>, array<float>) → double`, codegen-enabled. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `random_project(array<float>, outDim, seed) → array<float>`, codegen. */
case class RandomProjection(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "random_project"

  override def nullSafeEval(input: Any): Any =
    VecKernels.randomProject(input.asInstanceOf[ArrayData], outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.expr.VecKernels.randomProject($v, $outDim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RandomProjection =
    copy(child = newChild)
}

/** `int8_quant_err(array<float>) → double` (normalized, ≤1 when correct). */
case class Int8QuantError(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_quant_err"

  override def nullSafeEval(input: Any): Any =
    VecKernels.int8QuantErr(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expr.VecKernels.int8QuantErr($v)")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantError =
    copy(child = newChild)
}

object VecFunctions {
  def cosineSim(a: Column, b: Column): Column =
    Compat.column(CosineSimilarity(Compat.expression(a), Compat.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Compat.column(DotProduct(Compat.expression(a), Compat.expression(b)))
  def randomProject(v: Column, outDim: Int, seed: Long): Column =
    Compat.column(RandomProjection(Compat.expression(v), outDim, seed))
  def int8QuantErr(v: Column): Column =
    Compat.column(Int8QuantError(Compat.expression(v)))
}
