package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011 — the storage/compute layout behind
  * FAISS-style IVF-PQ).
  *
  * A D-dim float vector is split into `m` subspaces of `subDim` dims; each
  * subspace is vector-quantized against its own `ks`-entry codebook, so the
  * vector compresses to `m` BYTES (32× at D=64/m=8 vs float32). Search
  * scores quantized codes against the raw query (asymmetric distance:
  * query stays exact, corpus is reconstructed per-subspace), which keeps
  * recall far above symmetric code-vs-code scoring.
  *
  * The codebook rides inside the expressions flattened to one
  * `float[m·ks·subDim]` (`ctx.addReferenceObj` — shared per task, not per
  * row); entry (mm, j, d) lives at `(mm·ks + j)·subDim + d`. The case
  * classes carry it as an IndexedSeq so structurally identical expressions
  * compare equal (subexpression elimination / plan cache), converting to
  * the primitive array once per task.
  */
object PqKernels {

  /** Per-subspace L2 argmin → one code byte per subspace. Inputs are
    * expected L2-normalized (the ADC score below approximates cosine via
    * inner product). A vector shorter than m·subDim reads as zero-padded.
    */
  def encode(vec: ArrayData, flat: Array[Float], m: Int, ks: Int,
      subDim: Int): Array[Byte] = {
    val dims = vec.numElements()
    val out = new Array[Byte](m)
    var mm = 0
    while (mm < m) {
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        val base = (mm * ks + j) * subDim
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val idx = mm * subDim + d
          val x = if (idx < dims) vec.getFloat(idx).toDouble else 0.0
          val diff = x - flat(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; bestJ = j }
        j += 1
      }
      out(mm) = bestJ.toByte
      mm += 1
    }
    out
  }

  /** Asymmetric inner product: exact query subvectors against the corpus
    * row's reconstructed (codebook-entry) subvectors. On normalized inputs
    * this approximates cosine similarity.
    */
  def adcScore(q: ArrayData, codes: Array[Byte], flat: Array[Float], m: Int,
      ks: Int, subDim: Int): Double = {
    val dims = q.numElements()
    var score = 0.0
    var mm = 0
    val lim = math.min(m, codes.length)
    while (mm < lim) {
      val base = (mm * ks + (codes(mm) & 0xFF)) * subDim
      var d = 0
      while (d < subDim) {
        val idx = mm * subDim + d
        if (idx < dims) score += q.getFloat(idx).toDouble * flat(base + d)
        d += 1
      }
      mm += 1
    }
    score
  }
}

/** `pq_encode(array<float>) → binary` — m code bytes per vector. */
case class PqEncode(child: Expression, codebook: IndexedSeq[Float], m: Int,
    ks: Int, subDim: Int) extends UnaryExpression {
  @transient private lazy val flat: Array[Float] = codebook.toArray
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], flat, m, ks, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqFlat", flat, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.PqKernels.encode($c, $ref, $m, $ks, $subDim)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc_score(array<float>, binary) → double` — asymmetric-distance
  * inner product of an exact query vector against PQ codes.
  */
case class PqAdcScore(left: Expression, right: Expression,
    codebook: IndexedSeq[Float], m: Int, ks: Int, subDim: Int)
    extends BinaryExpression {
  @transient private lazy val flat: Array[Float] = codebook.toArray
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullSafeEval(q: Any, codes: Any): Any =
    PqKernels.adcScore(q.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]],
      flat, m, ks, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqFlat", flat, "float[]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.expr.PqKernels.adcScore($q, $c, $ref, $m, $ks, $subDim)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore = copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, codebook: IndexedSeq[Float], m: Int, ks: Int,
      subDim: Int): Column =
    Compat.column(PqEncode(Compat.expression(vec), codebook, m, ks, subDim))
  def pqAdcScore(queryVec: Column, codes: Column, codebook: IndexedSeq[Float],
      m: Int, ks: Int, subDim: Int): Column =
    Compat.column(PqAdcScore(Compat.expression(queryVec), Compat.expression(codes),
      codebook, m, ks, subDim))
}
