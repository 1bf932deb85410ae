package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table per row: `bpe_encode(text) →
  * array<string>` of subword tokens (whitespace-tokenize, then the merge
  * list in rank order per word — the standard application order).
  *
  * The merge table rides inside the expression the same way
  * [[NearestCentroids]] carries its centroids: serialized with the plan,
  * shipped once per task, applied in a tight loop under whole-stage codegen
  * via a static kernel — tokenization of a 100 TB corpus with a learned
  * vocab stays map-only with zero join or UDF overhead.
  */
object BpeKernels {
  /** merges(i) = Array(left, right); applied in index (rank) order. */
  def encode(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val words = text.toString.split(' ')
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = graft.ext.Bpe.codePointSyms(word)
        var m = 0
        while (m < merges.length) {
          syms = graft.ext.Bpe.applyMerge(syms, merges(m)(0), merges(m)(1))
          m += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `merges` is a Seq (not an Array) on purpose: case-class equality over an
  * Array field is reference-based, which would make semantically identical
  * expressions never compare/canonicalize equal — subexpression elimination
  * and plan-cache reuse would silently miss. The kernel's Array shape is
  * materialized once per expression instance.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeKernels.encode(input.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, v => s"graft.expr.BpeKernels.encode($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeFunctions {
  def bpeEncode(text: Column, merges: Seq[graft.ext.Bpe.Merge]): Column =
    Compat.column(BpeEncode(Compat.expression(text),
      merges.sortBy(_.rank).map(m => (m.left, m.right))))
}
