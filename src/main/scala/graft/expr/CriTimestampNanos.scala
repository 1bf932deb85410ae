package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-static parse helpers shared by interpreted eval and generated code. */
object CriTime {
  /** Parse an RFC3339 timestamp with up-to-nanosecond fraction
    * (`2024-01-15T10:30:45.123456789Z`, offsets allowed) to epoch nanos.
    *
    * The reference's core invariant is lossless nanoseconds end-to-end
    * (reference images/fluentbit/compact_columns.c:18-60 does sscanf + manual
    * fractional-ns + timegm; exact-value tests at
    * images/fluentbit/test_compact_columns.c:305-320). `java.time` parses the
    * same grammar with nano precision.
    *
    * @return epoch nanos, or null when the string is not a valid timestamp
    *         (malformed CRI lines must become null rows, not task failures).
    */
  def parseNanosOrNull(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    try {
      val odt = java.time.OffsetDateTime.parse(s.toString)
      java.lang.Long.valueOf(odt.toEpochSecond * 1000000000L + odt.getNano)
    } catch { case _: java.time.format.DateTimeParseException => null }
  }
}

/** Catalyst expression: CRI/RFC3339 timestamp string → epoch nanoseconds
  * (LongType). Codegen-enabled so CRI parsing stays inside whole-stage
  * codegen on the ingest hot path.
  */
case class CriTimestampNanos(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cri_timestamp_nanos"

  override def nullSafeEval(input: Any): Any =
    CriTime.parseNanosOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("criNanos")
      s"""
         |java.lang.Long $tmp = graft.expr.CriTime.parseNanosOrNull($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CriTimestampNanos =
    copy(child = newChild)
}

object CriTimestampNanos {
  /** Column-API entry point: `cri_timestamp_nanos($"time_str")`. */
  def apply(c: Column): Column = Compat.column(CriTimestampNanos(Compat.expression(c)))
}
