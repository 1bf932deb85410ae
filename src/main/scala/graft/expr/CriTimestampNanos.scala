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
    val fast = parseCanonical(s)
    if (fast != null) return fast
    // non-canonical shapes (e.g. no seconds, odd offsets) — full parser
    try {
      val odt = java.time.OffsetDateTime.parse(s.toString)
      java.lang.Long.valueOf(odt.toEpochSecond * 1000000000L + odt.getNano)
    } catch { case _: java.time.format.DateTimeParseException => null }
  }

  /** Zero-allocation fast path for the canonical CRI shape
    * `yyyy-MM-ddTHH:mm:ss[.f{1,9}](Z|±HH:MM)` — the only shape container
    * runtimes emit (RFC3339Nano; the reference parses it with sscanf + manual
    * fractional nanos + timegm, compact_columns.c:18-60). ~20× cheaper than
    * `OffsetDateTime.parse` per line, which matters at ingest volume.
    */
  private def parseCanonical(s: UTF8String): java.lang.Long = {
    val n = s.numBytes()
    if (n < 20) return null
    @inline def d(i: Int): Int = {
      val b = s.getByte(i) - '0'
      if (b < 0 || b > 9) -1 else b
    }
    @inline def sep(i: Int, c: Char): Boolean = s.getByte(i) == c.toByte
    if (!(sep(4, '-') && sep(7, '-') && (sep(10, 'T') || sep(10, 't')) &&
      sep(13, ':') && sep(16, ':'))) return null
    val y4 = d(0); val y3 = d(1); val y2 = d(2); val y1 = d(3)
    val mo2 = d(5); val mo1 = d(6); val dd2 = d(8); val dd1 = d(9)
    val h2 = d(11); val h1 = d(12); val mi2 = d(14); val mi1 = d(15)
    val se2 = d(17); val se1 = d(18)
    if ((y4 | y3 | y2 | y1 | mo2 | mo1 | dd2 | dd1 | h2 | h1 | mi2 | mi1 | se2 | se1) < 0)
      return null
    val year = y4 * 1000 + y3 * 100 + y2 * 10 + y1
    val month = mo2 * 10 + mo1
    val day = dd2 * 10 + dd1
    val hour = h2 * 10 + h1
    val minute = mi2 * 10 + mi1
    val second = se2 * 10 + se1
    // second 60 (leap second) is rejected like java.time's parsers do —
    // the slow path would reject it anyway, and container runtimes' wall
    // clocks smear leap seconds rather than emitting :60
    if (month < 1 || month > 12 || day < 1 ||
      hour > 23 || minute > 59 || second > 59) return null
    // real calendar bounds — '2024-02-30' must be null, not silently
    // normalized by the epoch-day arithmetic into March 1st
    val leap = (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
    val maxDay = month match {
      case 4 | 6 | 9 | 11 => 30
      case 2 => if (leap) 29 else 28
      case _ => 31
    }
    if (day > maxDay) return null
    var i = 19
    var frac = 0L
    if (i < n && s.getByte(i) == '.') {
      i += 1
      var digits = 0
      while (i < n && digits < 10 && d(i) >= 0) {
        frac = frac * 10 + d(i)
        digits += 1
        i += 1
      }
      if (digits == 0 || digits > 9) return null
      var pad = 9 - digits
      while (pad > 0) { frac *= 10; pad -= 1 }
    }
    if (i >= n) return null
    var offsetSec = 0L
    val c = s.getByte(i)
    if (c == 'Z' || c == 'z') {
      if (i != n - 1) return null
    } else if (c == '+' || c == '-') {
      if (i + 5 >= n || !sep(i + 3, ':') || i + 6 != n) return null
      val oh = d(i + 1) * 10 + d(i + 2)
      val om = d(i + 4) * 10 + d(i + 5)
      if (d(i + 1) < 0 || d(i + 2) < 0 || d(i + 4) < 0 || d(i + 5) < 0 ||
        oh > 18 || om > 59) return null
      offsetSec = (oh * 3600L + om * 60L) * (if (c == '-') -1 else 1)
    } else return null
    // days-from-civil (proleptic Gregorian; public-domain Hinnant algorithm)
    val yAdj = if (month <= 2) year - 1 else year
    val era = Math.floorDiv(yAdj, 400)
    val yoe = yAdj - era * 400
    val mp = if (month > 2) month - 3 else month + 9
    val doy = (153 * mp + 2) / 5 + day - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val epochDay = era * 146097L + doe - 719468L
    val sec = epochDay * 86400L + hour * 3600L + minute * 60L + second - offsetSec
    java.lang.Long.valueOf(sec * 1000000000L + frac)
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
