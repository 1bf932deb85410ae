package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import graft.expr.{Compat, CriTimestampNanos}

/** Column-level functions for CRI log lines (SURVEY §2 rows S2, P6; reference
  * parser semantics at k3d-example/fluentbit/fluent-bit.conf:11,23-24).
  *
  * All functions are built from codegen'd `org.apache.spark.sql.functions`
  * plus one custom codegen expression ([[CriTimestampNanos]]) — no Scala UDFs
  * in the hot path.
  */
object CriFunctions {

  /** CRI line grammar: `<rfc3339-ns-ts> <stream> <logtag> <message>`.
    * Split-with-limit beats 4 regex extractions: one pass, message keeps all
    * embedded spaces. Returns a struct column `(time_str, stream, logtag,
    * message)`; invalid lines yield null fields.
    */
  def parseCriLine(line: Column): Column = {
    // One-pass codegen splitter (graft.expr.CriLineSplit): the regex
    // `split(value, " ", 4)` it replaces sat under `when(ok, ...)`
    // conditionals, which block whole-stage codegen's subexpression
    // elimination — the split ran per FIELD reference, dominating ingest
    // parse cost. The kernel returns null for non-CRI lines, so the field
    // projections below are unconditional and the splitter runs once.
    val parts = Compat.column(graft.expr.CriLineSplit(Compat.expression(line)))
    struct(
      element_at(parts, 1).as("time_str"),
      element_at(parts, 2).as("stream"),
      element_at(parts, 3).as("logtag"),
      element_at(parts, 4).as("message")
    )
  }

  /** RFC3339-ns string → epoch nanos (lossless; custom codegen expression). */
  def criTimeNanos(timeStr: Column): Column = CriTimestampNanos(timeStr)

  /** Exact integral division on longs. `col / n` would go through double
    * division — at epoch-nano magnitudes (~1.7e18) the quotient's ulp is
    * ~0.25, so `floor(ns / 1000.0)` can be off by one microsecond. DIV is
    * exact.
    */
  def longDiv(c: Column, divisor: Long): Column =
    Compat.column(IntegralDivide(Compat.expression(c),
      Literal(divisor), evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /** Epoch nanos → epoch micros (exact truncation). */
  def nanosToMicros(timeNs: Column): Column = longDiv(timeNs, 1000L)

  /** Epoch nanos → µs TimestampType (truncation; pruning/windows/intervals). */
  def nanosToTimestamp(timeNs: Column): Column =
    timestamp_micros(nanosToMicros(timeNs))

  /** Nanosecond ISO-8601 render (SURVEY §2 row P6; reference y-logcli:173-179
    * NS_TIME_FMT): `YYYY-MM-DDTHH:MM:SS.nnnnnnnnnZ` built from the lossless
    * nano column, not the µs timestamp.
    */
  def nsIso8601(timeNs: Column): Column = concat(
    date_format(timestamp_seconds(longDiv(timeNs, 1000000000L)),
      "yyyy-MM-dd'T'HH:mm:ss"),
    lit("."),
    lpad(pmod(timeNs, lit(1000000000L)).cast("string"), 9, "0"),
    lit("Z")
  )

  /** Microsecond ISO-8601 render (`…SS.uuuuuuZ`) from an epoch-micros long —
    * the precision ceiling of external µs readers (DuckDB truncates parquet
    * TIMESTAMP(NANOS) to µs, as does Spark's own TimestampType).
    */
  def usIso8601(timeUs: Column): Column = concat(
    date_format(timestamp_micros(timeUs), "yyyy-MM-dd'T'HH:mm:ss"),
    lit("."),
    lpad(pmod(timeUs, lit(1000000L)).cast("string"), 6, "0"),
    lit("Z")
  )

  /** Expand a raw CRI text DataFrame (column `value`, plus caller-provided
    * path columns) into the canonical data columns. Drops lines that fail the
    * CRI grammar or timestamp parse — mirroring fluent-bit, which discards
    * unparseable lines rather than aborting the pipeline.
    */
  def parsed(raw: DataFrame, clusterName: String): DataFrame = {
    raw
      .withColumn("cri", parseCriLine(col("value")))
      .withColumn("time_ns", criTimeNanos(col("cri.time_str")))
      .filter(col("time_ns").isNotNull)
      .withColumn("time", nanosToTimestamp(col("time_ns")))
      .withColumn("stream", col("cri.stream"))
      .withColumn("logtag", col("cri.logtag"))
      .withColumn("message", col("cri.message"))
      .withColumn("cluster", lit(clusterName))
      .drop("cri", "value")
  }
}
