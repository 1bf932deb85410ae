package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the `ts` normalization seam in [[Tables]]: whatever physical type the
  * testdata generator writes for `events.ts` — int64 TIMESTAMP(NANOS) read as
  * Long under `nanosAsLong`, µs TIMESTAMP, or TIMESTAMP_NTZ — the loader must
  * return the same epoch-nano LongType values. The r7 testdata regeneration
  * flipped nanos→micros and silently broke 21 queries; this spec makes the
  * next such flip fail in exactly one focused place.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one row at a known instant: 2026-08-13T12:34:56.789012 UTC
  private val micros = 1786970096789012L
  private val nanos = micros * 1000L

  private def writeAndLoad(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
    val dir = Files.createTempDirectory("graft-tables").toString
    val base = Seq((1L, 7L, "click", 0.5, "p")).toDF(
      "event_id", "user_id", "event_type", "value", "props")
    writeTs(base).select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == LongType,
      s"ts must load as LongType, got ${out.schema("ts").dataType}")
    out.select($"ts").as[Long].head()
  }

  test("micros TIMESTAMP ts normalizes to epoch-nano Long") {
    val got = writeAndLoad(_.withColumn("ts", timestamp_micros(lit(micros))))
    assert(got == nanos, s"expected $nanos, got $got")
  }

  test("TIMESTAMP_NTZ ts normalizes to epoch-nano Long (UTC wall-clock)") {
    val got = writeAndLoad(
      _.withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType)))
    assert(got == nanos, s"expected $nanos, got $got")
  }

  test("int64 ts passes through untouched") {
    val got = writeAndLoad(_.withColumn("ts", lit(nanos)))
    assert(got == nanos)
  }

  test("unsupported ts type fails loudly, not downstream") {
    val ex = intercept[IllegalStateException] {
      writeAndLoad(_.withColumn("ts", lit("2026-08-13")))
    }
    assert(ex.getMessage.contains("ts"))
  }
}
