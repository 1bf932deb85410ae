package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming aggregations over the log stream (SURVEY §2.10: the reference
  * computes none — append-only — so these are the engine's extension surface,
  * §7.8: time-bucketed grouped aggs with watermarked state).
  */
object StreamAnalytics {

  /** Tumbling-window counts + exact value sums per key with a watermark
    * bounding state (late rows beyond `watermark` are dropped — the
    * reference's path-time lag has the same effect physically,
    * fluent-bit.conf:45).
    */
  def windowedCounts(stream: DataFrame, eventTime: Column, keyCol: Column,
      windowLength: String, watermark: String): DataFrame =
    stream
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLength), keyCol)
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup: first occurrence per key within the watermark horizon
    * (`dropDuplicatesWithinWatermark` keeps state bounded — the streaming
    * form of [[graft.ext.Dedup.exact]]).
    */
  def dedupStream(stream: DataFrame, eventTime: Column, keyCols: Seq[String],
      watermark: String): DataFrame =
    stream
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Per-key inactivity sessions via session_window — the close-write-flush
    * analogue (reference close-write-flush.patch): a key's session closes
    * after `gap` without events.
    */
  def sessionCounts(stream: DataFrame, eventTime: Column, keyCol: Column,
      gap: String, watermark: String): DataFrame =
    stream
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), keyCol)
      .agg(count(lit(1)).as("n"))

  /** Per-window heavy hitters: the streaming form of
    * [[graft.ext.MisraGries]] — each window's state is one bounded
    * ≤`capacity`-entry summary (merged across partitions/batches by the
    * aggregator's mergeable-summaries rule), never the full token domain.
    * The batch analogue shuffles every distinct token; here the state store
    * holds `capacity` entries per open window, so the trending-tokens query
    * on an unbounded stream runs in fixed memory.
    */
  def windowedHeavyHitters(stream: DataFrame, eventTime: Column,
      tokenCol: Column, windowLength: String, watermark: String,
      capacity: Int): DataFrame = {
    val mg = udaf(new graft.ext.MisraGries(capacity),
      org.apache.spark.sql.Encoders.STRING)
    stream
      .withColumn("event_time", eventTime)
      .withColumn("token", tokenCol)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLength))
      .agg(mg(col("token")).as("hitters"))
  }

  /** Stream-stream interval join (the streaming analogue of
    * [[graft.ext.RangeJoin]]): left rows match right rows with the same key
    * and `r_time ∈ [l_time - before, l_time]`. Both sides carry watermarks
    * and the join condition bounds both times, so Spark can expire join
    * state — without the time bounds a stream-stream join retains every row
    * forever (the state explosion this wrapper exists to prevent). The key
    * equality keeps the join a hash join on key, never a time-only cross.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column,
      before: String, watermark: String): DataFrame = {
    require(keys.nonEmpty, "interval join requires at least one equi-key")
    val l = left.withColumn("l_time", leftTime).withWatermark("l_time", watermark)
    val r0 = right.withColumn("r_time", rightTime).withWatermark("r_time", watermark)
    // rename right key columns so the join condition is unambiguous
    val r = keys.foldLeft(r0)((df, k) => df.withColumnRenamed(k, s"r_$k"))
    val keyCond = keys.map(k => col(k) === col(s"r_$k")).reduce(_ && _)
    l.join(r, keyCond &&
      col("r_time") >= col("l_time") - expr(s"INTERVAL $before") &&
      col("r_time") <= col("l_time"))
  }
}
