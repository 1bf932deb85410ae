package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity operators (SURVEY §2) exercised over the driver's
  * `events` table — the log-shaped fixture (nanosecond timestamps, a
  * low-cardinality label column, an opaque payload). Each query has a DuckDB
  * oracle in [[graft.SparkEntry.oracleSql]].
  *
  * `ts` is epoch-nanos Long end to end (SURVEY §7.4); oracles use
  * `epoch_ns(ts)`.
  */
object LogParityQueries {

  /** S6 + P3: scan → filter → project (filter and projection both reach the
    * parquet reader: PushedFilters + ReadSchema).
    */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error" && col("value") > 100.0)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** P2: time-range predicate on the nano column (row-group stats prune). */
  def sinceFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= LogParityQueries.sinceCutoffNs)
      .select(col("event_id"), CriFunctions.nanosToMicros(col("ts")).as("time_us"))
      .orderBy(col("event_id"))

  /** 2024-01-25T00:00:00Z — inside the events table's 2024-01 range. */
  val sinceCutoffNs: Long = 1706140800000000000L

  /** P1: conjunctive equality selectors (the label-selector semantics). */
  def selectorConjunction(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") === 13 && col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  /** P3+P5+P6: output-mode projection — ns ISO-8601 render + left(payload,8). */
  def outputColumns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        CriFunctions.usIso8601(CriFunctions.nanosToMicros(col("ts"))).as("time_iso"),
        col("event_type"),
        substring(col("props"), 1, 8).as("msg_left"))
      .orderBy(col("event_id"))

  /** O1: global sort by event time (range-partitioned exchange). */
  def orderByTime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), CriFunctions.nanosToMicros(col("ts")).as("time_us"),
        col("event_type"))
      .orderBy(col("time_us"), col("event_id"))

  /** O2: top-1 newest (Catalyst rewrites to TakeOrderedAndProject). */
  def top1Latest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), CriFunctions.nanosToMicros(col("ts")).as("time_us"))
      .orderBy(col("time_us").desc, col("event_id"))
      .limit(1)

  /** A1: count of payload-matching rows (the `grep -c` analogue). */
  def countMatching(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter(col("props").contains("\"k\": 7"))
      .agg(count(lit(1)).as("n"))
  }

  /** A2: DISTINCT over the label column. */
  def distinctTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type")).distinct().orderBy(col("event_type"))

  /** U1: UNION ALL of two scans, globally time-ordered (the `-f both` shape;
    * unionByName ≙ y-logcli:243-255's manual column alignment).
    */
  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), CriFunctions.nanosToMicros(col("ts")).as("time_us"),
        col("event_type"))
    ev.filter(col("event_type") === "click")
      .unionByName(ev.filter(col("event_type") === "error"))
      .orderBy(col("time_us"), col("event_id"))
  }

  /** S2+P6 round-trip: render each event as a CRI log line (ns ISO timestamp,
    * stream, logtag, message), then parse it back with the engine's CRI
    * parser + custom nanosecond-timestamp expression. The oracle reconstructs
    * the same rows directly — so any loss in render→parse (a single
    * nanosecond, a split-eaten space) breaks the hash.
    */
  def criRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // Sort FIRST, on the source columns the output keys are lossless images
    // of (time_us = ts/1000, message = props): a global sort placed above
    // the render→parse chain samples its child for range partitioning and
    // then evaluates it again to sort — paying the whole roundtrip twice.
    // Below the chain it sorts cheap source longs/strings once, and the
    // narrow render→parse maps preserve both partition order and intra-
    // partition order, so the output ordering contract is identical.
    val ev = Tables.events(spark, dir)
      .orderBy(CriFunctions.nanosToMicros(col("ts")), col("props"))
    val lines = ev.select(concat(
      CriFunctions.nsIso8601(col("ts")),
      lit(" "),
      when(pmod(col("event_id"), lit(2)) === 0, "stdout").otherwise("stderr"),
      lit(" F "),
      col("props")).as("value"))
    CriFunctions.parsed(lines, "test-cluster")
      .select(CriFunctions.nanosToMicros(col("time_ns")).as("time_us"),
        col("stream"), col("logtag"), col("message"))
  }

  /** Grouped time-bucket aggregation (SURVEY §7.8's log-analytics extension):
    * events per label per day + exact money sum (decimal pipeline).
    */
  def dailyTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(CriFunctions.nanosToTimestamp(col("ts")), "yyyy-MM-dd"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Analytic window over event time: per-user inter-arrival gap in nanos
    * (lag window function; integer output → exact oracle compare).
    */
  def interArrival(spark: SparkSession, dir: String): DataFrame = {
    // window ordered by the µs-TRUNCATED key (+ unique tie-break): DuckDB
    // reads the ns parquet column at µs precision, so its ORDER BY ts,
    // event_id is (µs, event_id) — ordering by raw ns here would only agree
    // while the data happens to be µs-aligned; this matches the oracle for
    // sub-µs timestamps too
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(CriFunctions.nanosToMicros(col("ts")), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("time_us", CriFunctions.nanosToMicros(col("ts")))
      .withColumn("gap_us", col("time_us") - lag(col("time_us"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** JSON extraction from the opaque payload (SURVEY §1.4's natural
    * extension point: the reference's workload emits JSON inside `message`,
    * workload.yaml:30, but never parses it — the engine does).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("k"))

  /** As-of join (custom point-in-time operator, [[graft.ext.AsofJoin]]): for
    * each error event, the user's most recent click at-or-before it.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.ext.AsofJoin.lastBefore(errors, clicks, Seq("user_id"), "ts")
      .select(col("event_id"), col("user_id"),
        CriFunctions.nanosToMicros(col("ts")).as("time_us"),
        col("right_event_id").as("click_id"),
        CriFunctions.nanosToMicros(col("right_ts")).as("click_time_us"))
      .orderBy(col("event_id"))
  }

  /** Sessionization over the event stream: a new session starts after a
    * >30 min gap; per-user session counts (lag window + conditional sum).
    */
  def sessionization(spark: SparkSession, dir: String): DataFrame = {
    // µs-truncated window order (see interArrival): matches the oracle's
    // effective (µs, event_id) ordering even for sub-µs data; the gap stays
    // in the µs domain so the >30 min threshold sees DuckDB's exact values
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(CriFunctions.nanosToMicros(col("ts")), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("time_us", CriFunctions.nanosToMicros(col("ts")))
      .withColumn("gap_us", col("time_us") - lag(col("time_us"), 1).over(w))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** INTERSECT (set semantics): (user, day) pairs that both clicked and
    * purchased that day. Spark plans this as a left-semi join over distinct
    * rows — no full distinct materialization of either side beyond the
    * aggregate hash. (Keyed by user-day, not user: at any realistic scale
    * every user eventually has every event type, which would degenerate the
    * set op to the full user list.)
    */
  def intersectUsers(spark: SparkSession, dir: String): DataFrame = {
    def side(t: String) = Tables.events(spark, dir)
      .filter(col("event_type") === t)
      .select(col("user_id"),
        date_format(CriFunctions.nanosToTimestamp(col("ts")), "yyyy-MM-dd").as("day"))
    side("click").intersect(side("purchase")).orderBy(col("user_id"), col("day"))
  }

  /** EXCEPT (set semantics): (user, day) pairs with views but no error that
    * day (left-anti join over distinct rows).
    */
  def exceptUsers(spark: SparkSession, dir: String): DataFrame = {
    def side(t: String) = Tables.events(spark, dir)
      .filter(col("event_type") === t)
      .select(col("user_id"),
        date_format(CriFunctions.nanosToTimestamp(col("ts")), "yyyy-MM-dd").as("day"))
    side("view").except(side("error")).orderBy(col("user_id"), col("day"))
  }

  /** Running total per user over event time (cumulative window frame —
    * unbounded preceding to current row; integer outputs → exact compare).
    */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    // µs-truncated window order (see interArrival) for oracle-identical
    // row pairing under sub-µs timestamps
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(CriFunctions.nanosToMicros(col("ts")), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("running_n"))
      .orderBy(col("event_id"))
  }

  /** Pivot: per-day event counts fanned out to one column per type (explicit
    * value list — no extra distinct pass, deterministic column order).
    */
  def pivotDailyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(CriFunctions.nanosToTimestamp(col("ts")), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))
}
