package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.logs.CriFunctions

/** Interval (range) count join as a tagged-union RUNNING COUNT — the
  * streaming-engine shape — rather than a pair-producing join.
  *
  * The r11 implementation bucketized time and equi-joined probes against
  * right rows in adjacent buckets: an improvement over the O(|L|·|R|) theta
  * join Spark plans for a raw range predicate (BroadcastNestedLoopJoin),
  * but it still MATERIALIZED every (probe, right-row-in-window) pair before
  * the count — O(|L| · window density), quadratic in event density at a
  * fixed window (sf100 rehearsal: 187 s, 62× for 10× the data).
  *
  * Since the answer is a COUNT, no pair ever needs to exist. With
  * `F(x) = |{ right rows with rt ≤ x }|`, the window count is exactly
  * `F(leftTs) − F(leftTs − window)`. So: tag two zero-weight probe events
  * per left key (at `ts`, sign +1, and at `ts − window`, sign −1), union
  * them with the weight-1 right events, and evaluate F at every probe with
  * one distributed prefix sum — a per-bucket ordered running count plus a
  * bucket-level offset table:
  *
  *  1. shuffle the union on a time bucket; within each bucket one sort +
  *     running `sum(weight)` gives F relative to the bucket start;
  *  2. per-bucket totals (tiny: ~4 buckets per core, width sized from the
  *     observed span — see the width note in [[countInWindow]]) prefix-sum
  *     into absolute offsets — the only global ordering in the plan runs
  *     over bucket aggregates, never events;
  *  3. F(probe) = offset(bucket) + running-in-bucket; the answer is
  *     `Σ sign · F` grouped by left key.
  *
  * Work is O((|L|+|R|) log bucket-size) with ONE event-level shuffle and no
  * term that grows with density² — at 100 TB a hot minute costs one
  * in-bucket sort, not |probes|·|rows| pairs. Bucket arithmetic uses exact
  * integral division (not FP) so boundary rows can never land in the wrong
  * bucket; ties at a probe's exact timestamp sort right-events-first, which
  * is precisely the `rt ≤ x` inclusive bound.
  */
object RangeJoin {

  /** For each left row: the count of right rows with
    * `rightTs ∈ (leftTs - windowUs, leftTs]` (µs domain, non-negative
    * timestamps). Left rows with no matches surface with 0 — the left side
    * is never dropped. Counts are keyed by (id, ts), so duplicate ids (or
    * fully duplicated rows) each receive their own window's count, never a
    * sum across duplicates.
    *
    * NOT a pure plan builder: sizing the buckets runs ONE EAGER Spark job
    * at call time (min/max of the union — an extra scan of both inputs),
    * so this is a batch-only operator; composing it over a streaming
    * DataFrame would throw, and callers that re-derive the span cheaply
    * (column stats, a cached union) can shave the extra scan.
    */
  def countInWindow(left: DataFrame, leftId: String, leftTs: String,
      right: DataFrame, rightTs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val idType = left.schema(leftId).dataType
    // probe events: F evaluated at ts (sign +1) and ts − window (sign −1);
    // zero weight — probes never perturb the running count they read
    val probeEv = left.select(col(leftId), col(leftTs)).distinct()
      .select(col(leftId).as("_pid"), col(leftTs).as("_pts"),
        explode(array(
          struct(col(leftTs).cast("long").as("t"), lit(1).as("sign")),
          struct((col(leftTs) - windowUs).cast("long").as("t"), lit(-1).as("sign")))).as("e"))
      .select(col("_pid"), col("_pts"), col("e.t").as("t"), col("e.sign").as("sign"),
        lit(0L).as("w"), lit(1).as("is_probe"))
    val rightEv = right
      .select(lit(null).cast(idType).as("_pid"),
        lit(null).cast(left.schema(leftTs).dataType).as("_pts"),
        col(rightTs).cast("long").as("t"), lit(0).as("sign"),
        lit(1L).as("w"), lit(0).as("is_probe"))
    val union = rightEv.unionByName(probeEv)
    // The bucket is ONLY a partitioning device — F decomposes over ANY
    // width (per-bucket running count + bucket-prefix offsets), so the
    // width is sized from the observed time span to give ~4 sort tasks
    // per core. Tying it to windowUs (the r12 shape) made parallelism
    // span/window: a dense corpus spanning minutes with a 60 s window ran
    // the in-bucket sorts on FOUR tasks at every sf — 35 s at sf10 AND
    // sf100. One cheap min/max job buys scale-free parallelism; rows are
    // assumed ~uniform in time (a pathological single-bucket spike sorts
    // in one task, the same box it would hash to by window).
    val spark = left.sparkSession
    val statsRow = union.agg(min(col("t")).as("mn"), max(col("t")).as("mx")).head
    if (statsRow.isNullAt(0))
      return left.select(col(leftId), col(leftTs))
        .withColumn("n_in_window", lit(0L))
    val (mn, mx) = (statsRow.getLong(0), statsRow.getLong(1))
    val targetBuckets = spark.sessionState.conf.numShufflePartitions.toLong * 4
    val width = math.max(1L, (mx - mn) / targetBuckets + 1)
    val ev = union
      .withColumn("b", CriFunctions.longDiv(col("t") - mn, width))
    // stage 1: running count within each bucket (right events sort before
    // probes at equal t — the inclusive `rt ≤ x` bound)
    val inBucket = Window.partitionBy(col("b"))
      .orderBy(col("t"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = ev.withColumn("f_rel", sum(col("w")).over(inBucket))
    // stage 2: absolute offsets from per-bucket totals. Probes contribute
    // w=0 rows, so grouping the union (not just right events) keeps every
    // probe-only bucket present in the offset table with the correct prefix.
    // The global window runs over ONE ROW PER OCCUPIED BUCKET — at most
    // ~4 buckets per shuffle partition by the width sizing above, never a
    // function of event count.
    val offsets = ev.groupBy(col("b")).agg(sum(col("w")).as("cnt"))
      .withColumn("off", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("off"))
    // stage 3: F per probe, then Σ sign·F per left key
    val counts = run.filter(col("is_probe") === 1)
      .join(offsets, Seq("b"))
      .groupBy(col("_pid"), col("_pts"))
      .agg(sum(col("sign") * (col("f_rel") + col("off"))).as("n_in_window"))
      .select(col("_pid").as(leftId), col("_pts").as(leftTs), col("n_in_window"))
    left.select(col(leftId), col(leftTs))
      .join(counts, Seq(leftId, leftTs), "left")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
  }
}
