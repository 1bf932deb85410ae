package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.logs.CriFunctions

/** Bucketized interval (range) join: match right rows whose timestamp falls
  * in `(left.ts - window, left.ts]` without the O(|L|·|R|) theta join a raw
  * range predicate plans as (BroadcastNestedLoopJoin — the classic Spark
  * scale-killer).
  *
  * Scale design: time is bucketed at `window` granularity; every right row
  * lands in exactly one bucket and every left row probes its own bucket and
  * the previous one (two narrow probe rows via explode), so the range
  * predicate becomes an equi-join on the bucket id plus an exact residual
  * filter — the same shape streaming engines use for interval joins. Work
  * is O(|L| + |R| + |matches|) with a plain hash shuffle on the bucket id.
  * Bucket arithmetic uses exact integral division (not FP) so boundary rows
  * can never land in the wrong bucket.
  */
object RangeJoin {

  /** For each left row: the count of right rows with
    * `rightTs ∈ (leftTs - windowUs, leftTs]` (µs domain). Left rows with no
    * matches surface with 0 — the left side is never dropped. Counts are
    * keyed by (id, ts), so duplicate ids (or fully duplicated rows) each
    * receive their own window's count, never a sum across duplicates.
    */
  def countInWindow(left: DataFrame, leftId: String, leftTs: String,
      right: DataFrame, rightTs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val lb = CriFunctions.longDiv(col(leftTs), windowUs)
    val probes = left.select(col(leftId), col(leftTs)).distinct()
      .withColumn("pb", explode(array(lb, lb - 1)))
    val r = right.select(col(rightTs).as("rt"))
      .withColumn("rb", CriFunctions.longDiv(col("rt"), windowUs))
    val counts = probes.join(r, col("pb") === col("rb"))
      .filter(col("rt") > col(leftTs) - windowUs && col("rt") <= col(leftTs))
      .groupBy(col(leftId), col(leftTs)).agg(count(lit(1)).as("n_in_window"))
    left.select(col(leftId), col(leftTs))
      .join(counts, Seq(leftId, leftTs), "left")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
  }
}
