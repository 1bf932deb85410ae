package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hints.
  *
  * A bare `broadcast(df)` is a COMMAND, not a hint: Spark ships the frame
  * to every executor regardless of size, so a side that grows with the
  * data is a guaranteed driver/executor OOM once the corpus outruns the
  * author's assumption (the round-10 t13 lesson: a "vocabulary" broadcast
  * is corpus-growing). The guard checks the optimizer's size estimate and
  * applies the hint only under a byte cap; above it the join falls back to
  * the planner — and AQE still broadcasts AT RUNTIME when the actual
  * (post-filter) size is small, which is the right call exactly when the
  * static estimate was pessimistic (un-costed filters keep the child's
  * full size estimate).
  *
  * SURVEY §7.11 inventories every forced broadcast in the engine with its
  * bound; sites whose side is STRUCTURALLY bounded (1-row scalars, top-K
  * results, query sets, codebooks) keep the bare hint.
  */
object Hints {

  /** Hard default: a dimension over this estimate is not hinted. 256 MB —
    * well past any sane `autoBroadcastJoinThreshold`, well short of an
    * executor heap; override with `graft.broadcast.maxBytes`.
    *
    * The force is sized for joins whose PROBE side is full-fact-scale,
    * where even a ~100 MB single-threaded driver build beats shuffling the
    * fact table (measured: a3's 2M-row part broadcast vs a second 60M-row
    * shuffle, 4 s vs 49 s at the 100× rehearsal). When the fact side is
    * already filtered to a sliver (q14's one-month window), don't call this
    * at all — a plain join lets AQE broadcast at runtime if either side is
    * actually small, and shuffle two small sides otherwise (r13 measured
    * the forced 2M-row build at +0.5 s over that).
    */
  val DefaultMaxBroadcastBytes: Long = 256L << 20

  /** `broadcast(df)` when the optimizer's size estimate is under the cap,
    * `df` untouched otherwise.
    */
  def dimBroadcast(df: DataFrame): DataFrame = {
    val cap = df.sparkSession.conf
      .getOption("graft.broadcast.maxBytes").map(_.toLong)
      .getOrElse(DefaultMaxBroadcastBytes)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= cap) broadcast(df) else df
  }
}
