package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 "physical: spill/shuffle" at scale).
  *
  * AQE's skew-join splitting handles JOIN skew at runtime; what it cannot fix
  * is a skewed *aggregation with non-decomposable state* — e.g. exact
  * count-distinct per key, where one hot key (a pod flooding identical lines,
  * one dominant namespace) funnels its entire value stream through a single
  * reducer. The classic fix is two-phase salting: shard the hot key's values
  * over `salt` sub-keys, aggregate partially per shard, then merge shards.
  */
object Skew {

  /** Exact distinct-count per key, salted: phase 1 deduplicates (key, value)
    * within `salt` shards, phase 2 sums shard counts. The widest shuffle
    * carries each distinct value once per shard-local dedupe — the hot key's
    * reducer work is divided by `salt`.
    */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame = {
    val shard = pmod(xxhash64(col(valueCol)), lit(salt)).as("__shard")
    df.select(keyCols.map(col) :+ col(valueCol) :+ shard: _*)
      .groupBy(keyCols.map(col) :+ col("__shard"): _*)
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
