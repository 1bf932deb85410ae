package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data pipelines.
  *
  * Scale design: pure map-side arithmetic on the id — no shuffle, no RNG
  * state, bit-reproducible across runs, engines, and cluster sizes (the
  * property `rand()` cannot give: Spark seeds it per partition, so adding an
  * executor reshuffles the sample; a hash of the id never moves). The bucket
  * is multiplicative (Fibonacci) hashing in a 16-bit domain, so every
  * intermediate fits comfortably in any engine's 64-bit integer — the same
  * expression runs verbatim in the DuckDB oracle.
  */
object Sampling {

  /** Pseudo-random bucket in [0, 65536) derived from an integral id. `abs`
    * first: Spark's `pmod` is non-negative but plain SQL `%` is
    * sign-preserving, so without it a negative id (e.g. an xxhash64-derived
    * one) would bucket differently in this engine than in the oracle's
    * arithmetic. (Long.MinValue is the one id abs cannot normalize.)
    */
  def bucket(id: Column): Column =
    pmod(pmod(abs(id), lit(65536L)) * lit(40503L), lit(65536L))

  /** Keep ~`fraction` of rows, chosen deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(bucket(col(idCol)) < math.round(fraction * 65536).toInt)
  }

  /** Assign every row a stable train/val split (`valFraction` to "val"). A
    * row's split never changes when the dataset grows — the holdout stays a
    * holdout across pipeline re-runs.
    */
  def trainValSplit(df: DataFrame, idCol: String, valFraction: Double): DataFrame = {
    require(valFraction >= 0 && valFraction <= 1, s"valFraction $valFraction out of [0,1]")
    df.withColumn("split",
      when(bucket(col(idCol)) < math.round(valFraction * 65536).toInt, "val")
        .otherwise("train"))
  }

  /** Per-stratum sampling fractions (e.g. downsample web-crawled text,
    * keep all books). Strata missing from `fractions` keep `default`.
    * The fractions ride in a `when` chain — map-side only, no join.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 1.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * 65536).toInt)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, math.round(f * 65536).toInt).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < threshold)
  }

  /** Budget-driven mixture sampling: given per-source target WEIGHTS and a
    * total token BUDGET, derive each source's keep-fraction from its actual
    * token mass and sample deterministically — the "data mixture" step of a
    * training-data pipeline (e.g. 40% books, 20% code, the rest web), where
    * the inputs' sizes are discovered, not configured.
    *
    * `f_s = min(1, weight_s · budget / tokens_s)`, applied as a hash-bucket
    * threshold `floor(f_s · 65536)` (floor, not round — both engines floor
    * identically, so the oracle restates the exact threshold). Sources whose
    * target exceeds their actual mass keep everything (f=1) — upweighting
    * beyond 1× (epoch repetition) is an export-time concern, not a filter.
    *
    * Scale shape: one tiny per-stratum aggregate (rows = #sources), BROADCAST
    * back onto the corpus — no driver collect, no second corpus shuffle; the
    * filter itself is map-side bucket arithmetic.
    */
  def tokenBudgetMixture(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, weights: Map[String, Double], defaultWeight: Double,
      budgetTokens: Double): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens must be positive")
    val tot = df.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).cast("long").as("stratum_tokens"))
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (s, wt)) => when(col(strataCol) === s, wt).otherwise(acc)
    }
    val thr = floor(least(lit(1.0),
        (w * lit(budgetTokens)) / col("stratum_tokens")) * lit(65536.0)).cast("long")
    // strata counts are usually a handful of mixture domains, but the
    // stratum column's cardinality is caller-chosen — size-guard the hint
    df.join(graft.plans.Hints.dimBroadcast(tot), strataCol)
      .withColumn("mix_threshold", thr)
      .filter(bucket(col(idCol)) < col("mix_threshold"))
  }

  /** Stable shard assignment for training export: shard = hash-bucket mod
    * `nShards`. A row's shard never changes as the dataset grows (same
    * property as [[trainValSplit]]), so incremental exports append to the
    * same shard a re-export would choose.
    */
  def withShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    df.withColumn("shard_id", pmod(bucket(col(idCol)), lit(nShards.toLong)))
  }

  /** Export rows into `nShards` deterministic shards under `path`
    * (`shard_id=K/` hive dirs) and return the manifest (per-shard row
    * count). Repartition on the shard column first: without it every task
    * writes every shard dir — the small-file storm the hive writer always
    * has (see LogIngest.writeHive). The manifest is deliberately computed
    * by re-reading the WRITTEN files, not the input frame: an export
    * manifest must describe what actually landed on disk (write
    * verification), at the cost of one extra scan of the export.
    */
  def exportShards(df: DataFrame, idCol: String, path: String,
      nShards: Int): DataFrame = {
    val sharded = withShard(df, idCol, nShards)
    sharded.repartition(col("shard_id"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(path)
    sharded.sparkSession.read.parquet(path)
      .groupBy(col("shard_id")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("shard_id"))
  }
}
