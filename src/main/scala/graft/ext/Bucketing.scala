package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned, co-located) tables — the shuffle-elimination
  * technique for repeated large-×-large joins (SURVEY §4 "physical:
  * partitioning"): both sides are written hash-bucketed and sorted on the
  * join key, so Catalyst plans the join with ZERO exchanges — at 100 TB the
  * dominant cost of a fact-fact join is the shuffle, and bucketing pays it
  * once at write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: no Exchange appears
    * in the plan (verify with `.explain`).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
