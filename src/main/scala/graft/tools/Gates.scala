package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

/** Engine-side enforcement of quality-gate columns. Boolean output columns
  * named `*_ok` are the engine's own verified claims (recall, overlap,
  * subset, sketch bounds...). The DuckDB oracle restates them as `TRUE`
  * constants, but it only runs at the driver's correctness scale — r12's
  * d4/d5/v8/v9 recall degradation at sf0.1 was invisible because nothing
  * ENGINE-side ever read the booleans. Verify and Bench both fail a query
  * whose output carries a false (or null) gate at whatever scale they run.
  */
object Gates {

  /** Names of `*_ok` boolean columns that are false or null on any row;
    * empty when all gates hold (or the result carries none). One aggregate
    * job over the already-computed result.
    */
  def violations(df: DataFrame): Seq[String] = {
    val gateCols = df.schema.fields
      .filter(f => f.name.endsWith("_ok") && f.dataType == BooleanType)
      .map(_.name).toSeq
    if (gateCols.isEmpty) return Seq.empty
    val counts = df.agg(
      count(lit(1)).as("_n"),
      gateCols.map(c =>
        sum(when(col(c).isNull || !col(c), 1L).otherwise(0L)).as(c)): _*)
      .collect()(0)
    if (counts.getLong(0) == 0L) Seq.empty // empty result: the rows gate's job
    else gateCols.filter(c => counts.getAs[Long](c) > 0L)
  }
}
