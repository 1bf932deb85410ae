package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — an operator Spark's DataFrame API lacks
  * (SURVEY §2.4 notes the reference has no joins at all; this is part of the
  * engine's extension surface for event streams).
  *
  * `lastBefore(l, r, keys, t)`: for every left row, the latest right row of
  * the same key with `r.t <= l.t`, or nulls if none.
  *
  * Implementation: the union-and-window pattern, not a range join — both
  * sides are tagged and merged, one shuffle+sort on (key, time, side) orders
  * right rows before left rows at equal times, and a running
  * `last(ignoreNulls)` carries each key's most recent right payload forward.
  * Cost is one exchange + sort of |L|+|R| rows: at 100 TB this is the only
  * shape that avoids the O(|L|·|R|) blowup of an inequality join (Catalyst
  * would plan `l.t >= r.t` as BroadcastNestedLoop) while staying fully
  * parallel per key.
  */
object AsofJoin {

  def lastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightPrefix: String = "right_"): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(keys.contains)
    val rightCols = right.columns.toSeq.filterNot(keys.contains)
    // The whole right row travels as ONE struct through ONE last(ignoreNulls):
    // a per-column last() would blend fields from different right rows
    // whenever a right payload field is genuinely null.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(nullable = true)))
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(timeCol).as("__t"), lit(1).as("__side"),
          lit(null).cast(rStructType).as("__rpayload")) ++
        leftCols.map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(timeCol).as("__t"), lit(0).as("__side"),
          struct(rightCols.map(col): _*).as("__rpayload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right (side 0) sorts before left (side 1) at equal timestamps → the
    // inclusive `r.t <= l.t` semantics of ASOF JOIN
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__rp", last(col("__rpayload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ leftCols.map(col) ++
        rightCols.map(c => col("__rp").getField(c).as(rightPrefix + c)): _*)
  }
}
