package graft.queries

import graft.Tables
import graft.logs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x12 — schema evolution (add-column without rewrite) as a self-verifying
  * oracle gate.
  *
  * The canonical training-pipeline motion: annotate an EXISTING corpus with
  * a new column (here `quality`) without rewriting it. The gate drives the
  * real machinery end-to-end on a store built from `events`:
  *   v1  ingest of the OLDER half of the dates (no `quality` anywhere)
  *   v2  [[SchemaEvolution.addColumn]] — metadata-only commit; the gate
  *       verifies it changed ZERO rows via [[GraftStore.rowDiff]]
  *       (`zero_move_ok`; the commit itself also aborts unless the staged
  *       file listing is identical)
  *   v3  atomic append of the NEWER half, each row carrying a physical
  *       `quality` = length(message)
  * The composite read then serves BOTH generations: pre-evolution rows
  * null-backfill `quality`, post-evolution rows read it physically. DuckDB
  * restates the counts and the annotated sum straight from `events`, so a
  * backfill regression (wrong nulls, lost column, double-applied overlay)
  * flips a hashed cell red.
  *
  * Scale: the evolution commit is O(partitions) metadata on a 100 TB store
  * — the alternative this replaces is a full-store rewrite to add
  * 8 bytes/row.
  */
object StoreEvolutionQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-evolve")
    val root = work.resolve("lake").toString
    val parts = Seq("cluster", "namespace", "date")
    val df = Tables.events(spark, dir).select(
      CriFunctions.nanosToTimestamp($"ts").as("time"),
      $"ts".as("time_ns"), lit("stdout").as("stream"), lit("F").as("logtag"),
      $"props".as("message"), lit("dev").as("cluster"),
      lit("ns0").as("namespace"), lit("n1").as("node"),
      lit("p1").as("pod"), lit("app").as("container"))
      .withColumn("date", date_format($"time", "yyyy-MM-dd"))
    val dates = df.select($"date").distinct().as[String].collect().sorted
    require(dates.length > 2, s"fixture too small: ${dates.length} dates")
    val cut = dates(dates.length / 2)

    LogIngest.writeHive(df.filter($"date" < cut), root, partitionCols = parts)
    val v2 = SchemaEvolution.addColumn(spark, root, "quality", "DOUBLE", parts)
    require(v2 == 2, s"evolution committed v$v2, expected v2")
    // metadata-only proof at ROW level: the CDC between the pre- and
    // post-evolution snapshots must be empty
    val zeroMove = GraftStore.rowDiff(spark, root, 1, 2).isEmpty
    LogIngest.writeHive(
      df.filter($"date" >= cut)
        .withColumn("quality", length($"message").cast("double")),
      root, partitionCols = parts)

    val store = GraftStore.readStore(spark, root)
    store.agg(
      count(lit(1)).as("n_total"),
      sum(when($"quality".isNull, 1L).otherwise(0L)).as("n_backfilled"),
      sum(when($"quality".isNotNull, 1L).otherwise(0L)).as("n_annotated"),
      sum(coalesce($"quality", lit(0.0))).as("sum_quality"))
      .withColumn("zero_move_ok", lit(zeroMove))
  }
}
