package graft.queries

import graft.Tables
import graft.logs._
import graft.plans.PlanScans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** x25 — [[graft.plans.GraftMetadataAggregate]] over DATA columns,
  * oracle-gated: grouped `min`/`max` of an ordinary long column (`uid`)
  * and an ASCII string column (`etype`) answered from the per-file
  * [[FileStats.ColStat]] bounds in the commit-time sidecar — ZERO data
  * file I/O, `require()`d to plan without a scan (the Delta/Iceberg
  * stats-only min/max generalized past `time_ns`/partition values). The
  * fail-open side is pinned too: `max(val)` over a DOUBLE column must
  * NOT shortcut (parquet float stats exclude NaN, which Spark orders
  * above everything — a stats max could under-report), so that probe is
  * `require()`d to keep its real scan. DuckDB restates every number from
  * raw `events`, so a mis-merged bound, a wrong-kind parse, or a
  * unit-confused column flips the hash.
  *
  * At 100 TB the point: "per-day id ranges over the whole store" — the
  * data-profiling staple — reads the manifest tier only.
  */
object StoreDataMinMaxQuery {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def run(spark: SparkSession, dir: String): DataFrame = synchronized {
    Tables.memo(memo, dir, spark)(build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = graft.tools.TempRoots.createTempDir("graft-dataminmax")
    val root = work.resolve("lake").toString
    val ev = Tables.events(spark, dir)
    val df = ev.select(
      CriFunctions.nanosToTimestamp(col("ts")).as("time"),
      col("ts").as("time_ns"), lit("stdout").as("stream"),
      lit("F").as("logtag"), col("props").as("message"),
      lit("dev").as("cluster"), lit("ns0").as("namespace"),
      lit("n1").as("node"), lit("p1").as("pod"), lit("app").as("container"),
      col("user_id").as("uid"), col("event_type").as("etype"),
      col("value").as("val"))
      .withColumn("date", date_format(col("time"), "yyyy-MM-dd"))
    LogIngest.writeHive(df, root, partitionCols = Seq("cluster", "namespace", "date"))

    val t = spark.read.format("graft").load(root)
    val grouped = t.groupBy($"date")
      .agg(min($"uid").as("lo_uid"), max($"uid").as("hi_uid"),
        min($"etype").as("lo_et"), max($"etype").as("hi_et"),
        count(lit(1)).as("n_rows"))
    require(PlanScans.scanless(grouped),
      "x25: grouped data-column min/max must be metadata-only")
    // fail-open control: max over a DOUBLE column must keep its scan
    // (NaN makes a stats max unsound), and still answer correctly
    val dmax = t.groupBy().agg(max($"val").as("hi_val"))
    require(!PlanScans.scanless(dmax),
      "x25: double max must fail open to a real scan")
    val dmaxOk = dmax.as[Double].head() == df.agg(max($"val")).as[Double].head()

    grouped.select(
      $"date".cast("string").as("date"), $"lo_uid", $"hi_uid",
      $"lo_et", $"hi_et", $"n_rows",
      lit(dmaxOk).as("double_max_scan_ok"))
      .orderBy($"date")
  }
}
