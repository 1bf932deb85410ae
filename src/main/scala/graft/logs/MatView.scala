package graft.logs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates over a versioned store.
  *
  * The reference's only "view" is the query CLI re-scanning the lake per
  * invocation (`y-logcli:196-261` regenerates the full SQL every run); at
  * 100 TB a dashboard aggregate cannot re-scan the corpus on every refresh.
  * `MatView` keeps a groupBy/agg result table current against a
  * [[GraftStore]] by applying the store's row-level CDC as a signed delta:
  *
  *   refresh cost = O(changed files + |view|), never O(store)
  *
  * [[GraftStore.rowDiff]] already prunes to files whose store-layout key
  * changed between the view's base snapshot and the store head (one
  * partition's worth for a typical append/delete — see its scaladoc), the
  * delta aggregate shuffles only those changed rows, and the merge is an
  * outer join against the view table (aggregate-cardinality, orders of
  * magnitude smaller than the store). This is classic incremental view
  * maintenance (Griffin & Libkin, SIGMOD '95) on Delta/Iceberg-style
  * snapshot CDC.
  *
  * Maintained aggregates are `count(*)` plus LONG-typed sums given as SQL
  * expression strings (stored in the view's metadata, so `refresh` needs no
  * re-statement and cannot drift from `create`). Integer sums make the
  * maintenance EXACT: a full recompute and any sequence of incremental
  * refreshes produce bit-identical tables — doubles would accumulate
  * order-dependent rounding, so fixed-point (`round(value*1000)`-style)
  * expressions are the supported idiom, the same trick exact incremental
  * systems use.
  *
  * The view itself is versioned like a tiny store: each refresh writes a
  * fresh `v%06d` dir (aggregate parquet + metadata) and atomically flips a
  * pointer file — readers mid-scan keep their snapshot, and a crashed
  * refresh leaves the pointer on the old version (the orphan dir is
  * overwritten by the next successful refresh of that version number).
  */
object MatView {

  val PointerName = "_mv_current"
  val MetaName = "_mv_meta"

  /** View definition + base snapshot, stored per view version (TSV, same
    * metadata style as the store's commit records).
    */
  final case class Meta(baseVersion: Int, keys: Seq[String],
      sums: Seq[(String, String)])

  final case class RefreshResult(viewVersion: Int, baseVersion: Int,
      deltaRows: Long, noop: Boolean)

  private def dirOf(viewDir: String, n: Int): String =
    s"$viewDir/${GraftStore.versionPrefix(n)}"

  private def aggregate(df: DataFrame, keys: Seq[String],
      sums: Seq[(String, String)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sums.map { case (name, sql) => sum(expr(sql)).cast("long").as(name) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full first computation at the store's current snapshot → view v1. */
  def create(spark: SparkSession, storeRoot: String, viewDir: String,
      keys: Seq[String], sums: Seq[(String, String)]): Int = {
    require(keys.nonEmpty, "materialized view needs at least one key column")
    MaintenanceLease.withLeaseRetry(spark, viewDir, "matview-create", 10) {
      val base = GraftStore.liveVersionOf(spark, storeRoot)
      val agg = aggregate(GraftStore.readStore(spark, storeRoot), keys, sums)
      publish(spark, viewDir, 1, agg, Meta(base, keys, sums))
      1
    }
  }

  /** Bring the view to the store's current snapshot by delta application.
    * A no-op (pointer-read only) when the store hasn't moved; otherwise the
    * cost is the changed files plus one view-sized outer join — a
    * contents-preserving store commit (compaction) yields an empty delta
    * and the refresh just re-bases.
    */
  def refresh(spark: SparkSession, storeRoot: String,
      viewDir: String): RefreshResult =
    // serialized per VIEW (not per store): a streaming sink's per-batch
    // refresh and an operator's matview-refresh/maintain otherwise race the
    // same staged version dir and the pointer flip — the lease gives the
    // view's commit path the same discipline every store commit already has
    MaintenanceLease.withLeaseRetry(spark, viewDir, "matview-refresh", 10) {
      refreshLocked(spark, storeRoot, viewDir)
    }

  private def refreshLocked(spark: SparkSession, storeRoot: String,
      viewDir: String): RefreshResult = {
    val cur = currentViewVersion(spark, viewDir)
    val meta = readMeta(spark, dirOf(viewDir, cur))
    val head = GraftStore.liveVersionOf(spark, storeRoot)
    if (head == meta.baseVersion)
      return RefreshResult(cur, head, 0L, noop = true)

    // persisted: both the delta aggregate and the audit count consume it,
    // and a rowDiff re-evaluation would re-read the changed files
    val delta = GraftStore.rowDiff(spark, storeRoot, meta.baseVersion, head)
      .persist()
    val sign = when(col("_change") === "added", 1L).otherwise(-1L)
    val dAggs = sum(sign).as("d_n_rows") +: meta.sums.map { case (name, sql) =>
      sum(sign * expr(sql)).cast("long").as(s"d_$name") }
    val dAgg = delta.groupBy(meta.keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)

    val view = readView(spark, viewDir)
    // NULL-SAFE key equality: groupBy treats NULL as a real group, so the
    // merge join must too — a plain USING join would never match the null
    // group and the view's null-key row would fork from its delta forever
    val d = meta.keys.foldLeft(dAgg)((df, k) =>
      df.withColumnRenamed(k, s"__d_$k"))
    val cond = meta.keys.map(k => view(k) <=> d(s"__d_$k")).reduce(_ && _)
    val merged = view.join(d, cond, "full_outer")
      .select(meta.keys.map(k => coalesce(view(k), d(s"__d_$k")).as(k)) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_n_rows"), lit(0L))).as("n_rows")) ++
        meta.sums.map { case (name, _) =>
          (coalesce(col(name), lit(0L)) +
            coalesce(col(s"d_$name"), lit(0L))).as(name) }: _*)
      .filter(col("n_rows") > 0)

    val deltaRows = delta.count()
    try publish(spark, viewDir, cur + 1, merged, meta.copy(baseVersion = head))
    finally delta.unpersist()
    RefreshResult(cur + 1, head, deltaRows, noop = false)
  }

  /** Store version the view is currently based on — the staleness probe
    * ([[graft.logs.Maintenance]] compares it against the live version; a
    * pointer-file read, no data touched).
    */
  def baseVersionOf(spark: SparkSession, viewDir: String): Int =
    readMeta(spark, dirOf(viewDir, currentViewVersion(spark, viewDir))).baseVersion

  /** The view's current aggregate table (snapshot-consistent read). */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(
      s"${dirOf(viewDir, currentViewVersion(spark, viewDir))}/agg")

  def currentViewVersion(spark: SparkSession, viewDir: String): Int = {
    val p = new Path(viewDir, PointerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no materialized view at $viewDir")
    val in = fs.open(p)
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    text.trim.stripPrefix("v").toInt
  }

  /** Stage the new version dir fully (agg parquet + metadata), then flip the
    * pointer — one atomic PUT/rename, the store pointer-tier protocol.
    */
  private def publish(spark: SparkSession, viewDir: String, n: Int,
      agg: DataFrame, meta: Meta): Unit = {
    val vd = dirOf(viewDir, n)
    // the view table is aggregate-sized; one file keeps the refresh join a
    // broadcast and the listing O(1) (repartition(1) would also serialize
    // the UPSTREAM agg — coalesce only narrows the final write)
    agg.coalesce(1).write.mode("overwrite").parquet(s"$vd/agg")
    writeMeta(spark, vd, meta)
    GraftStore.atomicWriteBytes(spark, new Path(viewDir, PointerName),
      GraftStore.versionPrefix(n).getBytes("UTF-8"))
    // reclaim all but the grace snapshot (readers mid-scan on n-1)
    val fs = new Path(viewDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 until n - 1).foreach { old =>
      fs.delete(new Path(dirOf(viewDir, old)), true) }
  }

  private def writeMeta(spark: SparkSession, versionDir: String,
      meta: Meta): Unit = {
    require(meta.keys.forall(k => !k.contains("\t") && !k.contains("\n")),
      "key column names must be TSV-safe")
    require(meta.sums.forall { case (n, s) =>
      !(n + s).contains("\t") && !(n + s).contains("\n") },
      "sum names/expressions must be TSV-safe")
    val lines = s"base\t${meta.baseVersion}" +:
      s"keys\t${meta.keys.mkString(",")}" +:
      meta.sums.map { case (name, sql) => s"sum\t$name\t$sql" }
    GraftStore.atomicWriteBytes(spark, new Path(versionDir, MetaName),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private def readMeta(spark: SparkSession, versionDir: String): Meta = {
    val p = new Path(versionDir, MetaName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    var base = -1
    var keys = Seq.empty[String]
    val sums = Seq.newBuilder[(String, String)]
    text.split('\n').filter(_.nonEmpty).foreach { line =>
      line.split('\t') match {
        case Array("base", v) => base = v.toInt
        case Array("keys", ks) => keys = ks.split(',').toSeq
        case Array("sum", name, sql) => sums += ((name, sql))
        case other => throw new IllegalStateException(
          s"corrupt view metadata line: ${other.mkString("\\t")}")
      }
    }
    require(base >= 0 && keys.nonEmpty, s"corrupt view metadata at $p")
    Meta(base, keys, sums.result())
  }
}
