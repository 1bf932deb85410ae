package graft.logs

import org.apache.spark.sql.types._

/** Canonical log-record schema (SURVEY §1.2).
  *
  * Columns mirror the reference's Arrow schema (reference
  * images/fluentbit/compact_columns.c:332-375 + k3d-example/fluentbit/
  * fluent-bit.conf:25-28) with the engine's nanosecond design applied
  * (SURVEY §7.4): `time` is a µs TimestampType for pruning/windows/intervals,
  * `time_ns` is the lossless epoch-nano Long that drives ordering and
  * rendering.
  */
object LogSchema {

  /** Data columns stored inside every parquet file. */
  val dataStruct: StructType = StructType(Seq(
    StructField("time", TimestampType),      // µs, truncated — pruning & windows
    StructField("time_ns", LongType),        // lossless epoch nanos — order & render
    StructField("stream", StringType),       // {stdout, stderr}; parquet dict-encodes
    StructField("logtag", StringType),       // {F, P} (CRI full/partial)
    StructField("message", StringType),      // opaque; may contain embedded \n
    StructField("cluster", StringType)       // injected (fluent-bit.conf:25-28)
  ))

  /** Schema physically inside a positional-layout file: everything else —
    * including `cluster` — lives in the path (fluent-bit.conf:66 contract).
    */
  val positionalFileStruct: StructType =
    StructType(dataStruct.fields.filterNot(_.name == "cluster"))

  /** Columns carried by the storage path, not the file (SURVEY §1.3);
    * reconstructed at read time for the positional layout, native partition
    * columns for the hive layout.
    */
  val pathColumns: Seq[String] = Seq("namespace", "node", "pod", "container")

  /** Hive-layout partition spec used by the primary writer. `date`/`hour` are
    * derived from event time; ordering matters — low-cardinality first so the
    * directory fan-out at 100 TB stays listable, and namespace (the top query
    * predicate, y-logcli:106-113) prunes earliest.
    */
  val hivePartitionColumns: Seq[String] = Seq("cluster", "namespace", "date", "hour")

  /** Full logical schema exposed to queries. `pod_id` (Tag_Regex group 3,
    * fluent-bit.conf:12-14) is hive-layout only: the engine's CRI ingest
    * captures it from the pods path as an IN-FILE column (high-cardinality
    * uid — never a partition dir), while the reference's positional layout
    * has no uid segment, so positional reads surface it as null and
    * positional writes drop it to keep reference-format files exact.
    */
  val struct: StructType = StructType(
    dataStruct.fields.toSeq ++
      pathColumns.map(StructField(_, StringType)) ++
      Seq(StructField("pod_id", StringType),
        StructField("date", StringType), StructField("hour", StringType))
  )

  /** Selector surface. `pod_id` selects the pod INCARNATION — two rebirths
    * of one StatefulSet pod name have distinct uids (hive layout; on the
    * positional layout, which records no uid, a pod_id selector matches
    * nothing rather than everything).
    */
  val selectorKeys: Set[String] =
    Set("cluster", "namespace", "node", "pod", "pod_id", "container")

  /** Parquet bloom filters for the hive layout's in-file selector columns.
    *
    * `{pod="x"}` / `{container="y"}` equality (the selector shapes after
    * namespace, y-logcli:83-102) can't be pruned by row-group min/max —
    * pod names are hash-like and uncorrelated with write order, so every
    * row group's [min,max] straddles every probe — and dictionary-page
    * pruning dies exactly when it matters, at high cardinality. A bloom
    * filter keeps O(1)-per-row-group exclusion at any cardinality: at
    * 100 TB a `{pod=...}` query touches ~1/10⁴ of row groups instead of
    * reading all of them. The ndv hints bound filter size (a 10⁶-default
    * bloom is ~1 MB per row group; pods-per-node ~10², containers ~10¹,
    * nodes-per-store ~10³ — sized with headroom). Spark's parquet reader
    * consults blooms through parquet-mr's row-group filter whenever the
    * predicate is pushed (PushedFilters shows the Eq).
    */
  val parquetBloomOptions: Map[String, String] = Map(
    "parquet.bloom.filter.enabled#pod" -> "true",
    "parquet.bloom.filter.expected.ndv#pod" -> "16384",
    "parquet.bloom.filter.enabled#container" -> "true",
    "parquet.bloom.filter.expected.ndv#container" -> "1024",
    "parquet.bloom.filter.enabled#node" -> "true",
    "parquet.bloom.filter.expected.ndv#node" -> "4096")
}
