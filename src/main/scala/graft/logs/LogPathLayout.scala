package graft.logs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's positional object-key layout (SURVEY §1.3; reference
  * y-logcli:5, k3d-example/fluentbit/fluent-bit.conf:45,67):
  *
  * {{{
  * <root>/<cluster>/<namespace>/YYYY/MM/DD/<node>/<pod>/<container>/HH/MM/<uuid>.<ext>
  * }}}
  *
  * Positional (NOT hive `k=v`) — the reference documents why at
  * fluent-bit.conf:62-66 and states the contract: consumers reconstruct
  * namespace/pod/container from the path at query time (y-logcli:138-143).
  *
  * This object is the single source of truth for segment indices — the
  * reference hard-codes 5/9/10/11 (y-logcli:139-143); we compute them from the
  * layout so a layout change cannot silently desync the readers.
  */
object LogPathLayout {

  /** Segment names after the root, in order. `date*` are the event-date parts,
    * `file` the uuid.ext leaf.
    */
  val segments: Seq[String] =
    Seq("cluster", "namespace", "year", "month", "day", "node", "pod",
      "container", "hour", "minute", "file")

  /** 1-based index of a segment counted from the END of the path (robust to
    * how many leading segments the filesystem root contributes — the
    * reference's 1-based-from-start indices 5/9/10/11 only work because its
    * S3 url depth is fixed; counting from the leaf is depth-independent).
    */
  def indexFromEnd(segment: String): Int = segments.size - segments.indexOf(segment)

  /** Extract one path-carried column from a full file path (SURVEY §2 row P4).
    * Negative `element_at` indexes from the end — no root-depth math at all.
    */
  def pathColumn(filePath: Column, segment: String): Column =
    element_at(split(filePath, "/"), -indexFromEnd(segment))

  /** All five label columns + date/hour derived from a path column. */
  def withPathColumns(filePath: Column): Seq[(String, Column)] =
    Seq("cluster", "namespace", "node", "pod", "container").map(s => s -> pathColumn(filePath, s)) ++
      Seq(
        "date" -> concat_ws("-", pathColumn(filePath, "year"),
          pathColumn(filePath, "month"), pathColumn(filePath, "day")),
        "hour" -> pathColumn(filePath, "hour")
      )

  /** Render a full positional key. */
  def renderPath(root: String, cluster: String, namespace: String, year: String,
      month: String, day: String, node: String, pod: String, container: String,
      hour: String, minute: String, fileName: String): String =
    Seq(root.stripSuffix("/"), cluster, namespace, year, month, day, node, pod,
      container, hour, minute, fileName).mkString("/")

  /** Partition-pruning glob — the port of the reference's `build_s3_path`
    * (y-logcli:106-123): a namespace selector substitutes its path segment; a
    * pod or container selector forces the deep fixed-arity glob so the listing
    * never descends into non-matching pods. This string-level pruning is the
    * reference's whole optimizer (SURVEY §4) and is what keeps a 100 TB
    * listing tractable: the object store only lists prefixes that can match.
    */
  def buildGlob(root: String, selectors: Map[String, String], ext: String): String = {
    val cluster = selectors.getOrElse("cluster", "*")
    val ns = selectors.getOrElse("namespace", "*")
    val deep = selectors.contains("pod") || selectors.contains("container") ||
      selectors.contains("node")
    if (deep) {
      val node = selectors.getOrElse("node", "*")
      val pod = selectors.getOrElse("pod", "*")
      val container = selectors.getOrElse("container", "*")
      s"${root.stripSuffix("/")}/$cluster/$ns/*/*/*/$node/$pod/$container/*/*/*.$ext"
    } else {
      s"${root.stripSuffix("/")}/$cluster/$ns/*/*/*/*/*/*/*/*/*.$ext"
    }
  }
}
