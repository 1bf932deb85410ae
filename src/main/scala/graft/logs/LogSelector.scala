package graft.logs

/** PromQL-style label-selector language (SURVEY §2 row P1; grammar at
  * reference y-logcli:31, parser y-logcli:83-102): `{namespace="qa",pod="x"}`,
  * equality only, comma = AND. Key set extends the reference's
  * namespace|pod|container with cluster|node (both are path segments, so they
  * prune identically).
  */
final case class LogSelector(labels: Map[String, String]) {
  def get(key: String): Option[String] = labels.get(key)
  def isEmpty: Boolean = labels.isEmpty
}

object LogSelector {
  private val pair = """\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"([^"]*)"\s*""".r

  val empty: LogSelector = LogSelector(Map.empty)

  /** Parse `{k="v",k2="v2"}` (or the bare `k="v",…` body). Throws
    * IllegalArgumentException on malformed input or unknown selector keys —
    * the reference fails fast on bad selectors too (y-logcli exits non-zero).
    */
  def parse(s: String): LogSelector = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) return empty
    val pairs = splitTopLevel(body).map {
      case pair(k, v) =>
        require(LogSchema.selectorKeys.contains(k),
          s"unknown selector key '$k' (allowed: ${LogSchema.selectorKeys.mkString(", ")})")
        k -> v
      case other => throw new IllegalArgumentException(
        s"""malformed selector '$other' (expected key="value")""")
    }
    require(pairs.map(_._1).distinct.size == pairs.size, "duplicate selector key")
    LogSelector(pairs.toMap)
  }

  /** Split on commas that are not inside quoted values. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '"' => inQuote = !inQuote; cur += '"'
      case ',' if !inQuote => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }
}

/** `--since=<n><s|m|h>` duration grammar (SURVEY §2 row P2; reference
  * y-logcli:126-136).
  */
object SinceDuration {
  private val re = """(\d+)([smh])""".r

  def parseSeconds(s: String): Long = s.trim match {
    case re(n, "s") => n.toLong
    case re(n, "m") => n.toLong * 60
    case re(n, "h") => n.toLong * 3600
    case other => throw new IllegalArgumentException(
      s"bad --since '$other' (expected <n><s|m|h>)")
  }
}
