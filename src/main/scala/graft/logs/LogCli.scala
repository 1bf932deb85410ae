package graft.logs

import graft.GraftSession
import org.apache.spark.sql.DataFrame

/** `y-logcli`-compatible front end (SURVEY §2.13, §3.1; flag grammar at
  * reference y-logcli:20-36):
  *
  * {{{
  * runMain graft.logs.LogCli query '{namespace="qa",pod="x"}' \
  *   --root=/data/logs --context=dev --since=5m -o table --layout=positional
  * }}}
  *
  * `--context=<name>` selects the cluster exactly like the reference (the
  * first path segment of the object key, y-logcli:120-122): it becomes a
  * `cluster` selector, so the positional glob prunes at segment 1 and the
  * hive layout prunes on the `cluster=` partition. `-o json` (one JSON
  * object per row) extends the reference's four modes for machine consumers.
  *
  * Like the reference echoes its generated SQL (y-logcli:277-279), this echoes
  * the optimized Spark plan after the result.
  */
object LogCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && args.head == "query",
      "usage: query '{selector}' --root=DIR [--context=cluster] [--since=5m] " +
        "[--limit=N] [-o table|raw|lines|columns|json] [-f parquet|arrow|both] " +
        "[--layout=positional|hive]")
    var selector = LogSelector.empty
    var since: Option[Long] = None
    var output: LogOutput = LogOutput.Table
    var layout: LogLayout = LogLayout.Positional
    var format: LogFormat = LogFormat.Parquet
    var root: Option[String] = None
    var context: Option[String] = None
    var limit: Option[Int] = None
    var i = 1
    while (i < args.length) {
      args(i) match {
        case s if s.startsWith("{") => selector = LogSelector.parse(s)
        case s if s.startsWith("--since=") => since = Some(SinceDuration.parseSeconds(s.drop(8)))
        case s if s.startsWith("--root=") => root = Some(s.drop(7))
        case s if s.startsWith("--context=") => context = Some(s.drop(10))
        case s if s.startsWith("--limit=") => limit = Some(s.drop(8).toInt)
        case s if s.startsWith("--layout=") =>
          layout = if (s.drop(9) == "hive") LogLayout.Hive else LogLayout.Positional
        case "-o" => i += 1; output = LogOutput.parse(args(i))
        case "-f" => i += 1; format = LogFormat.parse(args(i))
        case other => throw new IllegalArgumentException(s"unknown arg '$other'")
      }
      i += 1
    }
    context.foreach { c =>
      require(selector.get("cluster").forall(_ == c),
        s"--context=$c conflicts with selector cluster=${selector.get("cluster").get}")
      selector = LogSelector(selector.labels + ("cluster" -> c))
    }
    val spark = GraftSession.local("graft-logcli")
    try {
      val df0 = LogQuery(selector, since, output, layout, format).dataFrame(spark, root.get)
      // --limit becomes a plan-level limit (TakeOrdered over the time sort),
      // not a render-side truncation
      val df = limit.fold(df0)(df0.limit)
      render(df, output)
      // plan echo ≙ reference's SQL echo (y-logcli:277-279)
      System.err.println(df.queryExecution.executedPlan.toString())
    } finally spark.stop()
  }

  /** Streams rows through `toLocalIterator` (one partition in driver memory
    * at a time, order preserved) — a selector-less `-o raw` over a large
    * store behaves like `kubectl logs`, it does not `collect()` the result.
    */
  def render(df: DataFrame, output: LogOutput): Unit = output match {
    case LogOutput.Raw =>
      df.select("message").toLocalIterator().forEachRemaining(r => println(r.getString(0)))
    case LogOutput.Json =>
      // Spark's JSON writer handles escaping/unicode; time_ns is dropped like
      // the other modes (time_iso carries the lossless ns rendering)
      df.drop("time_ns").toJSON.toLocalIterator().forEachRemaining(println)
    case LogOutput.Columns =>
      df.drop("time_ns").toLocalIterator()
        .forEachRemaining(r => println(r.toSeq.map(String.valueOf).mkString(" ")))
    case LogOutput.Lines =>
      val shown = df.drop("time_ns")
      val cols = shown.columns
      shown.toLocalIterator().forEachRemaining { r =>
        cols.zip(r.toSeq).foreach { case (k, v) => println(s"$k = $v") }
        println()
      }
    case LogOutput.Table =>
      // `-- name: TYPE` header like the reference's DESCRIBE echo (y-logcli:267-273)
      val shown = df.drop("time_ns")
      shown.schema.fields.foreach(f => println(s"-- ${f.name}: ${f.dataType.sql}"))
      shown.show(1000, truncate = false)
  }
}
