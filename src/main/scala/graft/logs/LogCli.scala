package graft.logs

import graft.GraftSession
import org.apache.spark.sql.DataFrame

/** `y-logcli`-compatible front end (SURVEY §2.13, §3.1; flag grammar at
  * reference y-logcli:20-36):
  *
  * {{{
  * runMain graft.logs.LogCli query '{namespace="qa",pod="x"}' \
  *   --root=/data/logs --since=5m -o table --layout=positional
  * }}}
  *
  * Like the reference echoes its generated SQL (y-logcli:277-279), this echoes
  * the optimized Spark plan after the result.
  */
object LogCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && args.head == "query",
      "usage: query '{selector}' --root=DIR [--since=5m] [-o table|raw|lines|columns] [--layout=positional|hive]")
    var selector = LogSelector.empty
    var since: Option[Long] = None
    var output: LogOutput = LogOutput.Table
    var layout: LogLayout = LogLayout.Positional
    var format: LogFormat = LogFormat.Parquet
    var root: Option[String] = None
    var i = 1
    while (i < args.length) {
      args(i) match {
        case s if s.startsWith("{") => selector = LogSelector.parse(s)
        case s if s.startsWith("--since=") => since = Some(SinceDuration.parseSeconds(s.drop(8)))
        case s if s.startsWith("--root=") => root = Some(s.drop(7))
        case s if s.startsWith("--layout=") =>
          layout = if (s.drop(9) == "hive") LogLayout.Hive else LogLayout.Positional
        case "-o" => i += 1; output = LogOutput.parse(args(i))
        case "-f" => i += 1; format = LogFormat.parse(args(i))
        case other => throw new IllegalArgumentException(s"unknown arg '$other'")
      }
      i += 1
    }
    val spark = GraftSession.local("graft-logcli")
    try {
      val df = LogQuery(selector, since, output, layout, format).dataFrame(spark, root.get)
      render(df, output)
      // plan echo ≙ reference's SQL echo (y-logcli:277-279)
      System.err.println(df.queryExecution.executedPlan.toString())
    } finally spark.stop()
  }

  def render(df: DataFrame, output: LogOutput): Unit = output match {
    case LogOutput.Raw =>
      df.select("message").collect().foreach(r => println(r.getString(0)))
    case LogOutput.Columns =>
      df.drop("time_ns").collect()
        .foreach(r => println(r.toSeq.map(String.valueOf).mkString(" ")))
    case LogOutput.Lines =>
      val cols = df.drop("time_ns").columns
      df.drop("time_ns").collect().foreach { r =>
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
