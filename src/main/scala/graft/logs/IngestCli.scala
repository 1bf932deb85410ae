package graft.logs

import graft.GraftSession

/** Batch-ingestion front end (the `fluent-bit` half of the reference,
  * SURVEY §3.2, as a one-shot batch command):
  *
  * {{{
  * runMain graft.logs.IngestCli --glob=VAR_LOG_PODS_GLOB \
  *   --root=/data/lake --cluster=dev --node=node-a --layout=positional
  * }}}
  * (glob example: `/var/log/pods/STAR/STAR/STAR.log` — literal stars; spelled
  * out here because star-slash ends a Scala comment.)
  */
object IngestCli {
  def main(args: Array[String]): Unit = {
    var glob: Option[String] = None
    var root: Option[String] = None
    var cluster = "default"
    var node = "local-node"
    var layout = "positional"
    var format = "parquet"
    args.foreach {
      case s if s.startsWith("--glob=") => glob = Some(s.drop(7))
      case s if s.startsWith("--root=") => root = Some(s.drop(7))
      case s if s.startsWith("--cluster=") => cluster = s.drop(10)
      case s if s.startsWith("--node=") => node = s.drop(7)
      case s if s.startsWith("--layout=") => layout = s.drop(9)
      case s if s.startsWith("--format=") => format = s.drop(9)
      case other => throw new IllegalArgumentException(s"unknown arg '$other'")
    }
    require(glob.nonEmpty && root.nonEmpty,
      "usage: --glob=GLOB --root=DIR [--cluster=NAME] [--node=NAME] [--layout=positional|hive] [--format=parquet|arrow|both]")
    val spark = GraftSession.local("graft-ingest")
    try {
      val df = LogIngest.readCri(spark, glob.get, cluster, node).cache()
      layout match {
        case "hive" => LogIngest.writeHive(df, root.get)
        case _ =>
          // dual-format store like the reference's two S3 outputs
          // (fluent-bit.conf:32-67): every stream written as parquet AND arrow
          if (format == "parquet" || format == "both")
            LogIngest.writePositional(df, root.get)
          if (format == "arrow" || format == "both")
            graft.sources.ArrowLogWriter.writePositional(df, root.get)
      }
      println(s"[ingest] wrote $layout layout ($format) under ${root.get}")
    } finally spark.stop()
  }
}
