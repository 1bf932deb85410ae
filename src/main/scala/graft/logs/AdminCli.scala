package graft.logs

import graft.GraftSession

/** Operational front end for store maintenance — the engine analogue of the
  * reference deployment's compact/cleanup stage (driven there by scripts
  * around the fluent-bit → S3 pipeline; here each job is a one-shot command
  * or a long-running watcher):
  *
  * {{{
  * runMain graft.logs.AdminCli compact   --root=/data/lake [--max-records=N] [--convert-streaming=true]
  * runMain graft.logs.AdminCli retention --root=/data/lake --cutoff-date=2024-01-01 [--convert-streaming=true]
  * runMain graft.logs.AdminCli finalize  --root=/data/lake --close-events=/data/close
  * runMain graft.logs.AdminCli watch     --root=/data/lake --close-events=/data/close \
  *     --checkpoint=/data/ckpt/finalize [--interval='60 seconds']
  * }}}
  *
  * `compact` rewrites a hive store's partitions into scan-sized files
  * (atomic per-partition swap); `retention` drops partitions older than the
  * cutoff at directory granularity (no data scan); `finalize` consumes
  * pending close events once; `watch` runs the auto-finalize loop until
  * terminated (SIGTERM stops the streaming query cleanly — K6 semantics).
  */
object AdminCli {
  private val usage =
    """usage: AdminCli <compact|retention|finalize|watch> --key=value...
      |  compact   --root=DIR [--max-records=N] [--convert-streaming=true]
      |  retention --root=DIR --cutoff-date=YYYY-MM-DD [--convert-streaming=true]
      |  finalize  --root=DIR --close-events=DIR [--max-records=N]
      |  watch     --root=DIR --close-events=DIR --checkpoint=DIR [--interval=DUR]""".stripMargin

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val cmd = args.head
    val opts = args.tail.map { s =>
      val i = s.indexOf('=')
      require(s.startsWith("--") && i > 2, s"unknown arg '$s'\n$usage")
      s.substring(2, i) -> s.substring(i + 1)
    }.toMap
    def opt(k: String): String =
      opts.getOrElse(k, throw new IllegalArgumentException(s"missing --$k\n$usage"))
    val spark = GraftSession.local("graft-admin")
    try cmd match {
      case "compact" =>
        Compaction.compactHive(spark, opt("root"),
          maxRecordsPerFile = opts.getOrElse("max-records", "4000000").toLong,
          convertStreamingStore = opts.get("convert-streaming").contains("true"))
        println(s"[admin] compacted ${opt("root")}")
      case "retention" =>
        val dropped = Retention.enforceHive(spark, opt("root"), opt("cutoff-date"),
          convertStreamingStore = opts.get("convert-streaming").contains("true"))
        println(s"[admin] dropped ${dropped.size} partitions: ${dropped.mkString(", ")}")
      case "finalize" =>
        val done = StreamFinalize.finalizeClosed(spark, opt("close-events"), opt("root"),
          maxRecordsPerFile = opts.getOrElse("max-records", "4000000").toLong)
        println(s"[admin] finalized ${done.size} streams")
      case "watch" =>
        val q = LogStreamIngest.startAutoFinalize(spark, opt("close-events"),
          opt("root"), opt("checkpoint"),
          triggerInterval = opts.getOrElse("interval", "60 seconds"))
        println(s"[admin] auto-finalize running (trigger ${opts.getOrElse("interval", "60 seconds")})")
        q.awaitTermination()
      case other =>
        throw new IllegalArgumentException(s"unknown command '$other'\n$usage")
    } finally spark.stop()
  }
}
