package graft

import graft.logs._
import graft.sources.{ArrowIpcSource, ArrowLogWriter}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Arrow IPC dual-format store (SURVEY §1.5, rows S7/K2/U1): same data
  * written as parquet AND Feather-v2-with-ZSTD must read back identically,
  * and `-f both` must union to exactly 2× the rows, still time-ordered.
  */
class ArrowRoundtripSpec extends SparkSpec {
  import spark.implicits._

  lazy val work = Files.createTempDirectory("graft-arrow")

  lazy val store: String = {
    val root = work.resolve("varlog")
    val p = root.resolve("pods/default_web-1_u1/app")
    Files.createDirectories(p)
    Files.writeString(p.resolve("0.log"),
      """2024-01-15T10:30:45.123456789Z stdout F hello arrow
        |2024-01-15T10:30:46.000000000Z stderr P partial  two
        |2024-01-15T10:30:47.999999999Z stdout F third line
        |""".stripMargin)
    val ingested = LogIngest.readCri(spark, root.toString + "/pods/*/*/*.log",
      clusterName = "dev", nodeName = "node-a")
    val lake = work.resolve("lake").toString
    val t = java.time.Instant.parse("2024-02-01T00:00:00Z")
    LogIngest.writePositional(ingested, lake, uploadTime = t)
    ArrowLogWriter.writePositional(ingested, lake, uploadTime = t)
    lake
  }

  test("arrow files land in the positional layout with dict<int8> + zstd") {
    val files = ArrowIpcSource.listFiles(Seq(store + "/dev/default/*/*/*/node-a/web-1/app/*/*/*.arrow"))
    assert(files.size == 1)
    // footer: stream/logtag carry an int8 dictionary encoding
    ArrowIpcSource.withReader(files.head) { r =>
      val fields = r.getVectorSchemaRoot.getSchema.getFields
      val stream = fields.stream.filter(_.getName == "stream").findFirst.get
      assert(stream.getDictionary != null)
      assert(stream.getDictionary.getIndexType.getBitWidth == 8)
    }
  }

  test("arrow scan returns the same rows as parquet scan") {
    def q(f: LogFormat) = LogQuery(output = LogOutput.Lines, format = f)
      .dataFrame(spark, store)
      .select($"time_ns", $"namespace", $"pod", $"container", $"stream", $"logtag", $"message")
    val pq = q(LogFormat.Parquet).collect().toSeq
    val ar = q(LogFormat.Arrow).collect().toSeq
    assert(pq == ar)
    assert(ar.map(_.getLong(0)).toSeq ==
      Seq(1705314645123456789L, 1705314646000000000L, 1705314647999999999L))
  }

  test("-f both unions the two format trees, still time-ordered (U1)") {
    val both = LogQuery(output = LogOutput.Raw, format = LogFormat.Both)
      .dataFrame(spark, store)
    val msgs = both.select("message").as[String].collect().toSeq
    assert(msgs == Seq("hello arrow", "hello arrow", "partial  two", "partial  two",
      "third line", "third line"))
  }

  test("column pruning reaches the arrow scan (projection pushdown)") {
    val df = LogQuery(output = LogOutput.Raw, format = LogFormat.Arrow)
      .dataFrame(spark, store)
      .select($"message")
    val scan = df.queryExecution.executedPlan.toString()
    // the pruned DSv2 scan must not carry the other data columns
    assert(scan.contains("message"))
    assert(!scan.contains("logtag"), s"logtag not pruned:\n${scan.take(1200)}")
    assert(df.count() == 3)
  }

  test("reads the REFERENCE's own compact-stage format (ns timestamps, dict<int8>, zstd)") {
    // fixture generated with pyarrow to the exact schema the reference's C
    // stage emits (compact_columns.c:332-418): timestamp[ns] no-tz +
    // dictionary<int8,utf8> + zstd Feather v2
    val fixture = getClass.getResource("/reference-compact.arrow").getPath
    val df = spark.read.format(classOf[graft.sources.ArrowIpcSource].getName)
      .load(fixture)
    assert(df.schema("time").dataType.typeName == "long") // lossless ns as long
    assert(df.schema("stream").dataType.typeName == "string") // dict surfaces values
    val rows = df.orderBy($"time")
      .select($"time", $"stream", $"logtag", $"message").collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(1705314645123456789L, 1705314646000000000L, 1705314647999999999L))
    assert(rows.map(_.getString(1)).toSeq == Seq("stdout", "stderr", "stdout"))
    assert(rows.map(_.getString(2)).toSeq == Seq("F", "F", "P"))
  }

  test("writeFile encodes null time/stream/logtag/message as Arrow nulls") {
    // writePositional is a public API over arbitrary DataFrames — nulls must
    // become Arrow nulls, not NPEs (ADVICE r1)
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row("dev", "ns", "n1", "p1", "app", null, 1705314645123456789L, "stdout", "F", "msg-a"),
      Row("dev", "ns", "n1", "p1", "app", null, null, null, null, null))
    val f = work.resolve("nulls.arrow").toFile
    ArrowLogWriter.writeFile(rows, f)
    val df = spark.read.format(classOf[ArrowIpcSource].getName).load(f.getPath)
    val got = df.orderBy($"time_ns".desc_nulls_last)
      .select($"time_ns", $"stream", $"logtag", $"message").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1705314645123456789L)
    assert(got(0).getString(1) == "stdout" && got(0).getString(3) == "msg-a")
    assert(got(1).isNullAt(0) && got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
  }

  test("multi-megabyte arrow file round-trips through the chunked channel") {
    // record batches are read into DIRECT buffers via the seekable channel's
    // 1 MB staging loop — a batch body well past the chunk size must arrive
    // intact (bit-exact messages, exact count)
    import org.apache.spark.sql.Row
    // incompressible filler (deterministic LCG) so ZSTD can't shrink the
    // batch body back under the staging chunk size
    def filler(i: Int): String = {
      var x = i * 2654435761L + 1
      val sb = new StringBuilder(2048)
      while (sb.length < 2048) { x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(((x >>> 33) % 94 + 33).toChar) }
      sb.toString
    }
    val rows = (0 until 2000).map { i =>
      Row("dev", "ns", "n1", "p1", "app", null, 1705314645000000000L + i,
        "stdout", "F", s"$i-${filler(i)}")
    }
    val f = work.resolve("big.arrow").toFile
    ArrowLogWriter.writeFile(rows, f)
    assert(f.length() > (1 << 20), s"fixture too small: ${f.length()}")
    val df = spark.read.format(classOf[ArrowIpcSource].getName).load(f.getPath)
    assert(df.count() == 2000)
    val got = df.select($"time_ns", $"message").orderBy($"time_ns").collect()
    assert(got.zipWithIndex.forall { case (r, i) =>
      r.getLong(0) == 1705314645000000000L + i && r.getString(1) == s"$i-${filler(i)}" })
  }

  test("mixed-schema directory raises a clear error (driver check and read-time guard)") {
    import org.apache.spark.sql.Row
    val dir = work.resolve("mixed")
    Files.createDirectories(dir)
    ArrowLogWriter.writeFile(Seq(
      Row("dev", "ns", "n1", "p1", "app", null, 1705314645123456789L, "stdout", "F", "m")),
      dir.resolve("a_log.arrow").toFile)
    // the reference-compact fixture has a different schema (time/stream/logtag/message)
    Files.copy(java.nio.file.Paths.get(getClass.getResource("/reference-compact.arrow").getPath),
      dir.resolve("b_ref.arrow"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format(classOf[ArrowIpcSource].getName).load(dir.toString).schema
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    // with the driver check bounded below the file count, the partition
    // reader must still refuse the mismatched file at execution time
    val lazyRead = spark.read.format(classOf[ArrowIpcSource].getName)
      .option("schemaCheckFiles", "1").load(dir.toString)
    val ex = intercept[Exception] { lazyRead.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("schema mismatch")), messages(ex).mkString(" | "))
  }

  test("selector pruning works on the arrow tree") {
    val none = LogQuery(LogSelector.parse("""{namespace="nope"}"""),
      output = LogOutput.Raw, format = LogFormat.Arrow).dataFrame(spark, store)
    assert(none.count() == 0)
    val hit = LogQuery(LogSelector.parse("""{pod="web-1",container="app"}"""),
      output = LogOutput.Raw, format = LogFormat.Arrow).dataFrame(spark, store)
    assert(hit.count() == 3)
  }
}
