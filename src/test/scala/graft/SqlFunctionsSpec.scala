package graft

import org.apache.spark.sql.SparkSession

/** The custom expressions exposed through the SQL surface (GraftExtensions). */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from spark.sql") {
    GraftExtensions.register(spark)
    Seq(("2024-01-15T10:30:45.123456789Z", "hello world"))
      .toDF("ts_str", "txt").createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT cri_timestamp_nanos(ts_str) AS ns,
        |       poly_hash64(txt) AS fp,
        |       size(word_shingle_hashes(txt, 1)) AS n_shingles,
        |       cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
        |       dot_product(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS dp
        |FROM t""".stripMargin).collect().head
    assert(r.getAs[Long]("ns") == 1705314645123456789L)
    assert(r.getAs[Long]("fp") == graft.expr.HashKernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getAs[Int]("n_shingles") == 2)
    assert(r.getAs[Double]("cs") == 1.0)
    assert(r.getAs[Double]("dp") == 23.0)
  }

  test("builder-time extensions class registers the same functions") {
    // a second session in the same JVM shares the context but gets its own
    // sessionState — the withExtensions path must work standalone
    val s2 = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate().newSession()
    GraftExtensions.register(s2) // newSession drops temp functions; re-register
    val one = s2.sql("SELECT simhash64(array(1L, 2L, 3L)) AS s").collect().head
    assert(one.getAs[Long]("s") != 0L)
  }
}
