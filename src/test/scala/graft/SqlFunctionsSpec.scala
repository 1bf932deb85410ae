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
        |       dot_product(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS dp,
        |       size(random_project(array(1.0F, 2.0F, 3.0F), 8, 42)) AS rp_dim
        |FROM t""".stripMargin).collect().head
    assert(r.getAs[Long]("ns") == 1705314645123456789L)
    assert(r.getAs[Int]("rp_dim") == 8)
    assert(r.getAs[Long]("fp") == graft.expr.HashKernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getAs[Int]("n_shingles") == 2)
    assert(r.getAs[Double]("cs") == 1.0)
    assert(r.getAs[Double]("dp") == 23.0)
  }

  test("GraftExtensions.apply wires every function through injectFunction") {
    // getOrCreate in a shared-JVM suite would silently reuse the existing
    // session and skip extensions — drive the injection API directly instead
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // ExpressionInfo construction + injection
    // and the registered builders must produce working expressions
    val byName = GraftExtensions.functions.toMap
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = byName("cri_timestamp_nanos")(Seq(Literal("2024-01-15T10:30:45.123456789Z")))
    assert(e.eval(null) == 1705314645123456789L)
    val h = byName("hyperplane_bands")(Seq(
      Literal.create(Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)), Literal(4), Literal(2)))
    assert(h.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 2)
  }
}
