package graft.tools

import graft.{GraftSession, Tables}
import graft.ext.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the v4/v9 index build + search spans
  * (guide §1: attribute before optimizing). Prints one JSON line per stage.
  */
object AnnDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-anndecompose")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.enableCache()
    val emb = Tables.embeddings(spark, sfDir)
    emb.count()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    val n = emb.count()
    val nLists = Similarity.adaptiveNLists(n)
    val nProbe = Similarity.adaptiveNProbe(nLists)
    println(s"""{"n":$n,"nLists":$nLists,"nProbe":$nProbe}""")
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-anndecompose-idx").getAbsolutePath
      timed("delete_old")(org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path)))
      val centroids = timed("sample_and_train_coarse")(
        Similarity.trainCoarseQuantizer(emb, "embedding", nLists, 5, 2048))
      val model = timed("sample_and_train_pq")(
        Pq.train(emb, "embedding", m = 8, ks = 32))
      import spark.implicits._
      timed("write_centroids")(
        centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("cell", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids"))
      timed("write_pqmodel")(Pq.saveModel(spark, s"$path/pqmodel", model))
      timed("write_cells")(
        Pq.withCode(emb, model, "embedding")
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            element_at(graft.expr.SketchFunctions.nearestCentroids(
              col("embedding"), centroids, 1), 1).as("cell"),
            col("pq_code"))
          .repartition(col("cell"))
          .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val rerank = Similarity.adaptiveRerank(n * nProbe / nLists, k = 10)
      timed("search_full")(
        Similarity.searchIvfPqIndex(spark, path, queries, k = 10,
          nProbe = nProbe, rerank = rerank)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
