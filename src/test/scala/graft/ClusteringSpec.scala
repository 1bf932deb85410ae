package graft

import graft.ext.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated unit blobs: k-means must recover them exactly. */
  private def blobs = {
    val centers = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f))
    val rows = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 40
    } yield {
      // deterministic small jitter, far below the inter-center separation
      val j = Array.tabulate(4)(d => c(d) + 0.05f * (((i * 7 + d * 3) % 11) - 5) / 5f)
      (b * 40 + i.toLong, j, b)
    }
    rows.toDF("id", "vec", "true_blob")
  }

  test("k-means recovers separated blobs with purity 1.0") {
    val model = Clustering.kmeans(blobs, "vec", "id", k = 3, iters = 4)
    val assigned = model.assign(blobs, "vec")
    val purity = assigned.groupBy($"cluster", $"true_blob").count()
      .groupBy($"cluster").agg(max($"count").as("maj"), sum($"count").as("tot"))
      .agg((sum($"maj") / sum($"tot")).as("p")).as[Double].head()
    assert(purity == 1.0, s"expected perfect recovery, purity=$purity")
    assert(model.centroids.length == 3)
  }

  test("objective is monotone non-decreasing and improves on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val model = Clustering.kmeans(emb, "embedding", "vec_id", k = 8, iters = 3)
    val objs = model.objective
    assert(objs.length == 3)
    objs.zip(objs.tail).foreach { case (a, b) =>
      // 1e-6 covers the float32 centroid quantization noise (see v5 gate)
      assert(b >= a - 1e-6, s"objective regressed: $objs")
    }
    assert(objs.last > objs.head, s"no improvement: $objs")
  }

  test("assignment is deterministic and total") {
    val emb = Tables.embeddings(spark, sf)
    val model = Clustering.kmeans(emb, "embedding", "vec_id", k = 5, iters = 2)
    val a1 = model.assign(emb, "embedding").select($"vec_id", $"cluster")
    val a2 = model.assign(emb, "embedding").select($"vec_id", $"cluster")
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty)
    assert(a1.count() == emb.count())
    assert(a1.filter($"cluster" < 0 || $"cluster" >= 5).isEmpty)
  }

  test("assignment plan is map-only: no shuffle below the scan") {
    val emb = Tables.embeddings(spark, sf)
    val model = Clustering.kmeans(emb, "embedding", "vec_id", k = 4, iters = 1)
    val plan = model.assign(emb, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle:\n$plan")
  }
}
