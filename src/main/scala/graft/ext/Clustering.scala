package graft.ext

import graft.expr.VecFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means over an embedding column.
  *
  * The at-scale shape (vs. the driver-local sample quantizer in
  * [[Similarity.trainCoarseQuantizer]], which exists only to seed IVF cells):
  * every Lloyd iteration is ONE pass over the corpus —
  *
  *   - **assignment is map-only**: the k centroids ride into the plan as
  *     array literals, the per-row argmax over k codegen'd cosine kernels
  *     ([[graft.expr.CosineSimilarity]]) runs inside whole-stage codegen,
  *     no join, no shuffle;
  *   - **update is one narrow shuffle**: `posexplode` the vector and
  *     aggregate `(cluster, dim) → (sum, count)` — k×dim cells regardless of
  *     corpus size, with map-side partial aggregation, then k×dim values to
  *     the driver (k=10, dim=64 → 640 doubles; bounded by model size, never
  *     by data size).
  *
  * Spherical variant (centroid = L2-normalized member mean) so the objective
  * — mean cosine of each row to its assigned centroid — is non-decreasing
  * across iterations: assignment maximizes it for fixed centroids, and the
  * normalized mean maximizes it for fixed assignment. That monotonicity is a
  * checkable invariant the driver's oracle gate states (v5), not just a
  * property we hope for.
  *
  * Seeds are the k lowest-id vectors — deterministic across runs, engines and
  * cluster sizes (`rand()`-free for the same reason as [[Sampling]]).
  */
object Clustering {

  final case class KMeansModel(
      centroids: Array[Array[Float]],
      /** mean best-cosine BEFORE each update, one entry per iteration. */
      objective: Seq[Double]) {

    /** Map-only assignment: adds `cluster` (int) and `cosine` (double, to
      * the assigned centroid) columns. These are the documented OUTPUT
      * column names — same-named input columns are replaced (dropped first,
      * so the semantics are explicit rather than a silent withColumn
      * overwrite).
      */
    def assign(df: DataFrame, vecCol: String): DataFrame = {
      val cosArr = array(centroids.map(c =>
        VecFunctions.cosineSim(col(vecCol), centroidLit(c))): _*)
      df.drop("cosine", "cluster").withColumn("cosine", array_max(cosArr))
        // array_position compares the (bit-identical) double values; ties
        // resolve to the lowest cluster id — deterministic
        .withColumn("cluster",
          (array_position(cosArr, array_max(cosArr)) - 1).cast("int"))
    }
  }

  private def centroidLit(c: Array[Float]): Column =
    array(c.map(v => lit(v)): _*)

  /** Lloyd iterations; `iters` full passes over `df`. */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): KMeansModel = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    val seeds = df.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Float](1).toArray)
    require(seeds.length == k, s"corpus smaller than k=$k")
    val dim = seeds.head.length

    var centroids = seeds
    val objs = Vector.newBuilder[Double]
    var it = 0
    while (it < iters) {
      // spherical update: average the L2-NORMALIZED members (the normalized
      // mean of raw vectors does NOT maximize the cosine objective when
      // norms vary, and the monotone gate would be a lie); zero vectors
      // can't be normalized and carry cosine 0 everywhere — excluded from
      // the update consistently with their zero objective contribution
      // internal columns carry a __graft_ prefix so a caller DataFrame that
      // already has nrm/pos/col columns can't collide (posexplode would
      // fail outright on a pre-existing `pos` or `col`)
      val assigned = KMeansModel(centroids, Nil).assign(df, vecCol)
        .withColumn("__graft_nrm",
          sqrt(VecFunctions.dotProduct(col(vecCol), col(vecCol))))
        .filter(col("__graft_nrm") > 0.0)
      // one narrow (cluster, dim) shuffle carrying sums+counts; the pos==0
      // slice doubles as the objective accumulator so the whole iteration
      // is a single Spark job
      val cells = assigned
        .select(col("cluster"), col("cosine"), col("__graft_nrm"),
          posexplode(col(vecCol)).as(Seq("__graft_pos", "__graft_dim")))
        .groupBy(col("cluster"), col("__graft_pos"))
        .agg(sum(col("__graft_dim") / col("__graft_nrm")).as("s"),
          count(lit(1)).as("n"), sum(col("cosine")).as("cs"))
        .collect()
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var objSum = 0.0; var objN = 0L
      cells.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        sums(c)(p) = r.getDouble(2)
        if (p == 0) {
          counts(c) = r.getLong(3)
          objSum += r.getDouble(4); objN += r.getLong(3)
        }
      }
      objs += (if (objN == 0) 0.0 else objSum / objN)
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps its seed
        else {
          val m = sums(c).map(_ / counts(c))
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0.0) centroids(c) else m.map(x => (x / norm).toFloat)
        }
      }
      it += 1
    }
    KMeansModel(centroids, objs.result())
  }
}
