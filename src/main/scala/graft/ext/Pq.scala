package graft.ext

import graft.expr.{PqFunctions, VecFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (v8): ANN whose CORPUS lives as m one-byte codes
  * per vector instead of D floats — 32× compression at D=64/m=8.
  *
  * This is the memory half of scale-out ANN (the IVF index is the I/O
  * half): at 100 TB of raw embeddings, the PQ-coded corpus is ~3 TB and
  * fits a modest cluster's page cache, so the scoring scan is CPU-bound
  * instead of disk-bound. The reference has no vector search at all; the
  * design follows the public PQ literature (Jégou et al. 2011) re-expressed
  * Spark-first:
  *
  *  - TRAIN on a bounded, hash-ordered driver-side sample (same reservoir
  *    shape as [[Similarity.trainCoarseQuantizer]]); the model is
  *    m·ks·(D/m) = D·ks floats — broadcast-by-reference inside codegen
  *    expressions, like the IVF centroid table.
  *  - ENCODE is one map-only pass through the codegen [[graft.expr.PqEncode]]
  *    kernel; codes are a `binary` column, parquet-friendly.
  *  - SEARCH scores every (query, code) pair with the asymmetric-distance
  *    kernel [[graft.expr.PqAdcScore]] (exact query vs reconstructed
  *    corpus — the high-recall ADC variant), keeps a bounded per-query
  *    shortlist via [[TopKByCosine]] (map-side top-k, no window), then
  *    RERANKS the shortlist — |queries|·`rerank` rows, tiny — with exact
  *    cosine against the raw vectors. Two-stage retrieve-then-rerank is
  *    how production PQ systems recover exact-ish precision@k from lossy
  *    codes.
  *
  * Cosine comes from inner product on L2-normalized inputs: vectors are
  * normalized before train/encode/score, so ADC approximates cosine
  * directly.
  */
object Pq {

  /** Flattened codebook: entry (mm, j, d) at `(mm·ks + j)·subDim + d`. */
  final case class Model(m: Int, ks: Int, subDim: Int, codebook: IndexedSeq[Float])

  private def normalized(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n > 0) 1.0 / math.sqrt(n) else 0.0
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  /** Per-subspace Lloyd on a bounded driver-side sample (hash-ordered
    * reservoir — executes as TakeOrderedAndProject, no full sort). The
    * model is tiny; this is legitimate driver-side work, like building a
    * broadcast join side.
    */
  def train(corpus: DataFrame, vecCol: String = "embedding", m: Int = 8,
      ks: Int = 32, iters: Int = 10, sampleSize: Int = 2048): Model =
    trainOnSample(Similarity.sampleVectors(corpus, vecCol, sampleSize),
      m = m, ks = ks, iters = iters)

  /** Train from an already-collected sample — lets [[Similarity.buildIvfPqIndex]]
    * feed the coarse and product quantizers from ONE corpus sampling pass.
    */
  private[ext] def trainOnSample(raw: Array[Array[Float]], m: Int = 8,
      ks: Int = 32, iters: Int = 10): Model = {
    require(raw.nonEmpty, "empty corpus")
    val dims = raw.iterator.map(_.length).max
    require(dims % m == 0, s"vector dim $dims is not divisible by m=$m subspaces")
    val subDim = dims / m
    val sample = raw.map(v => normalized(java.util.Arrays.copyOf(v, dims)))
    val ksEff = math.min(ks, sample.length)
    val flat = new Array[Float](m * ksEff * subDim)
    var mm = 0
    while (mm < m) {
      // init: evenly spread sample subvectors
      var j = 0
      while (j < ksEff) {
        val src = sample(j * sample.length / ksEff)
        System.arraycopy(src, mm * subDim, flat, (mm * ksEff + j) * subDim, subDim)
        j += 1
      }
      var it = 0
      val assign = new Array[Int](sample.length)
      while (it < iters) {
        // assignment: L2 argmin within the subspace
        var s = 0
        while (s < sample.length) {
          var bestJ = 0
          var bestD = Double.MaxValue
          var jj = 0
          while (jj < ksEff) {
            val base = (mm * ksEff + jj) * subDim
            var dist = 0.0
            var d = 0
            while (d < subDim) {
              val diff = sample(s)(mm * subDim + d).toDouble - flat(base + d)
              dist += diff * diff
              d += 1
            }
            if (dist < bestD) { bestD = dist; bestJ = jj }
            jj += 1
          }
          assign(s) = bestJ
          s += 1
        }
        // update: subspace means; an empty cluster keeps its old centroid
        val sums = Array.ofDim[Double](ksEff, subDim)
        val counts = new Array[Int](ksEff)
        s = 0
        while (s < sample.length) {
          val a = assign(s)
          counts(a) += 1
          var d = 0
          while (d < subDim) { sums(a)(d) += sample(s)(mm * subDim + d); d += 1 }
          s += 1
        }
        var jj = 0
        while (jj < ksEff) {
          if (counts(jj) > 0) {
            val base = (mm * ksEff + jj) * subDim
            var d = 0
            while (d < subDim) {
              flat(base + d) = (sums(jj)(d) / counts(jj)).toFloat
              d += 1
            }
          }
          jj += 1
        }
        it += 1
      }
      mm += 1
    }
    Model(m, ksEff, subDim, flat.toIndexedSeq)
  }

  /** L2-normalize an `array<float>` column (two-step so the norm is
    * computed once per row, not once per element).
    */
  private def withNormalized(df: DataFrame, vecCol: String, out: String): DataFrame = {
    val nrm = "__graft_pq_nrm"
    df.withColumn(nrm, sqrt(VecFunctions.dotProduct(col(vecCol), col(vecCol))))
      .withColumn(out,
        when(col(nrm) > 0.0, transform(col(vecCol), x => x / col(nrm)))
          .otherwise(col(vecCol))
          .cast("array<float>")) // transform promoted elements to double
      .drop(nrm)
  }

  /** PQ-encode a corpus: (id, code) with `code` = m bytes. */
  def encode(corpus: DataFrame, model: Model, corpusId: String = "vec_id",
      corpusVec: String = "embedding"): DataFrame =
    withCode(corpus, model, corpusVec).select(col(corpusId), col("pq_code"))

  /** Append an `out` PQ-code column, keeping every existing column — one
    * map-only pass, so callers that need the code NEXT TO other derived
    * columns (the IVF-PQ cell write) never self-join the corpus for it.
    */
  def withCode(df: DataFrame, model: Model, vecCol: String = "embedding",
      out: String = "pq_code"): DataFrame = {
    val nc = withNormalized(df, vecCol, "__graft_pq_nv")
    nc.withColumn(out,
        PqFunctions.pqEncode(col("__graft_pq_nv"), model.codebook, model.m,
          model.ks, model.subDim))
      .drop("__graft_pq_nv")
  }

  /** Persist a [[Model]] beside an index (one tiny parquet). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, path: String,
      model: Model): Unit = {
    import spark.implicits._
    Seq((model.m, model.ks, model.subDim, model.codebook))
      .toDF("m", "ks", "sub_dim", "codebook")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val r = spark.read.parquet(path).head()
    Model(r.getAs[Int]("m"), r.getAs[Int]("ks"), r.getAs[Int]("sub_dim"),
      r.getAs[Seq[Float]]("codebook").toIndexedSeq)
  }

  /** Two-stage PQ ANN: ADC shortlist of `rerank` candidates per query over
    * the coded corpus, exact-cosine rerank to top-`k`. Output matches the
    * other ANN paths: (query_id, neighbor_id, rank, cosine).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, model: Model,
      rerank: Int = 50,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    Similarity.requireIntegralId(corpus, corpusId, "corpus")
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val codes = encode(corpus, model, corpusId, corpusVec)
      .select(col(corpusId).as("cid"), col("pq_code"))
    val nq = withNormalized(queries, queryVec, "__graft_pq_nqv")
      .select(col(queryId).as("qid"), col("__graft_pq_nqv").as("nqv"))
    val cand = codes.join(broadcast(nq))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", PqFunctions.pqAdcScore(col("nqv"), col("pq_code"),
        model.codebook, model.m, model.ks, model.subDim))
    val shortlist = Similarity.boundedTopK(
      cand.select(col("qid"), col("cid"), col("cosine")), rerank, "query_id")
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank: |queries|·rerank rows — broadcastable by construction
    val exact = broadcast(shortlist)
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qv"))), Seq("query_id"))
      .withColumn("cosine", VecFunctions.cosineSim(col("qv"), col("cv")))
    Similarity.boundedTopK(
      exact.select(col("query_id").as("qid"), col("neighbor_id").as("cid"),
        col("cosine")), k, queryId)
  }
}
