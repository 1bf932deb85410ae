package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.VecFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the query set is always the broadcast side — the corpus
  * (the 100 TB side) streams through map tasks exactly once, computing
  * similarities with the codegen'd [[graft.expr.CosineSimilarity]] kernel.
  * Per-query top-k uses a window after an AQE-coalesced shuffle of only
  * `|queries| × per-partition-k` survivors (partial top-k first, global
  * top-k second — the classic two-phase pattern).
  */
object Similarity {

  /** Deterministic random hyperplane signature: plane p's normal has
    * component `sign(xxhash64(p, dim))` in each dimension — i.e. a ±1
    * Rademacher plane derived from hashing, no stored model. Returns
    * `array<int>` of 0/1 side bits.
    */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1),
          d => when(xxhash64(p, d) % 2 === 0, lit(1.0f)).otherwise(lit(-1.0f))),
          (x, r) => x * r),
        lit(0.0), (acc, t) => acc + t) >= 0, lit(1)).otherwise(lit(0)))

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * `queries` is broadcast; the corpus is scanned once. Two-phase top-k:
    * per-partition pre-filter keeps at most k rows per query per partition
    * before the shuffle, so the global window sorts |q|·k·partitions rows,
    * not |q|·|corpus|.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .withColumn("cosine", VecFunctions.cosineSim(col(queryVec), col(corpusVec)))
    val noSelf = if (excludeSelf) scored.filter(col(queryId) =!= col(corpusId)) else scored
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    noSelf
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** LSH-bucketed ANN top-k: corpus and queries are signed with the same
    * hyperplane bands; cosine is only computed for bucket collisions. At
    * 100 TB the bucket join replaces the full scan with `|collisions|` work;
    * recall is tuned by (planes, bands).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bands: Int = 4,
      queryId: String = "query_id", queryVec: String = "query_vec",
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    val rows = planes / bands
    def banded(df: DataFrame, vec: String, id: String, outId: String, outVec: String) =
      df.select(col(id).as(outId), col(vec).as(outVec),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(hyperplaneSignature(col(vec), planes), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val qb = banded(queries, queryVec, queryId, "qid", "qv")
    val cb = banded(corpus, corpusVec, corpusId, "cid", "cv")
    val cand = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .withColumn("cosine", VecFunctions.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(queryId), col("cid").as("neighbor_id"), col("rank"), col("cosine"))
  }
}
