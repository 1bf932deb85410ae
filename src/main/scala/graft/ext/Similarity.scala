package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.{SketchFunctions, VecFunctions}

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
    // Narrow banded rows; query vectors rejoin after the bucket-collision
    // dedupe so the collision join only moves ids (queries stay broadcast).
    def banded(df: DataFrame, vec: String, id: String, outId: String) =
      df.select(col(id).as(outId),
        posexplode(SketchFunctions.hyperplaneBands(col(vec), planes, bands)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val qb = banded(queries, queryVec, queryId, "qid")
    val cb = banded(corpus, corpusVec, corpusId, "cid")
    val candIds = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
    val cand = candIds
      .join(broadcast(queries.select(col(queryId).as("qid"), col(queryVec).as("qv"))), "qid")
      .join(corpus.select(col(corpusId).as("cid"), col(corpusVec).as("cv")), "cid")
      .withColumn("cosine", VecFunctions.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(queryId), col("cid").as("neighbor_id"), col("rank"), col("cosine"))
  }
}
