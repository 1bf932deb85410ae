package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates a driver testdata directory
  * N× with consistent foreign keys, for scale rehearsals beyond the shipped
  * factors (`ScaleUp <srcDir> <destDir> [reps]`).
  *
  * Key columns shift by `replica * (max_key + 1)` so joins stay exactly
  * consistent; nation/region stay fixed (real dimension tables don't grow
  * with fact data). Document text is salted per replica on every 3rd word so
  * every 3-shingle differs across replicas — near-dup structure is preserved
  * WITHIN a replica but replicas don't collide, keeping dedup pair counts
  * linear in the scale factor (the honest shape: real corpora don't contain
  * 10 byte-identical copies of everything). Embeddings perturb one dimension
  * per replica for the same reason. Event timestamps shift by `replica`
  * MICROseconds (post-truncation, so the shift survives the µs write);
  * the driver testdata's minimum inter-event gap is ~140 µs, so the order
  * stays tie-free for reps ≤ 100 — past that, replicas of adjacent events
  * may collide on ts (harmless to the oracles, which never order by bare ts
  * without a key, but worth knowing before a reps=1000 run).
  */
object ScaleUp {

  private def keySpan(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  /** Replicate with per-replica shifts on the named key columns. */
  private def replicate(df: DataFrame, reps: Int, shifts: Map[String, Long]): DataFrame = {
    val replicas = df.sparkSession.range(reps).select(col("id").cast("int").as("__rep"))
    val crossed = df.crossJoin(broadcast(replicas))
    shifts.foldLeft(crossed) { case (d, (k, span)) =>
      d.withColumn(k, col(k) + col("__rep") * span)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-scaleup")
    import spark.implicits._

    def t(name: String) = Tables.table(spark, src, name)
    def write(df: DataFrame, name: String): Unit =
      // repartition, not coalesce: coalesce(4) inherited the SOURCE scan's
      // 1-2 splits and wrote one jumbo file per table, capping every later
      // scan (and both engines' bench parallelism) at its ~11 row groups —
      // 32 files give file-granular parallelism to Spark and DuckDB alike
      df.drop("__rep").repartition(32).write.mode("overwrite")
        .parquet(s"$dest/$name.parquet")

    val ordSpan = keySpan(t("orders"), "o_orderkey")
    val custSpan = keySpan(t("customer"), "c_custkey")
    val partSpan = keySpan(t("part"), "p_partkey")
    val suppSpan = keySpan(t("supplier"), "s_suppkey")

    // fixed dimensions: copy once
    t("nation").write.mode("overwrite").parquet(s"$dest/nation.parquet")
    t("region").write.mode("overwrite").parquet(s"$dest/region.parquet")

    write(replicate(t("customer"), reps, Map("c_custkey" -> custSpan)), "customer")
    write(replicate(t("supplier"), reps, Map("s_suppkey" -> suppSpan)), "supplier")
    write(replicate(t("part"), reps, Map("p_partkey" -> partSpan)), "part")
    write(replicate(t("orders"), reps,
      Map("o_orderkey" -> ordSpan, "o_custkey" -> custSpan)), "orders")
    write(replicate(t("lineitem"), reps,
      Map("l_orderkey" -> ordSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)),
      "lineitem")

    // events goes through Tables.events, not the raw table loader: ts must be
    // epoch-nano Long for the +replica shift, whatever the source's physical
    // type. The scaled copy is written back as TIMESTAMP-µs — the driver
    // testdata's own physical type — so every ts-arithmetic oracle
    // (epoch_us(ts), interval predicates) binds at scale exactly as it does
    // at sf0.1 and both engines read the identical reader path. The replica
    // tie-break shifts by +rep MICROseconds (applied after the µs
    // truncation, so it survives the precision drop).
    def ev = Tables.events(spark, src)
    val evSpan = keySpan(ev, "event_id")
    val userSpan = keySpan(ev, "user_id")
    write(replicate(ev, reps,
      Map("event_id" -> evSpan, "user_id" -> userSpan))
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000") + col("__rep").cast("long"))),
      "events")

    val docSpan = keySpan(t("documents"), "doc_id")
    val docsRep = replicate(t("documents"), reps, Map("doc_id" -> docSpan))
    val salted = docsRep.select($"doc_id", $"text", $"__rep")
      .as[(Long, String, Int)]
      .map { case (id, text, rep) =>
        val saltedText =
          if (rep == 0) text
          else text.split(" ").zipWithIndex.map { case (w, i) =>
            if (i % 3 == 0) s"r$rep$w" else w
          }.mkString(" ")
        (id, saltedText)
      }.toDF("doc_id", "text")
    // re-attach the descriptive columns; n_chars recomputed for the salted text
    val full = salted
      .join(docsRep.select($"doc_id", $"lang", $"source"), "doc_id")
      .withColumn("n_chars", length($"text").cast("long"))
    write(full.select($"doc_id", $"text", $"lang", $"source", $"n_chars"), "documents")

    val vecSpan = keySpan(t("embeddings"), "vec_id")
    val emb = replicate(t("embeddings"), reps, Map("vec_id" -> vecSpan))
      .select($"vec_id", $"embedding", $"label", $"__rep")
      .as[(Long, Array[Float], Int, Int)]
      .map { case (id, v, label, rep) =>
        val out = v.clone()
        if (rep != 0 && out.nonEmpty) out(0) = out(0) + 0.001f * rep
        (id, out, label)
      }.toDF("vec_id", "embedding", "label")
    write(emb, "embeddings")

    println(s"""{"scaled":"$src","dest":"$dest","reps":$reps}""")
    spark.stop()
  }
}
