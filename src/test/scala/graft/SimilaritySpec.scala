package graft

import graft.expr.{VecFunctions, VecKernels, HashKernels}
import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine kernel matches a scalar reference implementation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(VecFunctions.cosineSim($"a", $"b")).as[Double].collect().head
    assert(math.abs(got - expected) < 1e-12)
    // degenerate: zero vector -> 0, not NaN
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VecFunctions.cosineSim($"a", $"b")).as[Double].collect().head
    assert(z == 0.0)
  }

  test("random projection: deterministic, codegen matches kernel, cosine " +
      "distortion bounded on the real corpus") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding",
        VecFunctions.randomProject($"embedding", 32, 0xA5EED5EEDL).as("proj"))
    // deterministic across evaluations
    val p1 = emb.select($"vec_id", $"proj").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toMap
    val p2 = emb.select($"vec_id", $"proj").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(p1 == p2)
    // codegen path agrees with the interpreted kernel — same vec_id's row
    val idRow = emb.select($"vec_id", $"embedding").head()
    val viaKernel = VecKernels.randomProject(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        idRow.getSeq[Float](1).toArray), 32, 0xA5EED5EEDL)
    val viaPlan = p1(idRow.getLong(0))
    assert(viaPlan.length == 32)
    (0 until 32).foreach { j =>
      assert(viaKernel.getFloat(j) == viaPlan(j),
        s"codegen/interpreted divergence at dim $j")
    }
    // distortion gates with 2x headroom over the measured ~0.3 / ~0.1
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"proj".as("pa"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"proj".as("pb"))
    val errs = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select(abs(VecFunctions.cosineSim($"ea", $"eb") -
        VecFunctions.cosineSim($"pa", $"pb")).as("err"))
      .agg(max($"err"), avg($"err")).as[(Double, Double)].head()
    assert(errs._1 <= 0.6, s"max distortion ${errs._1} breached the v6 gate")
    assert(errs._2 <= 0.2, s"mean distortion ${errs._2} breached the v6 gate")
  }

  test("int8 quantization round-trip: worst error inside the half-step " +
      "bound, zero vector safe") {
    // hand-checkable vector: maxabs=1 -> scale=127, halfStep=1/254
    val direct = VecKernels.int8QuantErr(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1.0f, -0.5f, 0.25f, 0.0f)))
    assert(direct >= 0.0 && direct <= 1.000001, s"normalized err $direct")
    val zero = VecKernels.int8QuantErr(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0.0f, 0.0f)))
    assert(zero == 0.0)
    // codegen path over the real corpus: every vector inside the bound
    val worst = Tables.embeddings(spark, sf)
      .select(VecFunctions.int8QuantErr($"embedding").as("e"))
      .agg(max($"e")).as[Double].head()
    assert(worst <= 1.000001 && worst > 0.0, s"corpus worst err $worst")
  }

  test("brute-force top-k: self excluded, k respected, ranks contiguous") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.bruteForceTopK(queries, emb, k = 5).cache()
    assert(got.count() == 15)
    assert(got.filter($"query_id" === $"neighbor_id").count() == 0)
    val ranks = got.filter($"query_id" === 0).orderBy($"rank")
      .select($"rank").as[Int].collect()
    assert(ranks.toSeq == Seq(1, 2, 3, 4, 5))
    // cosines non-increasing by rank
    val cos = got.filter($"query_id" === 0).orderBy($"rank")
      .select($"cosine").as[Double].collect()
    assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
  }

  test("LSH ANN recall@10 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, emb, k = 10, planes = 16, bands = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall@10 = $recall")
  }

  test("IVF ANN recall@10 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, k = 10, nLists = 8, nProbe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall@10 = $recall")
  }

  test("PQ ANN: 8-byte codes, ADC shortlist + exact rerank recovers recall") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val model = graft.ext.Pq.train(emb, "embedding", m = 8, ks = 32)
    // compression fact: dim-64 float32 (256 B) → m=8 code bytes (32×)
    assert(model.subDim == 8 && model.ks == 32)
    val codes = graft.ext.Pq.encode(emb, model)
    assert(codes.select(length($"pq_code")).distinct().as[Int].collect().toSeq == Seq(8))
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pq = graft.ext.Pq.pqTopK(queries, emb, k = 10, model, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = pq.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.7, s"PQ recall@10 = $recall")
    // rank-1 sanity: the reranked scores are exact, so the top hit of each
    // query matches brute force exactly
    val bfTop1 = Similarity.bruteForceTopK(queries, emb, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pqTop1 = graft.ext.Pq.pqTopK(queries, emb, k = 1, model, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(bfTop1.intersect(pqTop1).size >= 4,
      s"PQ rank-1 disagrees: $pqTop1 vs $bfTop1")
  }

  test("ANN plans use the bounded aggregate, not a per-query window") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    for (df <- Seq(
        Similarity.lshTopK(queries, emb, k = 5),
        Similarity.ivfTopK(queries, emb, k = 5, nLists = 4, nProbe = 2),
        Similarity.bruteForceTopK(queries, emb, k = 5))) {
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("row_number"), s"per-query window top-k leaked back:\n$plan")
      assert(plan.contains("TopKByCosine") || plan.toLowerCase.contains("udaf") ||
        df.queryExecution.executedPlan.toString().contains("ObjectHashAggregate"))
    }
  }

  test("non-integral corpus id fails fast with a clear message") {
    val emb = Tables.embeddings(spark, sf).withColumn("vec_id", $"vec_id".cast("string"))
    val queries = emb.limit(1)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(queries, emb, k = 3)
    }
    assert(e.getMessage.contains("integral"))
    intercept[IllegalArgumentException] { Similarity.lshTopK(queries, emb, k = 3) }
    intercept[IllegalArgumentException] { Similarity.ivfTopK(queries, emb, k = 3) }
  }

  test("IVF recall survives a cluster-sorted corpus (unbiased quantizer sample)") {
    // 8 well-separated clusters, rows sorted BY cluster — a first-N sample
    // would only ever see cluster 0 and recall would collapse; the
    // hash-ordered reservoir must keep recall high.
    val rnd = new scala.util.Random(7)
    val dims = 16
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextGaussian().toFloat * 5f))
    val rows = for (c <- 0 until 8; i <- 0 until 120) yield {
      val v = centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      (c * 120L + i, v)
    }
    val corpus = rows.toDF("vec_id", "embedding") // already sorted by cluster
    val queries = corpus.filter($"vec_id" % 120 === 0) // one query per cluster
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, corpus, k = 10, nLists = 8, nProbe = 2,
        sampleSize = 256)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall@10 on cluster-sorted corpus = $recall")
  }

  test("persisted IVF index prunes cell partitions and keeps recall") {
    val work = java.nio.file.Files.createTempDirectory("graft-ivfidx").resolve("idx").toString
    val emb = Tables.embeddings(spark, sf)
    Similarity.buildIvfIndex(emb, work, nLists = 8)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val res = Similarity.searchIvfIndex(spark, work, queries, k = 10, nProbe = 4)
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = res.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"index recall@10 = $recall")
    // the probed cells must prune at the STORAGE layer: the cells scan
    // carries a partition filter on cell, and fewer than all 8 dirs are read
    val plan = res.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell#"),
      s"no partition pruning in:\n${plan.take(2000)}")
    val cellDirs = new java.io.File(s"$work/cells").list().count(_.startsWith("cell="))
    assert(cellDirs == 8)
  }

  test("IVF-PQ index: pruned cells, code-only ADC scan, rerank recovers recall") {
    val work = java.nio.file.Files.createTempDirectory("graft-ivfpq").resolve("idx").toString
    val emb = Tables.embeddings(spark, sf)
    Similarity.buildIvfPqIndex(emb, work, nLists = 8)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val res = Similarity.searchIvfPqIndex(spark, work, queries, k = 10,
      nProbe = 6, rerank = 100)
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = res.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-PQ recall@10 = $recall")
    val plan = res.queryExecution.executedPlan.toString()
    // storage-layer pruning on the cell partitions
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell#"),
      s"no partition pruning in:\n${plan.take(2000)}")
    // the ADC scan reads codes, never the float vectors: one scan's
    // ReadSchema carries pq_code WITHOUT cv (column pruning did its job)
    val scans = plan.split("FileScan").toSeq.filter(_.contains("ReadSchema"))
    assert(scans.exists(s => s.contains("pq_code") && !s.contains("cv:")),
      s"no code-only scan in:\n${plan.take(3000)}")
  }

  test("IVF index append: new vectors join their cells, old files untouched, recall holds") {
    val work = java.nio.file.Files.createTempDirectory("graft-ivfapp").resolve("idx").toString
    val emb = Tables.embeddings(spark, sf)
    // build on HALF the corpus, then append the other half with the
    // centroids held fixed — the growing-corpus path: no retrain, no rewrite
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 2 === 0), work, nLists = 8)
    def cellFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$work/cells")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = cellFiles
    Similarity.appendIvfIndex(spark, work, emb.filter($"vec_id" % 2 === 1))
    val after = cellFiles
    // every pre-existing cell file survived the append byte-identical
    // (same path, same mtime): appends are additive, never a rewrite
    before.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"pre-existing index file rewritten: $p")
    }
    assert(after.size > before.size, "append added no files")
    // the appended index covers the full corpus and searches with the same
    // recall contract as a fresh build
    assert(spark.read.parquet(s"$work/cells").count() == emb.count())
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.searchIvfIndex(spark, work, queries, k = 10, nProbe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.7, s"post-append recall@10 = $recall")
  }

  test("IVF-PQ index append: existing codebooks+centroids reused, old files " +
      "untouched, recall holds") {
    val work = java.nio.file.Files.createTempDirectory("graft-ivfpqapp").resolve("idx").toString
    val emb = Tables.embeddings(spark, sf)
    // build on HALF the corpus, then append the other half — both quantizers
    // (coarse centroids AND PQ codebooks) held fixed: no retrain, no rewrite
    Similarity.buildIvfPqIndex(emb.filter($"vec_id" % 2 === 0), work, nLists = 8)
    def filesUnder(sub: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$work/$sub")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val cellsBefore = filesUnder("cells")
    val modelBefore = filesUnder("pqmodel") ++ filesUnder("centroids")
    Similarity.appendIvfPqIndex(spark, work, emb.filter($"vec_id" % 2 === 1))
    val cellsAfter = filesUnder("cells")
    // every pre-existing cell file AND the whole quantizer state survived
    // byte-identical (same path, same mtime): appends are additive
    cellsBefore.foreach { case (p, m) =>
      assert(cellsAfter.get(p).contains(m), s"pre-existing index file rewritten: $p")
    }
    (filesUnder("pqmodel") ++ filesUnder("centroids")).foreach { case (p, m) =>
      assert(modelBefore.get(p).contains(m), s"quantizer state rewritten: $p")
    }
    assert(cellsAfter.size > cellsBefore.size, "append added no files")
    assert(spark.read.parquet(s"$work/cells").count() == emb.count())
    // appended rows carry real PQ codes: the ADC scan scores them the same
    // as built rows, and the search keeps the v9 recall contract
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val res = Similarity.searchIvfPqIndex(spark, work, queries, k = 10,
      nProbe = 8, rerank = 100)
    val bf = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = res.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.7, s"post-append IVF-PQ recall@10 = $recall")
    // the code-only ADC scan property survives the append
    val plan = res.queryExecution.executedPlan.toString()
    val scans = plan.split("FileScan").toSeq.filter(_.contains("ReadSchema"))
    assert(scans.exists(s => s.contains("pq_code") && !s.contains("cv:")),
      s"no code-only scan in:\n${plan.take(3000)}")
  }

  test("multimodal frame sampling: 4 frames per video, 1 otherwise") {
    val media = graft.ext.Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val frames = graft.ext.Multimodal.sampleFrames(media, 4).toDF()
    val byKind = frames.join(media.toDF().select($"media_id", $"kind"), "media_id")
      .groupBy($"kind").agg(countDistinct($"media_id").as("n_media"),
        (count(lit(1)) / countDistinct($"media_id")).as("frames_per"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byKind("video") == 4.0)
    assert(byKind("image") == 1.0 && byKind("audio") == 1.0)
  }

  test("multimodal resize: images round-trip at the target dims, " +
      "non-images pass through") {
    import graft.ext.Multimodal
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val resized = Multimodal.resizeAll(media, 10, 7).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      if (r.kind == "image") {
        assert(r.width == 10 && r.height == 7, s"claimed dims wrong: $r")
        val dec = Multimodal.ImageIoCodec.decode(
          Multimodal.MediaRecord(r.media_id, "image", r.payload))
        assert(dec.exists(m => m.width == 10 && m.height == 7),
          s"re-decoded dims wrong for ${r.media_id}: $dec")
      } else {
        assert(r.width == -1 && r.height == -1)
      }
    }
    // pixels actually changed scale: resized payload is a different PNG
    val orig = media.collect().map(m => m.media_id -> m.payload).toMap
    resized.filter(_.kind == "image").foreach { r =>
      assert(!java.util.Arrays.equals(r.payload, orig(r.media_id)),
        s"resize was a no-op for ${r.media_id}")
    }
  }

  test("simhash: identical token sets collide, small edits stay close") {
    def sim(tokens: Seq[String]): Long = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val hashes = tokens.map(t =>
        // stable per-token hash for the test; any long hash works
        UTF8String.fromString(t).hashCode().toLong * 0x9E3779B97F4A7C15L)
      HashKernels.simHash(new GenericArrayData(hashes.toArray))
    }
    val base = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    assert(sim(base) == sim(base))
    val edited = base.updated(1, "slow")
    val d = HashKernels.hamming64(sim(base), sim(edited))
    assert(d > 0 && d <= 32, s"hamming distance $d")
  }

  test("poly fingerprint: deterministic, order-sensitive") {
    val h1 = HashKernels.polyHash(UTF8String.fromString("hello world"))
    val h2 = HashKernels.polyHash(UTF8String.fromString("hello world"))
    val h3 = HashKernels.polyHash(UTF8String.fromString("world hello"))
    assert(h1 == h2 && h1 != h3)
  }
}
