package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dedup operator family: LSH paths must agree with exact computations. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  lazy val exactPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
    n = 3, threshold = 0.8)
    .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  test("exact dedup groups identical payloads") {
    val ev = Tables.events(spark, sf)
    val d = Dedup.exact(ev, "event_id", Seq("props"))
    assert(d.count() == 100) // props domain is {"k": 0..99}
    val total = d.agg(sum($"n_copies")).as[Long].collect().head
    assert(total == ev.count())
  }

  test("ngram jaccard finds the planted near-duplicates") {
    assert(exactPairs.nonEmpty)
    // symmetric-free: id_a < id_b always
    assert(exactPairs.forall { case (a, b) => a < b })
  }

  test("repeated-substring spans: shared windows mark, islands merge, solo repeats don't") {
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10" // 10 tokens → 3 windows at k=8
    val fixture = Seq(
      // docs 1 and 2 share a 10-token run: 3 dup windows each (pos gaps 1)
      // merging into ONE span covering 10 tokens
      (1L, s"${words("a", 4)} $shared ${words("b", 4)}"),
      (2L, s"${words("x", 2)} $shared ${words("y", 6)}"),
      // doc 3 repeats an 8-gram WITHIN itself only — minDocs=2 is about
      // distinct documents, so nothing marks
      (3L, s"${words("q", 8).replace("q", "r")} ${words("z", 3)} ${words("q", 8).replace("q", "r")}"),
      // doc 4 is shorter than k: zero windows
      (4L, "too short to window")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSubstringSpans(fixture, k = 8, minDocs = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_windows", $"n_dup_windows", $"n_spans", $"dup_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc1: 18 tokens → 11 windows; doc2: 18 tokens → 11 windows
    // doc3: 19 tokens → 12 windows, none duplicated cross-doc
    assert(got == Seq(
      (1L, 11L, 3L, 1L, 10L),
      (2L, 11L, 3L, 1L, 10L),
      (3L, 12L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L, 0L)))
    // island boundaries: a contiguous dup run merges to one span; a second
    // shared run past a non-shared gap is a separate island
    val far = Seq(
      (1L, s"${words("p", 8)} ${words("m", 8)} filler1 filler2 filler3 filler4 filler5 filler6 filler7 ${words("n", 8)}"),
      (2L, s"${words("p", 8)} ${words("m", 8)} other1 other2 other3 other4 other5 other6 other7 ${words("n", 8)}")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpans(far, k = 8, minDocs = 2)
      .orderBy($"doc_id")
      .select($"n_spans", $"dup_tokens").as[(Long, Long)].collect().toSeq
    // the 9 windows of the shared p-m run (pos 1..9) merge into one span
    // covering 16 tokens; the shared n-run at the tail (one window, 8
    // tokens) sits past the gap and stays its own island
    assert(spans == Seq((2L, 24L), (2L, 24L)))
    // minDocs > 2 takes the general countDistinct+join branch (minDocs=2
    // runs the single-pass window path): a run shared by exactly two docs
    // no longer qualifies, one shared by three still does
    val three = Seq(
      (1L, s"$shared ${words("a", 4)}"),
      (2L, s"$shared ${words("b", 4)}"),
      (3L, s"$shared ${words("c", 4)}"),
      // e-run shared by docs 4 and 5 ONLY — below the minDocs=3 bar
      (4L, s"${words("e", 10)} ${words("f", 4)}"),
      (5L, s"${words("e", 10)} ${words("g", 4)}")
    ).toDF("doc_id", "text")
    val md3 = Dedup.repeatedSubstringSpans(three, k = 8, minDocs = 3)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_dup_windows", $"n_spans", $"dup_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(md3 == Seq(
      (1L, 3L, 1L, 10L), (2L, 3L, 1L, 10L), (3L, 3L, 1L, 10L),
      (4L, 0L, 0L, 0L), (5L, 0L, 0L, 0L)))
  }

  test("repeated-substring spans: hot gram takes no single-task window and explodes once") {
    // one 8-gram planted in 75% of documents — the adversarial shape for a
    // Window.partitionBy(gram hash): every occurrence would land in ONE
    // task's buffered partition. The rewrite must (a) keep the answer, (b)
    // plan NO window partitioned by the gram hash (the only windows are the
    // per-document span merges), and (c) run the token explode ONCE — the
    // duplicated-hash aggregate and the join-back must share one Exchange.
    val hot = (1 to 8).map(i => s"hot$i").mkString(" ")
    val docs = (1L to 40L).map { i =>
      if (i % 4 != 0L)
        (i, s"$hot u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g")
      else
        (i, (1 to 15).map(j => s"v${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.repeatedSubstringSpans(docs, k = 8, minDocs = 2)
    out.collect() // finalize AQE on `out` itself so the plan walk is real
    val rows = out.orderBy($"doc_id")
      .select($"doc_id", $"n_dup_windows", $"n_spans", $"dup_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // hot docs: only the pos-1 window is the shared gram (tails are unique)
    assert(rows == (1L to 40L).map(i =>
      if (i % 4 != 0L) (i, 1L, 1L, 8L) else (i, 0L, 0L, 0L)))
    // (b) every logical Window partitions on the document id, never the hash
    val winSpecs = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec
    }
    assert(winSpecs.nonEmpty)
    assert(winSpecs.forall(_.forall(_.references.forall(_.name == "doc_id"))),
      s"window partitioned off the doc id: $winSpecs")
    // (c) exactly one explode in the executed plan (ReuseExchange shares it)
    val gens = graft.plans.PlanScans.finalNodes(out).count(
      _.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    assert(gens == 1, s"expected the explode to run once, saw $gens")
  }

  test("connected components: transitive chains collapse to the min id") {
    // 1-2, 2-3, 3-4 chain; 10-11 pair; 20-21-22 triangle with a stray 22-23
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    // and over the real near-dup pairs: every pair's two sides share a cluster
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
      .as[(Long, Long)].collect().toMap
    assert(exactPairs.forall { case (a, b) => clusters(a) == clusters(b) })
    assert(clusters.forall { case (id, c) => c <= id })
  }

  test("connected components: driver union-find and distributed propagation agree") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    // driverMaxEdges = 0 forces the at-scale iterative path
    val dist = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
  }

  test("keep-canonical survivors: one doc per cluster, all unclustered docs kept") {
    val survivors = graft.queries.ExtensionQueries.dedupKeepCanonical(spark, sf)
      .as[(Long, Long)].collect()
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
      .as[(Long, Long)].collect()
    val clustered = clusters.map(_._1).toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    val survivorIds = survivors.map(_._1).toSet
    // exactly one survivor per cluster...
    val byCluster = clusters.groupBy(_._2)
    assert(byCluster.forall { case (_, members) =>
      members.map(_._1).count(survivorIds) == 1 })
    // ...plus every unclustered doc
    assert((all -- clustered).subsetOf(survivorIds))
    assert(survivorIds.size == (all -- clustered).size + byCluster.size)
  }

  test("minhash LSH recall vs exact jaccard pairs") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16, threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // verification step makes precision exact; banding controls recall
    assert(lsh.subsetOf(exactPairs))
    val recall = lsh.size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"minhash recall $recall over ${exactPairs.size} pairs")
  }

  test("simhash pairs overlap the jaccard near-dups") {
    val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(sh.nonEmpty)
    val overlap = sh.intersect(exactPairs).size.toDouble / sh.size
    assert(overlap >= 0.5, s"simhash/jaccard overlap $overlap")
  }

  test("simhash pairs: clone-heavy corpus matches brute force, incl. hamming-0 groups") {
    // 3 groups of 40 fingerprint-identical docs (exact twins) + salted
    // variants + unrelated docs: the distinct-fp band join must produce the
    // same pair set a brute-force all-pairs hamming scan does, with the twin
    // groups' C(40,2) hamming-0 pairs coming from the diagonal expansion
    import org.apache.spark.sql.functions.{col => c}
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again tonight",
      "pack my box with five dozen liquor jugs before the morning train leaves",
      "how vexingly quick daft zebras jump when the circus lights flare up")
    val rows = (for {
      (t, g) <- base.zipWithIndex
      i <- 0 until 40
    } yield (g * 1000L + i, t)) ++
      // near variants: one word swapped (small hamming of the group fp)
      base.zipWithIndex.map { case (t, g) =>
        (g * 1000L + 500, t.replace("the", "a")) } ++
      (0 until 30).map(i => (9000L + i, s"unique document number $i with entirely distinct content ${i * 7}"))
    val docs2 = rows.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs2, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    // brute force over the same fingerprints (the default 3-token-shingle
    // features — the operator's order-sensitive form)
    val toks = TextAnalysis.tokens(c("text"))
    val fps = docs2.select($"doc_id",
      graft.expr.HashFunctions.simHash64(
        when(size(toks) >= 3, graft.expr.HashFunctions.windowHashes(toks, 3))
          .otherwise(array(xxhash64(concat_ws(" ", toks))))).as("fp"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb))).toSet
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expected)
    // the twin groups alone contribute 3 * C(40,2) hamming-0 pairs
    assert(got.count(_._3 == 0) >= 3 * 40 * 39 / 2)
  }

  test("clustered embedding near-dup: exact precision, recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val clustered = Dedup.embeddingNearDupPairsClustered(emb, "vec_id", "embedding",
      threshold = 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val bf = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("c", graft.expr.VecFunctions.cosineSim($"a.embedding", $"b.embedding"))
      .filter($"c" >= 0.45)
      .select($"a.vec_id", $"b.vec_id").as[(Long, Long)].collect().toSet
    assert(clustered.subsetOf(bf)) // exact verification: no false positives
    val recall = if (bf.isEmpty) 1.0 else clustered.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.7, s"cell-capture recall $recall over ${bf.size} true pairs")
  }

  test("embedding near-dup LSH candidates verify against brute force") {
    val emb = Tables.embeddings(spark, sf)
    val lsh = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.45, planes = 12, bands = 6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth via the same cosine kernel
    val bf = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("c", graft.expr.VecFunctions.cosineSim($"a.embedding", $"b.embedding"))
      .filter($"c" >= 0.45)
      .select($"a.vec_id", $"b.vec_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(bf)) // verification step: no false positives
    assert(bf.isEmpty || lsh.nonEmpty) // banding finds at least some
  }
}
