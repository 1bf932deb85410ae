package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import graft.expr.{HashFunctions, SketchFunctions, VecFunctions}

/** Deduplication operators for a training-data pipeline: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the dedup key — with content hashed
  *    first (`xxhash64`) so the shuffle carries 8-byte keys, not document
  *    bodies;
  *  - pairwise operators NEVER do an all-pairs cross join: candidates come
  *    from an equi-join on shingles / LSH band buckets / SimHash band keys,
  *    which Spark executes as a shuffled hash join on small keys;
  *  - hot shingles (appearing in > maxDf docs) are dropped before the
  *    candidate join — the standard guard against quadratic blowup on
  *    boilerplate n-grams (a stopword shingle at 100 TB would otherwise
  *    produce one reducer with ~all documents).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical value of `keyCols`.
    * One shuffle on the (hashed) key.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Cross-document repeated-substring spans — the distributed shape of
    * suffix-array ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): any window of `k`
    * consecutive tokens that also occurs in at least `minDocs` distinct
    * documents marks its span; overlapping-or-adjacent marked windows merge
    * into maximal spans per document (the regions an ExactSubstr pass would
    * cut). Returns one row per document: total window count, duplicated
    * window count, merged span count, and tokens covered by the spans.
    *
    * Scale shape (the suffix array itself does not distribute; this does):
    * windows explode to (doc, pos, hash) with the gram STRING living only
    * inside the projection — every shuffle key is the 8-byte hash. The
    * duplicated-hash set comes from a skew-immune hash aggregate (map-side
    * partial combine, so a gram in 10⁷ documents still ships one partial
    * row per task) joined back against the SAME explicit Exchange —
    * ReuseExchange materializes the exploded frame once as shuffle files,
    * so the explode runs a single time and no operator buffers a whole
    * gram partition (a `Window.partitionBy(hash)` would). Span merging is
    * a per-document window function (state bounded by document length, the
    * same bound the per-doc text already imposes). Nothing is
    * corpus-quadratic, and there is no driver-side collect.
    */
  def repeatedSubstringSpans(docs: DataFrame, k: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"window length k=$k must be >= 2")
    val base = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))
      .withColumn("n_windows",
        greatest(size(col("t")) - (k - 1), lit(0)).cast("long"))
    // window_hashes kernel: per-token hash once + rolling polynomial —
    // the transform/slice/array_join composition built a throwaway string
    // per window (O(n·k·|token|) allocation) and dropped the projection
    // out of whole-stage codegen (higher-order function)
    val win = base.filter(size(col("t")) >= k)
      .select(col(idCol),
        posexplode(HashFunctions.windowHashes(col("t"), k))
          .as(Seq("off", "h")))
      .select(col(idCol), (col("off") + 1).as("pos"), col("h"))
    // "occurs in ≥minDocs distinct docs" per gram hash, WITHOUT a
    // Window.partitionBy(h): a window over h sends EVERY occurrence of one
    // gram to a single task that buffers the whole partition — a
    // boilerplate 8-gram appearing in 10⁷ documents is a one-task
    // spill-sort at 100 TB. Instead both consumers hang off the SAME
    // explicit hash Exchange: the aggregate is skew-immune (map-side
    // partial min/max per task, one row per hash crosses the wire) and the
    // join-back probes the identical Exchange subtree, which ReuseExchange
    // materializes ONCE as shuffle files — the explode still runs a single
    // time (the round-9 motivation for the window form), but no operator
    // ever buffers a whole gram partition. The shuffle_hash hint keeps the
    // probe side streaming (a sort-merge join would re-sort the hot hash
    // partition in one task — the same skew in different clothes).
    // ReuseExchange fires only on CANONICALLY IDENTICAL subtrees, and
    // column pruning breaks that silently: a consumer that drops `pos`
    // gets its own narrower Exchange and the explode runs once per copy.
    // Every aggregate below therefore keeps a vacuous dependency on `pos`
    // (min(pos) >= 1 is always true — positions are 1-based — but the
    // optimizer cannot prove it, so `pos` survives pruning in every
    // branch). The DedupSpec hot-gram test pins the result: exactly ONE
    // GenerateExec in the executed plan.
    val shuffled = win.repartition(col("h"))
    val dup =
      if (minDocs == 2)
        // ≥2 distinct docs ⟺ min(doc) ≠ max(doc), no distinct-expansion
        shuffled.groupBy(col("h"))
          .agg(min(col(idCol)).as("d_lo"), max(col(idCol)).as("d_hi"),
            min(col("pos")).as("p_lo"))
          .filter(col("d_lo") =!= col("d_hi") && col("p_lo") >= 1)
          .select(col("h"))
      else
        shuffled.groupBy(col("h"))
          .agg(countDistinct(col(idCol)).as("nd"), min(col("pos")).as("p_lo"))
          .filter(col("nd") >= minDocs && col("p_lo") >= 1)
          .select(col("h"))
    val hits = shuffled.join(dup.hint("shuffle_hash"), "h")
      .select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // gaps-and-islands: windows whose starts are within k of each other
    // cover contiguous tokens, so they merge into one span
    val grouped = hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(byDoc))
    // ONE pass over the merged spans yields windows-per-span too (r17): the
    // old shape computed n_dup_windows as a SECOND aggregate branch directly
    // off `hits`, which re-executed the whole join-probe pipeline (shuffle
    // read + shuffled-hash join) and paid a second Exchange by doc_id — the
    // per-span row count sums to the identical per-doc window count, inside
    // the branch the span merge already runs. Both post-window aggregates
    // reuse the window's hash(doc_id) partitioning (doc_id is a prefix of
    // every grouping key), so the whole per-doc phase is one Exchange.
    val spans = grouped.groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"),
        count(lit(1)).as("nw"))
    val spanStats = spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        sum(col("nw")).as("n_dup_windows"))
    base.select(col(idCol), col("n_windows"))
      .join(spanStats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_windows", "n_spans", "dup_tokens"))
      // column order pinned to the pre-r17 two-join shape (schema contract)
      .select(col(idCol), col("n_windows"), col("n_dup_windows"),
        col("n_spans"), col("dup_tokens"))
  }

  /** Distinct word-shingle hashes per document: the shared substrate of the
    * Jaccard / MinHash paths. Shingles are hashed to longs immediately so all
    * downstream joins/aggregations move 8-byte values.
    */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      SketchFunctions.wordShingleHashes(col(textCol), n).as("grams"))

  /** Exact n-gram Jaccard near-dup pairs via posting lists: explode distinct
    * shingles ONCE → one shuffle groups each shingle's (2..maxDf) doc ids →
    * candidate pairs are generated inside the posting row → per-pair shared
    * count → Jaccard from set sizes.
    *
    * This replaces the classic shingle self-equi-join: same output, but the
    * corpus is scanned once instead of four times (two join sides + two
    * df-guard subtrees), and the shingle kernel runs once per document. The
    * `maxDf` cap bounds per-posting pair fan-out at C(maxDf,2) rows — the
    * same quadratic guard the join needed — and pair generation streams, so
    * peak memory per posting is O(maxDf), not C(maxDf,2).
    *
    * `explode_outer` + post-filter (not `explode`): the generator's implicit
    * `size(grams)>0` pre-filter would push below the projection and
    * re-evaluate the shingle kernel 3x per row.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxDf: Long = 1000): DataFrame = {
    val grams = shingleHashes(docs, idCol, textCol, n)
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("sz"))
    val exploded = grams.select(col("doc_id"), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
    val postings = exploded.groupBy(col("gram"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
    // all (i < j) pairs of one posting list; ids are sorted so id_a < id_b.
    // Two chained generates STREAM the pairs: posexplode picks id_a, then a
    // tail slice explodes into its partners — peak per-row allocation is one
    // O(maxDf) slice, not a materialized O(maxDf^2) nested pairs array
    // (C(1000,2) ≈ 500k structs for a near-cap posting).
    val pairs = postings
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("id_a"),
        explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("id_b"))
    val shared = pairs.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: `sig[i] = min over shingles of xxhash64(shingle, i)`
    * — `numHashes` independent permutation approximations from one shingle
    * array, computed in a single projection (no shuffle).
    */
  def minhashSignatures(grams: DataFrame, numHashes: Int): DataFrame =
    grams.withColumn("sig", SketchFunctions.minHashSig(col("grams"), numHashes))

  /** (doc_id, band, bucket) rows from a `sig` column: each of `bands`
    * signature slices of `rows` values hashes to one bucket. THE banding
    * definition — the batch pair-finder and the streaming near-dup index
    * must produce identical buckets, so both call this.
    */
  def bandedBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  /** MinHash + LSH banding: signatures are sliced into `bands` bands of
    * `rows = numHashes/bands` values; documents sharing any band bucket are
    * candidates; candidates are verified with exact Jaccard on the shingle
    * sets (`array_intersect`/`array_union` on the 8-byte hashes).
    *
    * The band bucket join is the scale path: P(candidate) ≈ 1-(1-j^r)^b — at
    * j=0.8, r=4, b=16 that is ≈0.9996, while random pairs essentially never
    * collide, so the join output stays near-linear in the true-duplicate count.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // no size-guard filter: Catalyst would push it below the projection and
    // re-evaluate the shingle kernel 3x per row; empty shingle sets verify to
    // null jaccard and drop at the threshold filter anyway
    val grams = shingleHashes(docs, idCol, textCol, n)
    val sigs = minhashSignatures(grams, numHashes)
    // Banded rows are NARROW (doc_id, band, bucket): the shingle arrays must
    // not ride through the candidate join + dedupe shuffle. Payloads are
    // joined back once per surviving candidate pair.
    val banded = bandedBuckets(sigs, bands, rows)
    val candIds = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(grams.select(col("doc_id").as("id_a"), col("grams").as("grams_a")), "id_a")
      .join(grams.select(col("doc_id").as("id_b"), col("grams").as("grams_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc (custom codegen
    * expression), candidate tables per the block-permutation scheme of
    * Manku/Jain/Sarma (WWW'07): the fingerprint splits into `maxHamming + 2`
    * pieces, so ≤ maxHamming flipped bits leave ≥ 2 pieces untouched and
    * every true pair collides in at least one of the C(pieces,2) two-piece
    * tables — recall is exact by pigeonhole, precision by the explicit
    * Hamming check.
    *
    * Features are `shingle`-token windows (default 3), not single tokens.
    * Unigram features only see the token MULTISET, so any two documents
    * sharing vocabulary converge to nearby fingerprints regardless of word
    * order; measured on the sf0.1 corpus, hamming ≤ 3 unigram pairs were
    * 91% false against a 3-gram-Jaccard-0.8 truth set (1 662 false vs 167
    * true at h=3 alone), while 3-token-shingle fingerprints produced ZERO
    * false pairs out to hamming 8 at both sf0.01 and sf0.1 — order
    * sensitivity is what makes simhash a near-DUPLICATE sketch rather than
    * a bag-of-words one. Documents shorter than `shingle` tokens hash their
    * whole token sequence as one feature (identical short docs still
    * collide at hamming 0; distinct ones land far apart). `shingle = 1`
    * selects the fused unigram kernel ([[graft.expr.SimHashText]]).
    *
    * Scale shape, three guards that each kill a quadratic term:
    * - DISTINCT fingerprints feed the table join — k fp-identical docs
    *   (exact twins after tokenization) would put k rows in every one of
    *   their buckets and k² rows into the candidate shuffle; collapsed, they
    *   cost one row and their hamming-0 doc pairs come from the diagonal
    *   expansion below.
    * - Two-piece (~26-bit) keys, not single 16-bit bands: natural-language
    *   fingerprints concentrate heavily on narrow keys (a 16-bit band
    *   bucket reaches thousands of fps on web-like corpora, and the probe
    *   does |bucket|² work), while requiring two clean pieces at once
    *   spreads the same fps across a 2²⁶ key space.
    * - The Hamming check rides INSIDE the join condition, so a residual
    *   bucket collision between mere lookalikes dies in the codegen'd probe
    *   and never reaches the dedup shuffle.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, shingle: Int = 3): DataFrame = {
    // both paths are fused codegen kernels (no higher-order functions, which
    // would drop the projection out of whole-stage codegen): unigrams use the
    // single-pass tokenize+hash+vote kernel; shingles compose the rolling
    // window-hash kernel with the vote kernel
    val fpCol =
      if (shingle <= 1) HashFunctions.simHashText(col(textCol))
      else {
        val toks = TextAnalysis.tokens(col(textCol))
        HashFunctions.simHash64(
          when(size(toks) >= shingle, HashFunctions.windowHashes(toks, shingle))
            .otherwise(array(xxhash64(concat_ws(" ", toks)))))
      }
    val fp = docs.select(col(idCol).as("doc_id"), fpCol.as("fp"))
    val fps = fp.select("fp").distinct()
    val nPieces = maxHamming + 2
    val width = 64 / nPieces // last piece absorbs the remainder bits
    def piece(i: Int): Column = {
      val w = if (i == nPieces - 1) 64 - width * i else width
      shiftrightunsigned(col("fp"), width * i)
        .bitwiseAND(lit((1L << w) - 1L))
    }
    val tables = for { i <- 0 until nPieces; j <- i + 1 until nPieces }
      yield shiftleft(piece(i), 32).bitwiseXOR(piece(j)) // disjoint: w ≤ 32
    val banded = fps.select(col("fp"), posexplode(array(tables: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val offDiag = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.fp") < col("b.fp") &&
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHamming)
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .dropDuplicates("fp_a", "fp_b")
    // diagonal rows expand to the hamming-0 pairs of fp-identical docs; an
    // fp with one doc expands to nothing (the ida<idb filter), so appending
    // ALL distinct fps is correct and avoids a doc-multiplicity pre-count
    val fpPairs = offDiag
      .unionByName(fps.select(col("fp").as("fp_a"), col("fp").as("fp_b")))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
    fpPairs
      .join(fp.select(col("fp").as("fp_a"), col("doc_id").as("ida")), "fp_a")
      .join(fp.select(col("fp").as("fp_b"), col("doc_id").as("idb")), "fp_b")
      // off-diagonal fp pairs yield each doc pair once (a doc has one fp) in
      // arbitrary id order; diagonal pairs yield both orders — keep one
      .filter(col("fp_a") =!= col("fp_b") || col("ida") < col("idb"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"), col("hamming"))
      // id-level dedup guards against duplicated doc_id rows in the input
      // (the pre-rewrite contract); the shuffle is output-sized, not
      // candidate-sized
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over a near-dup pair list: every document in a
    * pair gets `cluster_id` = the minimum doc id reachable through pairs —
    * the canonical "keep one per duplicate cluster" step after any pairwise
    * dedup (transitive closure: if A~B and B~C, all three share a cluster
    * even when A~C was never scored).
    *
    * Algorithm: iterative min-label propagation. Each round every node takes
    * the min of its own label and its neighbors' labels; rounds needed =
    * component diameter, and near-dup components are shallow (a handful of
    * hops), so this converges in a few joins. At 100 TB each round is one
    * join + one groupBy on 8-byte ids — no driver-side graph.
    * `localCheckpoint` cuts the growing lineage each round (the standard
    * iterative-algorithm hygiene; without it round N replans rounds 1..N-1).
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20,
      driverMaxEdges: Long = 1000000L): DataFrame = {
    // both edge directions from ONE pass over pairs (a union of two selects
    // would evaluate the upstream pair pipeline twice)
    val edges = pairs.select(explode(array(
        struct(col(idA).as("src"), col(idB).as("dst")),
        struct(col(idB).as("src"), col(idA).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    // Broadcast-scale fast path (same philosophy as Spark's own broadcast
    // threshold): near-dup edge sets are minuscule relative to the corpus —
    // most documents are unique — so the edge list usually fits on the
    // driver, where union-find resolves components in one pass instead of
    // maxIter rounds of join + checkpoint whose fixed per-job scheduling
    // cost dominates at this size. Past the threshold (plausible at 100 TB)
    // the distributed min-label propagation below takes over. Both paths
    // produce identical labels: cluster_id = min member id.
    val idType = edges.schema("src").dataType
    val orderable = idType match {
      case LongType | IntegerType | ShortType | ByteType | StringType => true
      case _ => false
    }
    if (orderable && edges.count() <= driverMaxEdges) {
      val spark = pairs.sparkSession
      val parent = scala.collection.mutable.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      edges.collect().foreach { r =>
        val a = r.get(0); val b = r.get(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      edges.unpersist()
      val ord: Ordering[Any] = {
        case (a: Long, b: Long) => java.lang.Long.compare(a, b)
        case (a: Int, b: Int) => Integer.compare(a, b)
        case (a: Short, b: Short) => java.lang.Short.compare(a, b)
        case (a: Byte, b: Byte) => java.lang.Byte.compare(a, b)
        case (a: String, b: String) => a.compareTo(b)
        case _ => throw new IllegalStateException("unreachable: orderable gate")
      }
      val rows = parent.keys.toSeq.groupBy(find).values.flatMap { members =>
        val label = members.min(ord)
        members.map(m => org.apache.spark.sql.Row(m, label))
      }.toSeq
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("doc_id", idType), StructField("cluster_id", idType))))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val updated = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"))
        .localCheckpoint() // materialize: the convergence count and the next
                           // round must see the same labels exactly once
      converged = updated.filter(col("new_label") < col("label")).isEmpty
      labels = updated.select(col("id"), col("new_label").as("label"))
      i += 1
    }
    edges.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— component diameter exceeds maxIter; raise it")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Embedding near-dup pairs, cluster-scoped (the SemDeDup shape, Abbas et
    * al. 2023): quantize the corpus into cells sized for a bounded occupancy,
    * assign each vector to its `nAssign` nearest cells (multi-assignment
    * recovers boundary pairs), generate candidate pairs only WITHIN a cell,
    * then verify exact cosine. Candidate volume is `nCells · occ²/2` —
    * LINEAR in corpus size at fixed occupancy — where the hyperplane-LSH
    * variant below degenerates to O(n²/buckets) at moderate thresholds
    * (a 0.45-threshold join at sf1 produced 300 M candidates and a 433 s
    * query; this form produces ~5 M and single-digit seconds).
    *
    * Precision is exact (every pair verified); recall is the cell-capture
    * rate, asserted against brute force in DedupSpec. At corpus sizes where
    * `n/occupancy` outgrows a driver-trainable quantizer (~4096 cells) the
    * same plan shape runs off a hierarchical/distributed k-means — the
    * assignment column, within-cell pairing, and exact verification are
    * unchanged.
    */
  def embeddingNearDupPairsClustered(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, occupancy: Int = 256, nAssign: Int = 0,
      kmeansIters: Int = 5): DataFrame = {
    val n = emb.count()
    val nCells = math.min(4096, math.max(8, math.ceil(n.toDouble / occupancy).toInt))
    // nAssign = 0 ⇒ derive from the cell count: a FIXED assignment width is
    // the r12 scale defect (recall 27/39 at sf0.1 with nAssign=2 where
    // sf0.01 was 14/14 — denser corpora move more true pairs onto cell
    // boundaries). ⌈log₂ nCells⌉ widens multi-assignment as the quantizer
    // refines while keeping candidate volume O(N·occ·log²) — measured 37/39
    // at sf0.1 (vs 27/39 fixed); explicit callers still pin their own width.
    val assignWidth =
      if (nAssign > 0) nAssign
      else math.max(2, math.ceil(math.log(nCells.toDouble) / math.log(2.0)).toInt)
    val centroids = Similarity.trainCoarseQuantizer(emb, vecCol, nCells,
      kmeansIters, sampleSize = math.max(2048, nCells * 4))
    // narrow assignment rows: 8-byte id + cell — vectors join back post-dedupe
    val assigned = emb.select(col(idCol).as("vec_id"),
      explode(SketchFunctions.nearestCentroids(col(vecCol), centroids, assignWidth)).as("cell"))
    val candIds = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("cosine", VecFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH buckets +
    * exact cosine verification (custom codegen kernel). Deterministic planes
    * derive from hashing the dimension index.
    *
    * Scale note: appropriate for HIGH thresholds (≥ ~0.8), where many planes
    * per band keep both recall and pruning. At moderate thresholds the plane
    * collision rate (~0.65 at cosine 0.45) forces few planes per band, the
    * bucket space stays tiny, and candidates grow O(n²/buckets) — use
    * [[embeddingNearDupPairsClustered]] there.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12, bands: Int = 3): DataFrame = {
    // Narrow banded rows (id, band, bucket) — vectors join back after the
    // candidate dedupe, so the quadratic stage only ever shuffles 8-byte ids.
    val banded = emb.select(col(idCol).as("vec_id"),
        posexplode(SketchFunctions.hyperplaneBands(col(vecCol), planes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candIds = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("cosine", VecFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
