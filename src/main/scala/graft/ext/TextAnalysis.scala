package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.HashFunctions

/** Text-analysis operators for a training-data pipeline: tokenization, token
  * counting, quality scoring, language-ID heuristic, document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` plus the custom
  * fingerprint expression — a single narrow scan, no shuffles: at 100 TB these
  * run map-only and scale linearly with input splits.
  */
object TextAnalysis {

  /** Whitespace tokenizer (empty tokens dropped, lower-cased). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy count: word-piece segments of ≤4 chars —
    * `ceil(len/4)` summed over words, a deterministic stand-in for a real
    * tokenizer's token count (no tokenizer libs in this environment).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))

  /** Per-language stopword hit sets for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "中", "不")
  )

  /** N-gram language-ID heuristic: stopword-hit counts per language, argmax
    * with a deterministic tie-break (language code ascending), `und` when no
    * stopword hits at all.
    */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(ts, t => t.isInCollection(words))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality signals (length, punctuation ratio, stopword ratio, mean word
    * length) — the classic cheap pre-filters for LLM training corpora. Ratios
    * are single IEEE divisions of integer counts: bit-exact and
    * oracle-reproducible.
    */
  def qualityFeatures(text: Column): Column = {
    val ts = tokens(text)
    val nTok = size(ts)
    val nChar = length(text)
    val nPunct = nChar - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val allStop = stopwords.values.flatten.toSeq.distinct
    val nStop = size(filter(ts, t => t.isInCollection(allStop)))
    struct(
      nChar.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      (nPunct.cast("double") / nChar).as("punct_ratio"),
      (nStop.cast("double") / nTok).as("stopword_ratio"),
      (aggregate(ts, lit(0L), (a, w) => a + length(w)).cast("double") / nTok).as("mean_word_len")
    )
  }

  /** Scalar quality score in [0,1]: penalize too-short docs, reward a healthy
    * stopword ratio, penalize punctuation soup. Deterministic double math.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_tokens").cast("double") / 20.0, lit(1.0))
    val punctScore = lit(1.0) - least(f.getField("punct_ratio") * 4.0, lit(1.0))
    val stopScore = least(f.getField("stopword_ratio") * 5.0, lit(1.0))
    (lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3)
  }

  /** Gopher-style quality-rule battery (Rae et al. 2021, §A1.1 of the
    * public Gopher paper): document-level keep/drop heuristics a training
    * corpus runs before any model-based filtering. Five rules, each a pure
    * integer comparison (no doubles cross the engine/oracle boundary):
    *
    *  - `r_len`       token count in [minTokens, maxTokens]
    *  - `r_word_len`  mean word length in [3, 10] chars (as `3·n ≤ Σlen ≤ 10·n`)
    *  - `r_alpha`     ≥80% of words contain an alphabetic char (`5·hits ≥ 4·n`)
    *  - `r_stopwords` ≥2 hits from the English stopword list
    *  - `r_symbol`    symbol-soup words (`#`/`…`) ≤10% of tokens (`10·hits ≤ n`)
    *
    * Map-side only; the struct stays inside whole-stage codegen. `keep` is
    * the conjunction — the actual filter a pipeline applies.
    */
  def gopherRules(text: Column, minTokens: Int = 25, maxTokens: Int = 100): Column = {
    val ts = tokens(text)
    val nTok = size(ts).cast("long")
    val sumLen = aggregate(ts, lit(0L), (a, w) => a + length(w))
    val nStop = size(filter(ts, t => t.isInCollection(stopwords("en")))).cast("long")
    val nAlpha = size(filter(ts, t => t.rlike("[a-z]"))).cast("long")
    val nSym = size(filter(ts, t => t.rlike("[#…]"))).cast("long")
    val rLen = nTok >= minTokens && nTok <= maxTokens
    val rWordLen = sumLen >= nTok * 3L && sumLen <= nTok * 10L
    val rAlpha = nAlpha * 5L >= nTok * 4L
    val rStop = nStop >= 2L
    val rSym = nSym * 10L <= nTok
    struct(
      nTok.as("n_tokens"),
      rLen.as("r_len"),
      rWordLen.as("r_word_len"),
      rAlpha.as("r_alpha"),
      rStop.as("r_stopwords"),
      rSym.as("r_symbol"),
      (rLen && rWordLen && rAlpha && rStop && rSym).as("keep_doc"))
  }

  /** Rolling-hash document fingerprint (custom codegen expression). */
  def fingerprint(text: Column): Column = HashFunctions.polyHash64(text)

  /** Word n-grams as space-joined strings (shingles for dedup). */
  def wordNgrams(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n),
        i => array_join(slice(ts, i + 1, lit(n)), " ")))
  }

  /** Full text-analysis projection over a `documents`-shaped table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Per-document TF-IDF relevance score — the classic lexical filter a
    * training-data pipeline runs before (or instead of) model-based quality
    * scoring: documents of corpus-ubiquitous boilerplate score low,
    * documents of distinctive content score high.
    *
    * `score(d) = Σ_terms tf(t,d) · (ln((N+1)/(df(t)+1)) + 1) / |d|`
    * (smoothed idf, length-normalized). Exact double math — the DuckDB
    * oracle restates the same formula term for term.
    *
    * Scale shape: ONE corpus scan — the (doc, token) `tf` aggregate is
    * persisted and every downstream branch (document frequency, corpus
    * size N, the scoring join) reads that one materialization; without the
    * cache Spark inlines each reference and re-scans the corpus per branch.
    * `df` is vocabulary-sized and GROWS with the corpus, so it is joined
    * on the token shuffle both sides already need — never force-broadcast
    * (a forced hint is a driver OOM at 100 TB; AQE still broadcasts it at
    * runtime when it is actually small). The final per-doc aggregate is
    * one keyed shuffle. Nothing is corpus-quadratic.
    */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.{log, sum}
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .persist()
    // df from tf, not a second explode: tf rows are already distinct
    // (doc, token) pairs, so a plain per-token count IS the document
    // frequency — the token shuffle sees deduped pairs and no
    // distinct-aggregate two-phase
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // N = docs with ≥1 token (the oracle's `count(DISTINCT doc_id) FROM t`),
    // derived from the cached tf (distinct docs there ≡ docs with a token)
    // so this action materializes the cache instead of re-scanning the
    // corpus; distinct before count keeps the action's shuffle doc-sized
    val n = tf.select(col(idCol)).distinct().count()
    tf.join(dfreq, "token")
      // ln((N+1)/(df+1)) computed EXACTLY as the oracle writes it — the
      // algebraically equal ln(N+1)−ln(df+1) rounds differently in doubles
      .withColumn("w",
        col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0))
      .groupBy(col(idCol))
      // doc length = Σ tf rides the scoring aggregate — no fourth pass
      // over the exploded tokens and no join-back
      .agg(count(lit(1)).as("n_terms"), sum(col("w")).as("wsum"),
        sum(col("tf")).as("n_tok"))
      .select(col(idCol), col("n_terms"),
        (col("wsum") / col("n_tok")).as("tfidf"))
  }
}
