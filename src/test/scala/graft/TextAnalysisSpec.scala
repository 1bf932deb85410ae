package graft

import graft.ext.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer: whitespace runs, case folding, empty edge") {
    val got = Seq("Hello  World\tfoo\nBar", "", "   ").toDF("t")
      .select(TextAnalysis.tokens($"t")).as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "world", "foo", "bar"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("bigram LM score: ppl matches a first-principles recomputation") {
    val got = graft.queries.ExtensionQueries.lmBigramScore(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap

    // independent model: plain Scala maps over the same corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
    val allBigrams = docs.flatMap { case (_, w) => w.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))) }
    val c12 = allBigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = allBigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap

    var checked = 0
    for ((id, w) <- docs if w.length >= 2) {
      val bs = w.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
      val (n, sbf, scf, typ, ppl) = got(id)
      assert(n == bs.size && sbf == bs.map(c12).sum && scf == bs.map(b => c1(b._1)).sum)
      assert(typ == sbf.toDouble / scf) // single IEEE division, bit-exact
      val expectPpl = math.exp(-bs.map(b => math.log(c12(b).toDouble / c1(b._1))).sum / bs.size)
      assert(math.abs(ppl - expectPpl) <= 1e-9 * expectPpl,
        s"doc $id ppl $ppl vs $expectPpl")
      assert(ppl >= 1.0 - 1e-12 && typ > 0.0 && typ <= 1.0)
      checked += 1
    }
    assert(checked > 0 && got.size == checked) // sub-2-token docs drop out on both sides
  }

  test("gopher rules: each rule trips on its own pathology") {
    val good = (("the cat is on the mat and it is happy today " * 3).trim) // 36 tokens, stopwords, alpha
    val short = "the cat is here"                                  // fails r_len only
    val noStop = ("lorem ipsum dolor sit amet " * 6).trim          // 30 tokens, no en stopwords
    val symbols = (("# # # the cat is " * 6).trim)                 // 36 tokens, 18 symbol words > 10%
    val longWords = (("the " + "supercalifragilistic " * 30).trim) // mean word len > 10
    val rows = Seq(good, short, noStop, symbols, longWords).toDF("t")
      .select(TextAnalysis.gopherRules($"t").as("r"))
      .select("r.n_tokens", "r.r_len", "r.r_word_len", "r.r_alpha", "r.r_stopwords", "r.r_symbol", "r.keep_doc")
      .collect()
    def flags(i: Int) = (rows(i).getBoolean(1), rows(i).getBoolean(2), rows(i).getBoolean(3),
      rows(i).getBoolean(4), rows(i).getBoolean(5), rows(i).getBoolean(6))
    assert(flags(0) == ((true, true, true, true, true, true)), s"good doc: ${rows(0)}")
    assert(!rows(1).getBoolean(1) && !rows(1).getBoolean(6))           // short: r_len fails
    assert(rows(2).getBoolean(1) && !rows(2).getBoolean(4) && !rows(2).getBoolean(6)) // no stopwords
    assert(!rows(3).getBoolean(5) && !rows(3).getBoolean(6), s"symbols: ${rows(3)}") // symbol soup
    assert(!rows(4).getBoolean(2) && !rows(4).getBoolean(6))           // long words
  }

  test("gopher rules: fixture corpus splits and the oracle projection is non-degenerate") {
    val df = graft.queries.ExtensionQueries.qualityRules(spark, sf)
    val n = df.count()
    val kept = df.filter(col("keep_doc")).count()
    assert(n > 0 && kept > 0 && kept < n, s"kept $kept of $n — rules must discriminate")
  }

  test("word n-grams: count and shape; shorter-than-n -> empty") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextAnalysis.wordNgrams($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("langid heuristic on natural sentences") {
    val got = Seq(
      "the cat is on the mat and it is happy",
      "el gato es feliz y la casa es grande",
      "le chat et les maisons des villes",
      "der hund und die katze ist ein tier",
      "没有 停用词 这 是 中文 的 测试",
      "xyzzy qwerty plugh").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect()
    assert(got.toSeq == Seq("en", "es", "fr", "de", "zh", "und"))
  }

  test("quality score: clean text beats punctuation soup and stubs") {
    val got = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park",
      "!!! ??? ### $$$ %%%",
      "ok").toDF("t")
      .select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    assert(got(0) > got(1) && got(0) > got(2))
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("subword proxy count: ceil(len/4) per word") {
    val got = Seq("abcd efghi x").toDF("t")
      .select(TextAnalysis.subwordCount($"t")).as[Long].collect().head
    assert(got == 1 + 2 + 1)
  }

  test("pii redaction scrubs every planted email/ip/phone") {
    val r = graft.queries.ExtensionQueries.piiRedaction(spark, sf)
    // the augmentation plants exactly one of each per doc
    assert(r.filter($"n_emails" =!= 1 || $"n_ips" =!= 1 || $"n_phones" =!= 1).count() == 0)
    // and nothing PII-shaped survives redaction
    assert(r.filter($"redacted".rlike("@|\\d{1,3}\\.\\d{1,3}\\.|\\+\\d")).count() == 0)
    assert(r.filter(!$"redacted".contains("<EMAIL>") ||
      !$"redacted".contains("<IP>") || !$"redacted".contains("<PHONE>")).count() == 0)
  }

  test("chunking covers every token with the configured overlap") {
    val chunks = graft.queries.ExtensionQueries.chunkDocuments(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n")).as[(Long, Long)]
      .collect().toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = toks(doc)
      // chunk starts advance by the stride and the last chunk ends at n
      assert(cs.map(_._3).toSeq.sorted == cs.indices.map(_ * 12L))
      assert(cs.map(c => c._3 + c._4).max == n)
      // every chunk_text has chunk_len tokens
      assert(cs.forall(c => c._5.split(" ").length == c._4))
    }
  }

  test("multimodal codec: real image decode, deterministic stub for the rest") {
    val docs = Tables.documents(spark, sf)
    val a = Multimodal.decodedTable(spark, docs).orderBy("media_id").collect()
    val b = Multimodal.decodedTable(spark, docs).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq) // decode is pure
    // video rows: the AVI/RIFF container parse is REAL — decoded dimensions
    // and frame count must equal the fixture's independently computed
    // values, and the first-frame luminance feature comes from actually
    // JPEG-decoded pixels (a probability vector, not the byte-stub's)
    val videos = Multimodal.decodedTable(spark, docs).filter($"kind" === "video")
      .select($"media_id", $"width", $"height", $"n_frames", $"feature")
      .as[(Long, Int, Int, Int, Array[Float])].collect()
    assert(videos.nonEmpty)
    videos.foreach { case (id, w, h, nf, feat) =>
      assert(w == Multimodal.AviFixture.width(id), s"media $id width $w")
      assert(h == Multimodal.AviFixture.height(id), s"media $id height $h")
      assert(nf == Multimodal.AviFixture.frames(id), s"media $id frames $nf")
      assert(math.abs(feat.sum - 1.0f) < 1e-3,
        s"media $id frame feature not a pixel histogram: ${feat.mkString(",")}")
    }
    // audio rows: javax.sound really parsed the WAV — decoded sample rate /
    // channels / frames must equal the fixture's independently computed
    // values, and the RMS envelope is a nonzero [0,1] vector
    val audio = Multimodal.decodedTable(spark, docs).filter($"kind" === "audio")
      .select($"media_id", $"width", $"height", $"n_frames", $"feature")
      .as[(Long, Int, Int, Int, Array[Float])].collect()
    assert(audio.nonEmpty)
    audio.foreach { case (id, rate, ch, nf, feat) =>
      assert(rate == Multimodal.WavFixture.sampleRate(id), s"media $id rate $rate")
      assert(ch == Multimodal.WavFixture.channels(id), s"media $id channels $ch")
      assert(nf == Multimodal.WavFixture.frames(id), s"media $id frames $nf")
      assert(feat.length == 8 && feat.forall(v => v > 0f && v <= 1f),
        s"media $id rms ${feat.mkString(",")}")
    }
    // image rows: ImageIO really decoded the PNG — width/height must equal the
    // fixture's independently computed dimensions, not the stub's hash-dims
    val images = Multimodal.decodedTable(spark, docs).filter($"kind" === "image")
      .select($"media_id", $"width", $"height").as[(Long, Int, Int)].collect()
    assert(images.nonEmpty)
    images.foreach { case (id, w, h) =>
      assert((w, h) == Multimodal.ImageFixture.dims(id), s"media $id decoded ${(w, h)}")
    }
    // and the luminance-histogram feature is a probability vector over pixels
    val feat = Multimodal.decodedTable(spark, docs).filter($"kind" === "image")
      .select($"feature").as[Array[Float]].head
    assert(math.abs(feat.sum - 1.0f) < 1e-3)
    // kinds cycle deterministically by id
    val kinds = Multimodal.decodedTable(spark, docs).orderBy("media_id")
      .select("kind").as[String].take(3)
    assert(kinds.toSeq == Seq("image", "audio", "video"))
  }

  test("AviCodec: container round-trip, frame extraction, corrupt fallback") {
    val avi = Multimodal.AviFixture.avi(7L)
    val parsed = Multimodal.AviCodec.parse(avi)
    assert(parsed.nonEmpty, "fixture AVI must parse")
    val p = parsed.get
    assert(p.width == Multimodal.AviFixture.width(7L))
    assert(p.height == Multimodal.AviFixture.height(7L))
    assert(p.totalFrames == Multimodal.AviFixture.frames(7L))
    assert(p.frames.length == p.totalFrames, "every 00dc chunk extracted")
    // frames are REAL JPEGs with distinct content per index
    val imgs = p.frames.map(Multimodal.AviCodec.decodeFrame)
    assert(imgs.forall(_.nonEmpty), "every frame JPEG-decodes")
    assert(p.frames.map(_.toSeq).distinct.length == p.frames.length,
      "per-frame payloads must differ")
    // non-AVI and truncated payloads degrade to None, never throw
    assert(Multimodal.AviCodec.parse("not a container".getBytes).isEmpty)
    assert(Multimodal.AviCodec.parse(avi.take(40)).isEmpty)
    val corrupt = avi.clone(); corrupt(20) = 0x7f.toByte
    Multimodal.AviCodec.parse(corrupt) // must not throw
  }

  test("WavCodec normalizes non-PCM16 audio before feature extraction") {
    import javax.sound.sampled._
    // an 8-bit unsigned PCM WAV: javax.sound parses it fine, so the codec
    // must CONVERT to PCM16 rather than reinterpret the raw bytes as
    // 16-bit pairs (which would halve the frame count and garble the RMS)
    val n = 400
    val pcm8 = Array.tabulate[Byte](n)(i => ((math.sin(i / 8.0) * 100) + 128).toByte)
    val fmt8 = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt8, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.WavCodec.decode(
      Multimodal.MediaRecord(1L, "audio", bos.toByteArray))
    assert(meta.isDefined)
    val m = meta.get
    assert(m.width == 8000 && m.height == 1, s"format wrong: $m")
    assert(m.n_frames == n, s"frame count wrong: ${m.n_frames} != $n")
    // a real sine has nonzero RMS in every window, bounded by full scale
    assert(m.feature.forall(v => v > 0f && v <= 1f), m.feature.mkString(","))
  }
}
