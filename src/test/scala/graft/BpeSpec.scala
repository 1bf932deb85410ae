package graft

import graft.ext.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merges on a known corpus match the hand-computed table") {
    // word counts: "low" x5, "lower" x2, "newest" x6, "widest" x3
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 4)
    // pair counts round 1: es=9 (newest+widest), st=9, lo=7, we=8(newest:2? no)
    // newest: n-e,e-w,w-e,e-s,s-t x6 ; widest: w-i,i-d,d-e,e-s,s-t x3
    // low: l-o,o-w x5 ; lower: l-o,o-w,w-e,e-r x2
    // e-s = 9, s-t = 9 -> tie, lexicographic: "e","s" < "s","t" -> es first
    assert(merges.head.left == "e" && merges.head.right == "s" &&
      merges.head.count == 9L)
    assert(merges(1).left == "es" && merges(1).right == "t" &&
      merges(1).count == 9L, s"got ${merges(1)}")
    // after est: low l-o,o-w x5; lower +w-e,e-r x2; newest n-e,e-w,w-est x6;
    // widest w-i,i-d,d-est x3 -> l-o 7, o-w 7, n-e 6, e-w 6, w-est 6 ...
    // l-o = o-w = 7 tie -> "l","o" < "o","w"
    assert(merges(2).left == "l" && merges(2).right == "o" &&
      merges(2).count == 7L, s"got ${merges(2)}")
    assert(merges(3).left == "lo" && merges(3).right == "w" &&
      merges(3).count == 7L, s"got ${merges(3)}")
  }

  test("encode segments words with the learned merge table") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(6)("newest"))
      .map(w => Tuple1(w)).toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 8)
    // 'low' and 'newest' both collapse to single tokens with enough merges
    // (the pair supply runs dry at 7 merges — the trainer must stop early,
    // not loop)
    assert(merges.length == 7, s"expected early stop at 7, got $merges")
    assert(Bpe.encode("low", merges).mkString("|") == "low")
    assert(Bpe.encode("newest", merges).mkString("|") == "newest")
    // unseen word segments into learned subwords without crashing
    val segs = Bpe.encode("lowest", merges)
    assert(segs.nonEmpty && segs.mkString("") == "lowest")
  }

  test("astral-plane text splits into code points, not surrogate halves") {
    val emoji = new String(Character.toChars(0x1F600)) // 😀, outside the BMP
    val word = s"a${emoji}b"
    val syms = Bpe.codePointSyms(word)
    assert(syms == Seq("a", emoji, "b"), s"got $syms")
    // and the trainer survives a corpus containing it (no shuffled-surrogate
    // corruption): merges stay well-formed strings
    val docs = Seq.fill(4)(Tuple1(word + " " + word)).toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 2)
    assert(merges.nonEmpty)
    merges.foreach { m =>
      assert(!m.token.contains('�'), s"replacement char leaked into $m")
    }
    assert(merges.head.count == 8L, s"got ${merges.head}") // 4 docs x 2 words
  }

  test("applyMerge is left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
  }

  test("BpeEncode expression matches driver-side encode under codegen") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(6)("newest"))
      .map(w => Tuple1(w)).toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 8)
    val got = Seq(Tuple1("low newest lowest unseen"))
      .toDF("text")
      .select(graft.expr.BpeFunctions.bpeEncode($"text", merges))
      .head().getSeq[String](0)
    val expect = Seq("low", "newest", "lowest", "unseen")
      .flatMap(w => Bpe.encode(w, merges))
    assert(got == expect, s"got $got expect $expect")
    // lossless: concatenation reconstructs the text minus spaces
    assert(got.mkString("") == "lownewestlowestunseen")
  }

  test("trainer is deterministic and gates hold on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val m1 = Bpe.train(docs, "text", rounds = 5)
    val m2 = Bpe.train(docs, "text", rounds = 5)
    assert(m1 == m2)
    assert(m1.length == 5)
    assert(m1.forall(_.count > 0))
    assert(m1.map(_.token).distinct.length == 5)
  }
}
