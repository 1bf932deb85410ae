package graft

import graft.expr.CriTime
import graft.logs.{LogSelector, LogPathLayout, SinceDuration}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY §5's engine test plan): timestamp round-trips and
  * selector grammar over generated inputs — no Spark session needed, these
  * drive the JVM-static kernels directly.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property and assert it holds (no scalatestplus bridge
    * in the offline cache, so drive ScalaCheck's runner directly).
    */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(gen) { a => f(a); true })


  // epoch nanos within RFC3339's 4-digit-year range, positive era
  private val nanosGen: Gen[Long] =
    Gen.chooseNum(0L, 4102444799999999999L) // 1970..2099-12-31T23:59:59.999999999

  test("property: render(ns) parses back to the identical nanos") {
    forAll(nanosGen) { ns =>
      val sec = java.lang.Math.floorDiv(ns, 1000000000L)
      val frac = java.lang.Math.floorMod(ns, 1000000000L)
      val inst = java.time.Instant.ofEpochSecond(sec, frac)
      // variable-width form (Instant.toString: 0/3/6/9 fraction digits)...
      val isoVar = inst.toString
      // ...and the fixed-width 9-digit form the engine's own renderer emits
      val isoFixed = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.nnnnnnnnn'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(inst)
      Seq(isoVar, isoFixed).foreach { iso =>
        val parsed = CriTime.parseNanosOrNull(UTF8String.fromString(iso))
        assert(parsed != null && parsed.longValue() == ns, s"iso=$iso")
      }
    }
  }

  test("property: fast path agrees with java.time on offset timestamps") {
    val gen = for {
      ns <- nanosGen
      offH <- Gen.chooseNum(-14, 14)
      offM <- Gen.oneOf(0, 15, 30, 45)
    } yield (ns, offH, offM)
    forAll(gen) { case (ns, offH, offM) =>
      val sec = java.lang.Math.floorDiv(ns, 1000000000L)
      val frac = java.lang.Math.floorMod(ns, 1000000000L)
      val off = java.time.ZoneOffset.ofHoursMinutes(offH, if (offH < 0) -offM else offM)
      val odt = java.time.Instant.ofEpochSecond(sec, frac).atOffset(off)
      val iso = odt.format(java.time.format.DateTimeFormatter.ofPattern(
        "yyyy-MM-dd'T'HH:mm:ss.nnnnnnnnnxxx"))
      val parsed = CriTime.parseNanosOrNull(UTF8String.fromString(iso))
      assert(parsed != null && parsed.longValue() == ns, s"iso=$iso")
    }
  }

  test("property: selector parse inverts rendering for any label map") {
    val keyGen = Gen.oneOf(graft.logs.LogSchema.selectorKeys.toSeq)
    val valGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val mapGen = Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(4))
    forAll(mapGen) { labels =>
      val rendered = labels.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")
      assert(LogSelector.parse(rendered).labels == labels)
    }
  }

  test("property: since grammar accepts exactly <n><s|m|h>") {
    forAll(Gen.zip(Gen.chooseNum(0L, 999999L), Gen.oneOf("s", "m", "h"))) { case (n, u) =>
      val expected = u match { case "s" => n; case "m" => n * 60; case _ => n * 3600 }
      assert(SinceDuration.parseSeconds(s"$n$u") == expected)
    }
  }

  test("property: windowHashes — equal token windows hash equal, distinct ones differ") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val wordsGen = Gen.listOfN(12, wordGen)
    def wh(words: Seq[String], k: Int): Seq[Long] =
      graft.expr.HashKernels.windowHashes(
        new GenericArrayData(words.map(UTF8String.fromString).toArray), k)
        .toLongArray().toSeq
    forAll(Gen.zip(wordsGen, Gen.chooseNum(2, 5))) { case (words, k) =>
      val hs = wh(words, k)
      assert(hs.length == math.max(words.length - k + 1, 0))
      // the rolling slide must agree with hashing each window from scratch
      val direct = words.sliding(k).map(w => wh(w, k).head).toSeq
      assert(hs == direct)
      // hash equality must coincide with window equality (64-bit hashes on
      // a 5-word vocabulary: a collision here means the slide is broken)
      val wins = words.sliding(k).toSeq
      for (i <- wins.indices; j <- wins.indices)
        assert((hs(i) == hs(j)) == (wins(i) == wins(j)),
          s"windows $i/$j: ${wins(i)} vs ${wins(j)}")
    }
    // below-k input yields an empty array, not a crash
    assert(wh(Seq("one"), 2).isEmpty)
  }

  test("property: simHashText is whitespace-layout and case invariant") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(wordGen)
    def fp(s: String): Long = graft.expr.HashKernels.simHashText(UTF8String.fromString(s))
    forAll(wordsGen) { words =>
      val canonical = fp(words.mkString(" "))
      // extra/odd whitespace between the same tokens: identical fingerprint
      assert(fp(words.mkString("  ")) == canonical)
      assert(fp(words.mkString("\t")) == canonical)
      assert(fp(" " + words.mkString("\n") + "  ") == canonical)
      // ASCII case folding: identical fingerprint
      assert(fp(words.map(_.toUpperCase(java.util.Locale.ROOT)).mkString(" ")) == canonical)
      // duplicated content doubles every vote but flips no sign
      assert(fp((words ++ words).mkString(" ")) == canonical)
    }
  }

  test("property: simHashText near-duplicates have small hamming distance") {
    val wordGen = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val wordsGen = Gen.listOfN(60, wordGen)
    def fp(s: String): Long = graft.expr.HashKernels.simHashText(UTF8String.fromString(s))
    forAll(wordsGen) { words =>
      val a = fp(words.mkString(" "))
      val b = fp((words.take(59) :+ "changedword").mkString(" "))
      // one token of sixty changed: most bit-votes keep their sign
      assert(graft.expr.HashKernels.hamming64(a, b) <= 24,
        s"near-dup hamming too large: ${graft.expr.HashKernels.hamming64(a, b)}")
    }
  }

  test("property: glob always has the layout's fixed arity") {
    val keyGen = Gen.oneOf(graft.logs.LogSchema.selectorKeys.toSeq)
    val valGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    forAll(Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(3))) { labels =>
      val glob = LogPathLayout.buildGlob("/r", labels, "parquet")
      // root + 11 layout segments, always
      assert(glob.stripPrefix("/r/").split("/").length == LogPathLayout.segments.size)
      // pod_id is not a positional path segment (the layout records no
      // uid) — every path-borne label must appear in the glob
      labels.filterNot(_._1 == "pod_id")
        .foreach { case (_, v) => assert(glob.contains(v)) }
    }
  }
}
