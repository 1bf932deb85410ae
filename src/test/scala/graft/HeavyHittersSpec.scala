package graft

import graft.ext.MisraGries
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-machine Misra-Gries for cross-checking the
    * distributed merge path.
    */
  private def referenceMg(xs: Seq[String], cap: Int): Map[String, Long] = {
    val mg = new MisraGries(cap)
    xs.foldLeft(mg.zero)(mg.reduce)
  }

  test("under capacity the summary is the exact count map") {
    val toks = Seq("a", "b", "a", "c", "a", "b").toDS()
    val got = toks.select(new MisraGries(8).toColumn).head()
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("over capacity: every token with count > N/(cap+1) survives, " +
      "estimates never overcount") {
    // 3 heavy tokens + a long tail of singletons, shuffled deterministically
    val heavy = Seq.fill(50)("x") ++ Seq.fill(40)("y") ++ Seq.fill(30)("z")
    val tail = (0 until 80).map(i => s"t$i")
    val stream = new scala.util.Random(42).shuffle(heavy ++ tail)
    val n = stream.length
    val cap = 8
    val exact = stream.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val got = stream.toDS().repartition(7)
      .select(new MisraGries(cap).toColumn).head()
    val bound = n.toDouble / (cap + 1)
    exact.filter(_._2 > bound).foreach { case (t, c) =>
      assert(got.contains(t), s"heavy token $t (count $c, bound $bound) missing")
      assert(got(t) <= c, s"overcount for $t: ${got(t)} > $c")
      assert(got(t) >= c - bound, s"undercount beyond bound for $t")
    }
    got.foreach { case (t, est) =>
      assert(est <= exact.getOrElse(t, 0L), s"summary overcounts $t")
    }
  }

  test("distributed result obeys the same guarantee as the sequential " +
      "reference (property)") {
    val gen = Gen.listOfN(300, Gen.frequency(
      (5, Gen.const("hot1")), (4, Gen.const("hot2")),
      (3, Gen.const("hot3")), (8, Gen.choose(0, 60).map(i => s"cold$i"))))
    // few Spark rounds (they carry jobs), many sequential-reference rounds
    val prop = Prop.forAll(gen) { xs =>
      xs.isEmpty || {
        val cap = 6
        val bound = xs.length.toDouble / (cap + 1)
        val exact = xs.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
        val seq = referenceMg(xs, cap)
        exact.filter(_._2 > bound).forall { case (t, c) =>
          seq.contains(t) && seq(t) <= c && seq(t) >= c - bound
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
    // one distributed round cross-checked against the same guarantee
    val xs = gen.sample.get
    val cap = 6
    val bound = xs.length.toDouble / (cap + 1)
    val exact = xs.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val dist = xs.toDS().repartition(5)
      .select(new MisraGries(cap).toColumn).head()
    exact.filter(_._2 > bound).foreach { case (t, c) =>
      assert(dist.contains(t) && dist(t) <= c && dist(t) >= c - bound,
        s"token $t count $c est ${dist.get(t)} bound $bound")
    }
  }

  test("streaming windowed heavy hitters: bounded per-window summaries " +
      "catch the hot tokens") {
    val work = java.nio.file.Files.createTempDirectory("graft-streamhh")
    val in = work.resolve("in")
    java.nio.file.Files.createDirectories(in)
    // two 1-minute windows; 'hot' dominates the first, 'warm' the second
    def row(sec: Long, t: String) = s"""{"ms":${sec * 1000},"tok":"$t"}"""
    val w1 = (0 until 30).map(i => row(10 + i % 20, "hot")) ++
      (0 until 10).map(i => row(15, s"noise$i"))
    val w2 = (0 until 25).map(i => row(70 + i % 20, "warm")) ++
      (0 until 8).map(i => row(75, s"late$i"))
    java.nio.file.Files.writeString(in.resolve("a.json"),
      (w1 ++ w2).mkString("\n"))
    val stream = spark.readStream.schema("ms LONG, tok STRING")
      .json(in.toString)
    val agg = graft.streaming.StreamAnalytics.windowedHeavyHitters(stream,
      timestamp_millis($"ms"), $"tok", "1 minute", "10 minutes", capacity = 4)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("streamhh").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("streamhh")
      .select($"window.start".cast("long"), $"hitters").collect()
    assert(rows.length == 2, s"expected 2 windows, got ${rows.toSeq}")
    val byWindow = rows.map(r => (r.getLong(0), r.getMap[String, Long](1))).toMap
    val first = byWindow(0L); val second = byWindow(60L)
    assert(first.contains("hot") && first.size <= 4,
      s"window 1 summary wrong: $first")
    assert(second.contains("warm") && second.size <= 4,
      s"window 2 summary wrong: $second")
  }

  test("merge keeps summaries at capacity") {
    val mg = new MisraGries(4)
    val a = Map("a" -> 10L, "b" -> 8L, "c" -> 5L, "d" -> 3L)
    val b = Map("e" -> 9L, "f" -> 7L, "a" -> 2L, "g" -> 1L)
    val m = mg.merge(a, b)
    assert(m.size <= 4, s"merged summary exceeds capacity: $m")
    // the largest combined counts must survive the cut
    assert(m.contains("a"), s"a (12) must survive: $m")
  }
}
