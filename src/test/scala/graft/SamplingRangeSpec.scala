package graft

import graft.ext.{RangeJoin, Sampling}
import org.apache.spark.sql.functions._

class SamplingRangeSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("hash sample is deterministic and close to the requested fraction") {
    val a = Sampling.hashSample(docs, "doc_id", 0.1).select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.1).select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same input + fraction must select the same rows")
    val n = docs.count().toDouble
    assert(a.size > n * 0.03 && a.size < n * 0.25, s"10% sample selected ${a.size}/$n")
    // monotone: a smaller fraction is a subset of a larger one
    val small = Sampling.hashSample(docs, "doc_id", 0.05).select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("train/val split is a partition and stays stable under growth") {
    val split = Sampling.trainValSplit(docs, "doc_id", 0.1)
    assert(split.count() == docs.count())
    assert(split.filter($"split".isin("train", "val")).count() == docs.count())
    // stability: the split of a subset agrees with the split of the whole
    val sub = Sampling.trainValSplit(docs.filter($"doc_id" < 100), "doc_id", 0.1)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val whole = split.filter($"doc_id" < 100)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(sub == whole)
  }

  test("token-budget mixture: thresholds derive from actual token mass") {
    val withTok = docs.withColumn("n_tokens",
      graft.ext.TextAnalysis.tokenCount($"text").cast("long"))
    val kept = Sampling.tokenBudgetMixture(withTok, "doc_id", "source", "n_tokens",
      weights = Map("src0" -> 0.4, "src1" -> 0.2), defaultWeight = 0.02,
      budgetTokens = 8000.0)
    // hand-recompute every threshold from the per-source totals
    val totals = withTok.groupBy($"source").agg(sum($"n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val thrs = kept.select($"source", $"mix_threshold").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, thr) <- thrs) {
      val w = src match { case "src0" => 0.4; case "src1" => 0.2; case _ => 0.02 }
      val expect = math.floor(math.min(1.0, w * 8000.0 / totals(src)) * 65536.0).toLong
      assert(thr == expect, s"$src threshold $thr vs $expect")
    }
    // over-budgeted sources keep every doc; the long tail genuinely shrinks
    val keptBySource = kept.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docsBySource = docs.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBySource("src0") == docsBySource("src0"))
    assert(keptBySource("src1") == docsBySource("src1"))
    val tail = docsBySource.keySet -- Set("src0", "src1")
    assert(tail.map(s => keptBySource.getOrElse(s, 0L)).sum <
      tail.map(docsBySource).sum / 2, "tail sources must downsample")
    // determinism
    val again = Sampling.tokenBudgetMixture(withTok, "doc_id", "source", "n_tokens",
      Map("src0" -> 0.4, "src1" -> 0.2), 0.02, 8000.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept.select($"doc_id").as[Long].collect().toSet)
  }

  test("stratified sample honors per-stratum fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 0.0), default = 1.0)
    val bySource = sampled.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySource.contains("src0"), "src0 at fraction 0 must vanish")
    val full = docs.filter($"source" =!= "src0").count()
    assert(bySource.values.sum == full, "default 1.0 keeps every other stratum whole")
  }

  test("shard export writes one hive dir per shard and the manifest matches") {
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Sampling.exportShards(docs, "doc_id", out, nShards = 4)
      .as[(Long, Long)].collect().toMap
    // every shard dir exists and row counts round-trip through the files
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard_id=")).sorted
    assert(dirs.toSeq == manifest.keys.toSeq.sorted.map(k => s"shard_id=$k"))
    assert(manifest.values.sum == docs.count())
    // assignment is stable: re-deriving shards from ids matches the files
    val reread = spark.read.parquet(out)
      .select($"doc_id", $"shard_id".cast("long")).as[(Long, Long)].collect()
    val expect = Sampling.withShard(docs, "doc_id", 4)
      .select($"doc_id", $"shard_id").as[(Long, Long)].collect().toMap
    assert(reread.forall { case (id, s) => expect(id) == s })
  }

  test("bucketized range join matches the brute-force interval count") {
    val ev = Tables.events(spark, sf)
      .withColumn("time_us", graft.logs.CriFunctions.nanosToMicros($"ts"))
    val errors = ev.filter($"event_type" === "error").select($"event_id", $"time_us")
    val w = 60000000L
    val got = RangeJoin.countInWindow(errors, "event_id", "time_us",
        ev.select($"time_us"), "time_us", w)
      .select($"event_id", $"n_in_window").as[(Long, Long)].collect().toMap
    val all = ev.select($"time_us").as[Long].collect().sorted
    val expect = errors.select($"event_id", $"time_us").as[(Long, Long)].collect().map {
      case (id, t) =>
        // count via binary search over the sorted timestamps: (t-w, t]
        import java.util.Arrays.binarySearch
        def countLE(x: Long): Int = {
          val i = binarySearch(all, x)
          if (i >= 0) { var j = i; while (j + 1 < all.length && all(j + 1) == x) j += 1; j + 1 }
          else -i - 1
        }
        id -> (countLE(t) - countLE(t - w)).toLong
    }.toMap
    assert(got == expect)
    // the plan must be an equi-join on the bucket, not a nested-loop theta join
    val plan = RangeJoin.countInWindow(errors, "event_id", "time_us",
      ev.select($"time_us"), "time_us", w).queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"theta join leaked:\n${plan.take(1500)}")
  }
}
