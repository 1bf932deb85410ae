package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the maps in SparkEntry must stay in sync. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every query is oracle-gated — the rows-only set is EMPTY") {
    // formerly non-SQL-expressible queries (sketches, LSH/ANN, multimodal)
    // now emit self-verifying gates whose expected values DuckDB can state
    // or recompute (exact counts + TRUE booleans), so the driver hash-checks
    // all 84
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only drift: $rowsOnly")
  }

  test("no duplicate keys in the SparkEntry source maps") {
    // Map literals silently keep the LAST duplicate key — a stale first copy
    // desyncs edits. Scala can't see this at runtime, so check the source.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val keyRe = """"([a-z0-9_]+)" ->""".r
    val counts = keyRe.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    SparkEntry.queries.keySet.foreach { k =>
      val expected = if (SparkEntry.oracleSql.contains(k)) 2 else 1
      assert(counts.getOrElse(k, 0) == expected,
        s"$k appears ${counts.getOrElse(k, 0)}x in source, expected $expected")
    }
  }

  test("oracle SQL has no tabs or CRs (driver JSON escaping)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\r"), s"$name has CR")
      assert(!sql.contains("\t"), s"$name has tab")
    }
  }
}
