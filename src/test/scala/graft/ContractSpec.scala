package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the maps in SparkEntry must stay in sync. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("rows-only queries are the documented non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set("d3_dedup_minhash_lsh", "d4_dedup_simhash",
      "d5_dedup_embedding", "t4_text_fingerprint", "v2_knn_lsh", "v3_knn_ivf",
      "m1_multimodal_decode", "m2_multimodal_frames")
    assert(rowsOnly == expected,
      s"rows-only drift: extra=${rowsOnly -- expected} missing=${expected -- rowsOnly}")
  }

  test("oracle SQL has no tabs or CRs (driver JSON escaping)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\r"), s"$name has CR")
      assert(!sql.contains("\t"), s"$name has tab")
    }
  }
}
