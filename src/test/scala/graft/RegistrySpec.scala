package graft

/** Registry-wide smoke: the driver's correctness gate only proves queries
  * that return rows; a data-dependent predicate drifting to an empty result
  * would "pass" while testing nothing. Every registered query must return
  * rows at the smallest scale factor, and the oracle map must track the
  * registry exactly — since round 7 there is NO rows-only query left. */
class RegistrySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("every registered query runs at sf0.001 and returns rows") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001 — tests nothing")
    }
  }

  test("oracle SQL tracks the query registry") {
    // The rows-only set is EMPTY as of round 7: the last holdout
    // (sketch_cardinality) switched to the engine-portable HLL — md5
    // registers + pure-integer harmonic estimate — so even the
    // probabilistic sketch hash-matches its DuckDB replay. Everything
    // trained (k-means, BPE) is oracle-checked trajectory-and-all.
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
