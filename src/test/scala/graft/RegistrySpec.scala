package graft

/** Registry-wide smoke: the driver's correctness gate only proves queries
  * that return rows; a data-dependent predicate drifting to an empty result
  * would "pass" while testing nothing. Every registered query must return
  * rows at the smallest scale factor, and the oracle map must track the
  * registry exactly (modulo the documented rows-only set below — currently
  * one entry). */
class RegistrySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("every registered query runs at sf0.001 and returns rows") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001 — tests nothing")
    }
  }

  test("oracle SQL tracks the query registry") {
    // rows-only by design: sketch ESTIMATES aren't engine-portable (the
    // one genuinely probabilistic output; its error bound is asserted in
    // SketchesSpec). Everything trained — k-means and BPE included — is
    // oracle-checked trajectory-and-all as of round 7.
    val rowsOnly = Set("sketch_cardinality")
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly,
      s"queries without an oracle beyond the documented rows-only set: " +
        s"${missing -- rowsOnly}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
