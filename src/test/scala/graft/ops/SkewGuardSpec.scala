package graft.ops

import org.apache.spark.sql.functions._
import graft.{BenchSkew, SparkSpec}

/** The planted-skew envelope (BenchSkew scenarios) asserted, not just
  * benched: each guard must CHANGE the outcome on a planted hot
  * key/bucket — quadratic pair listing suppressed, pathological interval
  * failed loudly — rather than merely survive uniform data. */
class SkewGuardSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("planted hot bucket: maxBucket suppresses the quadratic pair listing") {
    // 120 verbatim clones of doc 0: unguarded banding must emit at least
    // the C(120,2) = 7140 clone-clone pairs from the degenerate bucket
    val unguarded = BenchSkew
      .minhashHotBucket(spark, dir, clones = 120, maxBucket = 0)
      .filter(col("id_b") >= 1000001L).count()
    assert(unguarded >= 7140L,
      s"expected the quadratic clone-pair mass without the cap, got $unguarded")
    // with the cap, the hot bucket is dropped whole: no clone pairs...
    val guarded = BenchSkew
      .minhashHotBucket(spark, dir, clones = 120, maxBucket = 64)
    assert(guarded.filter(col("id_b") >= 1000001L).count() == 0L,
      "hot bucket must be dropped by maxBucket")
    // ...while the rest of the corpus still pairs normally
    assert(guarded.count() > 0L, "non-degenerate buckets must survive")
  }

  test("overlapJoin API: pathological interval hits the conf-named guard") {
    import spark.implicits._
    val wide = Seq((1L, 0L, Long.MaxValue / 4)).toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, 50L, 150L)).toDF("b_id", "b_s", "b_e")
    val e = intercept[Exception] {
      Intervals.overlapJoin(wide, b, "a_s", "a_e", "b_s", "b_e",
        bucketWidth = 3600).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("maxBucketsPerInterval")),
      s"got: ${msgs(e)}")
  }

  test("overlap hot bucket: bounded output, no nested-loop plan") {
    val j = BenchSkew.overlapHotBucket(spark, dir, hotRows = 500)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"skewed overlap join must stay a bucketed equi-join:\n$plan")
    // every hot-a row overlaps every hot-b row (same hour), nothing blows up
    assert(j.count() > 0L)
  }

  test("salted planted hot key: salt spreads the key, totals stay exact") {
    val out = BenchSkew.saltedPlantedHotKey(spark, dir)
      .filter(col("event_type") === "planted_hot_key")
      .collect()
    assert(out.length == 1)
    // the planted copy duplicated every event under one key: its count
    // must equal the full event count (exactness through the salt)
    val total = graft.T.events(spark, dir).count()
    assert(out.head.getAs[Long]("n") == total,
      s"salted count ${out.head.getAs[Long]("n")} != $total")
  }
}
