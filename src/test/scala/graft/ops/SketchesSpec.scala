package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("hll cardinality is within rsd of exact on real events") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val rows = Sketches.cardinalityWithExact(ev, Seq("event_type"), "user_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.15, s"${r.getString(0)}: approx=$approx exact=$exact err=$err")
    }
  }

  test("hll sketch is order-insensitive: same estimate after repartition") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.cardinality(df, Seq("event_type"), "user_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(ev) == run(ev.repartition(13)))
  }

  test("approx quantiles bracket the exact percentiles in rank") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val approx = Sketches.quantiles(ev, Seq.empty, "value", Seq(0.5, 0.9))
      .head().getSeq[Double](0)
    val exact = ev.stat.approxQuantile("value", Array(0.5, 0.9), 0.0) // relError 0 = exact
    // compare by rank: the approx value's true rank must be near the target
    val n = ev.count().toDouble
    Seq(0.5, 0.9).zip(approx).foreach { case (p, av) =>
      val rank = ev.filter(col("value") <= av).count() / n
      assert(math.abs(rank - p) < 0.02, s"p=$p approxValue=$av trueRank=$rank")
    }
    assert(exact.length == 2)
  }

  test("heavy hitters include the genuinely frequent event types") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val freq = Sketches.heavyHitters(ev, Seq("event_type"), support = 0.1)
      .head().getSeq[String](0).toSet
    val top = ev.groupBy("event_type").count().orderBy(col("count").desc)
      .head().getString(0)
    assert(freq.contains(top))
  }
}
