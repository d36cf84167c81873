package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  def points = Seq((1L, 5L), (2L, 70000L), (3L, 131073L), (4L, 999999999L))
    .toDF("id", "p")
  def ranges = Seq((0L, 65535L, "a"), (65536L, 131071L, "b"), (131072L, 131075L, "c"))
    .toDF("lo", "hi", "tag")

  test("pure range join plans as a hash equi-join, not nested-loop") {
    val j = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"expected bucketed equi-join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("rewrite preserves inner-join results exactly") {
    val got = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("id"), col("tag")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("left outer keeps unmatched points; ranges spanning many buckets match once") {
    val wide = Seq((0L, 400000L, "w")).toDF("lo", "hi", "tag") // spans 7 /16 buckets
    val j = points.join(wide, col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      .select(col("id"), col("tag"))
    val got = j.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("w")), (2L, Some("w")), (3L, Some("w")), (4L, None)))
    assert(!j.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }

  test("inverted and point ranges behave; flipped operand order detected") {
    val odd = Seq((10L, 5L, "inverted"), (70000L, 70000L, "pt")).toDF("lo", "hi", "tag")
    // written as lo <= p / hi >= p (flipped) — still detected
    val got = points.join(odd, col("lo") <= col("p") && col("hi") >= col("p"))
      .select(col("id"), col("tag")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "pt")))
  }

  test("joins that already have an equi key are left alone") {
    val l = Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L), (2L, 5L, 6L)).toDF("k2", "lo", "hi")
    val j = l.join(r, col("k") === col("k2") && col("v") >= col("lo") && col("v") <= col("hi"))
    assert(!j.queryExecution.executedPlan.toString.contains("__range_bucket"))
    assert(j.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("rule can be disabled by conf") {
    // a point is a degenerate interval, so the overlap rule would pick
    // this join up once the range rule steps aside — disable both to
    // reach the planner's raw nested loop
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    spark.conf.set("spark.graft.overlapJoin.enabled", "false")
    try {
      val j = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(j.queryExecution.executedPlan.toString.contains("NestedLoop"))
    } finally {
      spark.conf.set("spark.graft.rangeJoin.enabled", "true")
      spark.conf.set("spark.graft.overlapJoin.enabled", "true")
    }
  }

  test("matches the hand-bucketed GeoIp.enrich on real data") {
    val dir = "/root/testdata/sf0.001"
    val ipBase = 167772160L
    val geo = graft.T.t(spark, dir, "nation").select(
      (lit(ipBase) + col("n_nationkey").cast("long") * 64).as("start_ip_num"),
      (lit(ipBase) + col("n_nationkey").cast("long") * 64 + 63).as("end_ip_num"),
      col("n_name").as("country_code"), col("n_name").as("country_name"))
    val ev = graft.T.events(spark, dir).select(col("event_id"),
      format_string("10.0.%d.%d", expr("user_id div 256"), expr("user_id % 256")).as("address"))
    val manual = graft.enrich.GeoIp.enrich(ev, geo)
      .select(col("event_id"), col("country_code"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val auto = ev
      .withColumn("ip", graft.functions.GraftFunctions.ip_to_num(col("address")))
      .join(geo, col("ip") >= col("start_ip_num") && col("ip") <= col("end_ip_num"), "left_outer")
      .select(col("event_id"), col("country_code"))
    assert(!auto.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(auto.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet == manual)
  }

  test("rewrite is output-preserving: no __range_bucket leak, Union arity holds") {
    val j = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
    val physOut = j.queryExecution.executedPlan.output.map(_.name)
    assert(!physOut.contains("__range_bucket"), physOut.mkString(","))
    assert(physOut.length == j.columns.length)
    // positional parent over the raw (unprojected) join result
    assert(j.union(j).collect().length == 6)
  }

  test("catch-all wide range row fails with the documented guard error") {
    val wide = Seq((0L, Long.MaxValue, "all")).toDF("lo", "hi", "tag")
    val j = points.join(wide, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(!j.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val e = intercept[Throwable] { j.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("maxBucketsPerRange"))),
      s"wanted guard error, got: $e")
  }

  test("inverted wide sentinel row matches nothing instead of exploding") {
    // pre-guard, sequence() defaulted to step -1 and built a 2^47-element
    // descending bucket list for this row
    val inv = Seq((Long.MaxValue, 0L, "inv"), (0L, 65535L, "a"))
      .toDF("lo", "hi", "tag")
    val got = points.join(inv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a")))
  }

  test("maxBucketsPerRange conf tightens/loosens the guard") {
    val wide = Seq((0L, 400000L, "w")).toDF("lo", "hi", "tag") // 7 buckets
    def run() = points
      .join(wide, col("p") >= col("lo") && col("p") <= col("hi"))
      .count()
    spark.conf.set("spark.graft.rangeJoin.maxBucketsPerRange", "2")
    try intercept[Throwable] { run() }
    finally spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerRange")
    assert(run() == 3L) // default 4096 admits it
  }

  test("randomized equivalence: rewrite on vs off agree on 200 intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong() % 500000L)).toDF("id", "p")
    val rngs = (1L to 200L).map { i =>
      val a = rnd.nextLong() % 500000L
      val b = a + (rnd.nextInt(200000) - 20000) // some inverted
      (i, a, b)
    }.toDF("rid", "lo", "hi")
    def run(): Set[(Long, Long)] =
      pts.join(rngs, col("p") >= col("lo") && col("p") <= col("hi"))
        .select(col("id"), col("rid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withRule = run()
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    val without = try run() finally
      spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    assert(withRule == without)
    assert(withRule.nonEmpty)
  }
}
