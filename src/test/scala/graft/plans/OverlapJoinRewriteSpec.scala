package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OverlapJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  def a = Seq((1L, 0L, 100000L), (2L, 200000L, 300000L), (3L, 999999999L, 999999999L))
    .toDF("a_id", "a_s", "a_e")
  def b = Seq((10L, 50000L, 150000L), (20L, 310000L, 320000L), (30L, 0L, 999999L))
    .toDF("b_id", "b_s", "b_e")

  private def overlap = col("a_s") <= col("b_e") && col("b_s") <= col("a_e")

  test("pure overlap join plans as a hash equi-join, not nested-loop") {
    val j = a.join(b, overlap)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"expected bucketed equi-join:\n$plan")
    assert(plan.contains("__ov_bucket"), s"rewrite did not fire:\n$plan")
  }

  test("rewrite preserves inner-join results exactly, once per pair") {
    // pairs share MANY buckets at /16 width — each must appear once
    val got = a.join(b, overlap).select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = Seq((1L, 10L), (1L, 30L), (2L, 30L))
    assert(got == naive, s"got $got")
  }

  test("random fuzz: rewrite equals the naive join, multiplicities included") {
    val rnd = new scala.util.Random(3)
    val mk = (n: Int, p: String) => Seq.tabulate(n) { i =>
      val s = rnd.nextInt(1 << 20).toLong
      (i.toLong, s, s + rnd.nextInt(1 << 18))
    }.toDF(s"${p}_id", s"${p}_s", s"${p}_e")
    val x = mk(150, "a")
    val y = mk(150, "b")
    val fast = x.join(y, overlap).select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val off = spark.conf.getOption("spark.graft.overlapJoin.enabled")
    spark.conf.set("spark.graft.overlapJoin.enabled", "false")
    try {
      val naive = x.join(y, overlap).select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fast == naive)
    } finally off match {
      case Some(v) => spark.conf.set("spark.graft.overlapJoin.enabled", v)
      case None => spark.conf.unset("spark.graft.overlapJoin.enabled")
    }
  }

  test("inverted interval rows still match per the raw predicate") {
    // a row with start > end matches b iff b covers [end, start] — the
    // rewrite normalizes with least/greatest instead of dropping the row
    val inv = Seq((7L, 10L, 5L)).toDF("a_id", "a_s", "a_e")
    val bb = Seq((1L, 0L, 20L), (2L, 6L, 8L), (3L, 11L, 12L))
      .toDF("b_id", "b_s", "b_e")
    val got = inv.join(bb, overlap).select(col("b_id"))
      .collect().map(_.getLong(0)).toSet
    // b1: 10<=20 && 0<=5 yes; b2: 10<=8 no; b3: 10<=12 && 11<=5 no
    assert(got == Set(1L), s"got $got")
  }

  test("negative coordinates bucket correctly (arithmetic shift floors)") {
    val x = Seq((1L, -200000L, -100000L), (2L, -50L, 50L))
      .toDF("a_id", "a_s", "a_e")
    val y = Seq((10L, -150000L, -120000L), (20L, -10L, 10L), (30L, 100L, 200L))
      .toDF("b_id", "b_s", "b_e")
    val j = x.join(y, overlap)
    assert(j.queryExecution.executedPlan.toString.contains("__ov_bucket"))
    val got = j.select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 20L)), s"got $got")
  }

  test("semi joins are not rewritten (both-side explode would duplicate)") {
    val l = Seq((1L, 0L, 100000L)).toDF("a_id", "a_s", "a_e")
    val p = l.join(b, overlap, "left_semi").queryExecution.executedPlan.toString
    assert(!p.contains("__ov_bucket"), s"semi join must stay un-rewritten:\n$p")
    assert(l.join(b, overlap, "left_semi").count() == 1)
  }

  test("joins with an equi key are left alone; rule can be disabled") {
    val l = Seq((1L, 0L, 5L)).toDF("k", "s1", "e1")
    val r = Seq((1L, 2L, 9L)).toDF("k2", "s2", "e2")
    val j = l.join(r, col("k") === col("k2") &&
      col("s1") <= col("e2") && col("s2") <= col("e1"))
    assert(!j.queryExecution.executedPlan.toString.contains("__ov_bucket"))
    assert(j.count() == 1)
  }

  test("point-in-range joins stay with the range rule's single-side explode") {
    val points = Seq((1L, 7L)).toDF("id", "p")
    val ranges = Seq((0L, 10L, "r")).toDF("lo", "hi", "tag")
    val plan = points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__range_bucket") && !plan.contains("__ov_bucket"),
      s"point-in-range must use RangeJoinRewrite:\n$plan")
  }

  test("rewrite fires through projections and filters stacked above the inputs") {
    // the shapes users actually write: derived columns + a filter between
    // the base relation and the join — the rewrite must see through them
    val aa = a.withColumn("a_len", col("a_e") - col("a_s"))
      .filter(col("a_id") < 3)
      .select(col("a_id"), col("a_s"), col("a_e"), col("a_len"))
    val bb = b.filter(col("b_id") >= 10)
      .withColumn("b_tag", concat(lit("s"), col("b_id")))
    val j = aa.join(bb, overlap)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("__ov_bucket"), s"rewrite defeated by nesting:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    val got = j.select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 30L), (2L, 30L)), s"got $got")
  }

  test("rewrite fires on computed (non-attribute) bounds") {
    // bounds that are expressions over one side, not bare columns — e.g.
    // the unix_timestamp(...) users inline instead of pre-projecting
    val cond = (col("a_s") + lit(0L)) <= (col("b_e") + lit(0L)) &&
      (col("b_s") + lit(0L)) <= (col("a_e") + lit(0L))
    val j = a.join(b, cond)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("__ov_bucket"), s"rewrite defeated by expr bounds:\n$plan")
    val got = j.select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 30L), (2L, 30L)), s"got $got")
  }

  test("generic theta join over four unrelated columns stays result-correct") {
    // the documented trade-off case (OverlapJoinRewrite scaladoc): the
    // pattern also matches a.x <= b.p AND b.q <= a.y where the four
    // columns are NOT two intervals. The rewrite treats (x,y)/(q,p) as
    // possibly-inverted intervals via least/greatest and must still be
    // RESULT-exact — compare against the rule-disabled nested-loop run
    val ta = Seq((1L, 5L, 900L), (2L, 300L, 100L), (3L, 950L, 40L))
      .toDF("t_id", "x", "y")
    val tb = Seq((10L, 20L, 800L), (20L, 500L, 999L), (30L, 1L, 2L))
      .toDF("u_id", "p", "q")
    val cond = col("x") <= col("p") && col("q") <= col("y")
    def run() = ta.join(tb, cond).select(col("t_id"), col("u_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rewritten = run()
    val plan = ta.join(tb, cond).queryExecution.executedPlan.toString
    assert(plan.contains("__ov_bucket"), s"expected the rule to fire:\n$plan")
    spark.conf.set("spark.graft.overlapJoin.enabled", "false")
    try {
      val naive = run()
      assert(rewritten == naive, s"rewritten=$rewritten naive=$naive")
    } finally spark.conf.set("spark.graft.overlapJoin.enabled", "true")
  }

  test("rewrite + AQE: adaptive replan keeps the bucketed equi-join result") {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      // checkpointed side feeding both join inputs — the production shape
      // (session_overlap) where AQE rewrites stages at runtime
      val base = a.localCheckpoint()
      val left = base.filter(col("a_id") % 2 === 1)
      val right = base.filter(col("a_id") % 2 === 0)
        .select(col("a_id").as("b_id"), col("a_s").as("b_s"), col("a_e").as("b_e"))
      val j = left.join(right, overlap)
      assert(j.queryExecution.executedPlan.toString.contains("__ov_bucket"))
      val got = j.select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // a1=[0,100000] vs a2=[200000,300000]: no; a3 point vs a2: no
      assert(got == Seq(), s"got $got")
      // and cases with matches, through the same checkpoint (both probe
      // intervals stay under the maxBucketsPerInterval guard)
      val probes = Seq((99L, 0L, 200000L), (98L, 999999000L, 1000000000L))
        .toDF("b_id", "b_s", "b_e")
      val got2 = left.join(probes, overlap).select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got2 == Seq((1L, 99L), (3L, 98L)), s"got $got2")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("fuzz: API bucketization == rewrite == naive join, inverted rows included") {
    // the three overlap paths (explicit Intervals.overlapJoin, the
    // optimizer rewrite of the raw predicate, and the naive nested-loop
    // join with the rule disabled) must agree on EVERY input — including
    // inverted (start > end) intervals, which all paths now normalize
    val rnd = new scala.util.Random(11)
    val mk = (n: Int, p: String) => Seq.tabulate(n) { i =>
      val s = rnd.nextInt(1 << 20).toLong
      val e = if (rnd.nextInt(5) == 0) s - rnd.nextInt(1 << 10) // inverted
              else s + rnd.nextInt(1 << 14)
      (i.toLong, s, e)
    }.toDF(s"${p}_id", s"${p}_s", s"${p}_e")
    val x = mk(120, "a")
    val y = mk(120, "b")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaApi = pairs(graft.ops.Intervals.overlapJoin(
      x, y, "a_s", "a_e", "b_s", "b_e", bucketWidth = 4096))
    val viaRewrite = pairs(x.join(y, overlap))
    val off = spark.conf.getOption("spark.graft.overlapJoin.enabled")
    spark.conf.set("spark.graft.overlapJoin.enabled", "false")
    try {
      val naive = pairs(x.join(y, overlap))
      assert(viaApi == naive, "explicit API diverged from the naive join")
      assert(viaRewrite == naive, "rewrite diverged from the naive join")
      assert(naive.nonEmpty, "fuzz produced no pairs — tests nothing")
    } finally off match {
      case Some(v) => spark.conf.set("spark.graft.overlapJoin.enabled", v)
      case None => spark.conf.unset("spark.graft.overlapJoin.enabled")
    }
  }

  test("pathologically wide interval fails with the conf-named error") {
    val wide = Seq((1L, 0L, Long.MaxValue / 2)).toDF("a_id", "a_s", "a_e")
    val e = intercept[Exception] {
      wide.join(b, overlap).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("maxBucketsPerInterval")),
      s"got: ${msgs(e)}")
  }
}
