package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of join picks latest right row at-or-before left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (20L, ts("2024-01-01 09:00:00"), 3.0), // equal ts -> inclusive
      (20L, ts("2024-01-01 10:00:00"), 4.0)) // after left -> excluded
      .toDF("k", "ts", "v")
    val got = AsOf.backward(left, right, "k", "ts", Seq("v"))
      .orderBy("id")
      .select("id", "asof_v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("left row with no preceding right row gets NULLs") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 08:00:00"))).toDF("id", "k", "ts")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val r = AsOf.backward(left, right, "k", "ts", Seq("v")).head()
    assert(r.isNullAt(r.fieldIndex("asof_v")))
    assert(r.isNullAt(r.fieldIndex("asof_ts")))
  }

  test("tolerance bounds staleness: too-old matches become NULL") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // click 20 min earlier -> ok
      (2L, 10L, ts("2024-01-01 12:00:00")))   // click 140 min earlier -> stale
      .toDF("id", "k", "ts")
    val right = Seq((10L, ts("2024-01-01 09:40:00"), 1.0)).toDF("k", "ts", "v")
    val got = AsOf.backward(left, right, "k", "ts", Seq("v"),
        toleranceSeconds = Some(3600))
      .orderBy("id").collect()
    assert(got(0).getAs[Double]("asof_v") == 1.0)
    assert(got(1).isNullAt(got(1).fieldIndex("asof_v")))
    assert(got(1).isNullAt(got(1).fieldIndex("asof_ts")))
  }

  test("left columns pass through unchanged") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "x")).toDF("id", "k", "ts", "tag")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "ts", "v")
    val out = AsOf.backward(left, right, "k", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "tag", "asof_v", "asof_ts"))
    assert(out.head().getAs[String]("tag") == "x")
  }

  test("forward as-of: earliest right at-or-after, inclusive, with tolerance") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (2L, ts("2024-01-01 09:00:00"), "c")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 3.0)).toDF("user_id", "ts", "value")
    val got = AsOf.forward(left, right, "user_id", "ts", Seq("value"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))).toMap
    assert(got("a") == Some(1.0)) // inclusive: right at same ts matches
    assert(got("b") == Some(3.0)) // next click after 11:00 is 12:00
    assert(got("c") == None)      // user 2 has no clicks
    val bounded = AsOf.forward(left, right, "user_id", "ts", Seq("value"),
        toleranceSeconds = Some(1800))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))).toMap
    assert(bounded("b") == None) // 12:00 is beyond 11:00 + 30min
  }

  test("randomized: matches the quadratic as-of definition (with ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def t(h: Int) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // coarse time grid + few keys -> plenty of exact (key, ts) ties
    val leftRows = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, t(rnd.nextInt(50))))
    val rightRows = (1 to 150).map(_ =>
      ((rnd.nextInt(5) + 1).toLong, t(rnd.nextInt(50)),
        s"t${rnd.nextInt(9)}", rnd.nextInt(100).toDouble))
    val l = leftRows.toDF("id", "k", "ts")
    val r = rightRows.toDF("k", "ts", "tag", "v")

    val gotB = AsOf.backward(l, r, "k", "ts", Seq("tag", "v"))
      .collect().map(x => x.getLong(0) ->
        (Option(x.getAs[String]("asof_tag")), Option(x.getAs[Any]("asof_v")))).toMap
    val gotF = AsOf.forward(l, r, "k", "ts", Seq("tag", "v"))
      .collect().map(x => x.getLong(0) ->
        (Option(x.getAs[String]("asof_tag")), Option(x.getAs[Any]("asof_v")))).toMap

    leftRows.foreach { case (id, k, ts) =>
      // backward: max by (ts, payload struct); forward: min by same
      val befores = rightRows.filter(rr => rr._1 == k && !rr._2.after(ts))
      val afters = rightRows.filter(rr => rr._1 == k && !rr._2.before(ts))
      val expB = if (befores.isEmpty) (None, None) else {
        val m = befores.maxBy(rr => (rr._2.getTime, rr._3, rr._4))
        (Some(m._3), Some(m._4))
      }
      val expF = if (afters.isEmpty) (None, None) else {
        val m = afters.minBy(rr => (rr._2.getTime, rr._3, rr._4))
        (Some(m._3), Some(m._4))
      }
      assert(gotB(id) == expB, s"backward mismatch for left id=$id k=$k ts=$ts")
      assert(gotF(id) == expF, s"forward mismatch for left id=$id k=$k ts=$ts")
    }
  }

  test("ties on (key, ts): deterministic pick, all carried columns from one row") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:05:00"))).toDF("id", "k", "ts")
    val tied = Seq(
      (10L, ts("2024-01-01 10:00:00"), "a", 1.0),
      (10L, ts("2024-01-01 10:00:00"), "b", 2.0),
      (10L, ts("2024-01-01 10:00:00"), "c", 3.0))
    // same answer regardless of input order / partitioning, and asof_tag +
    // asof_v always from the same right row (payload travels as one struct)
    for (rows <- Seq(tied, tied.reverse); parts <- Seq(1, 3)) {
      val right = rows.toDF("k", "ts", "tag", "v").repartition(parts)
      val b = AsOf.backward(left, right, "k", "ts", Seq("tag", "v")).head()
      assert(b.getAs[String]("asof_tag") == "c" && b.getAs[Double]("asof_v") == 3.0)
      val fLeft = Seq((1L, 10L, ts("2024-01-01 09:00:00"))).toDF("id", "k", "ts")
      val f = AsOf.forward(fLeft, right, "k", "ts", Seq("tag", "v")).head()
      assert(f.getAs[String]("asof_tag") == "a" && f.getAs[Double]("asof_v") == 1.0)
    }
  }

  test("nearest as-of: closest side wins, backward on ties, tolerance bounds") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 30m vs fwd 10m -> fwd
      (2L, 10L, ts("2024-01-01 09:40:00")), // back 10m vs fwd 30m -> back
      (3L, 20L, ts("2024-01-01 10:00:00")), // back 1h vs fwd 1h tie -> back
      (4L, 30L, ts("2024-01-01 10:00:00"))) // only match beyond tolerance
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 10:10:00"), 2.0),
      (20L, ts("2024-01-01 09:00:00"), 3.0),
      (20L, ts("2024-01-01 11:00:00"), 4.0),
      (30L, ts("2024-01-01 16:00:00"), 5.0))
      .toDF("k", "ts", "v")
    val got = AsOf.nearest(left, right, "k", "ts", Seq("v"), "id",
        toleranceSeconds = Some(7200L))
      .orderBy("id").select("id", "asof_v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 2.0), (2L, 1.0), (3L, 3.0), (4L, null)))
  }
}
