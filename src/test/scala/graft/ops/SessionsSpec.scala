package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionsSpec extends SparkSpec {

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap-based session assignment splits on gaps > threshold") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // same session (gap 600s)
      (1L, ts("2024-01-01 11:00:00")), // new session (gap 3000s > 1800)
      (2L, ts("2024-01-01 10:00:00"))) // other key
      .toDF("user_id", "ts")
    val got = Sessions.assign(ev, "user_id", "ts", 1800)
      .orderBy("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("session_id")))
    assert(got.toSeq == Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L)))
  }

  test("session summary: bounds, counts, duration") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:00")),
      (1L, ts("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val got = Sessions.summarize(ev, "user_id", "ts", 1800)
      .orderBy("session_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(0).getAs[Long]("duration_secs") == 1740)
    assert(got(1).getAs[Long]("n_events") == 1)
    assert(got(1).getAs[Long]("duration_secs") == 0)
  }

  test("exact boundary: gap == threshold stays in the session") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00"))) // exactly 1800s -> same session
      .toDF("user_id", "ts")
    assert(Sessions.summarize(ev, "user_id", "ts", 1800).count() == 1)
  }

  test("streaming sessionization closes sessions on gap (ST5)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Sessions.streamingSessions(spark, input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // session 1 for user 1; closed when the watermark (driven by the
      // 12:00 event minus the gap) passes its last-event + gap
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 14:00:00"))) // advances watermark again
      q.processAllAvailable()
      val closed = spark.sql("SELECT user_id, n_events FROM sess_out WHERE user_id = 1")
        .collect()
      assert(closed.length >= 1) // first session closed by watermark advance
      assert(closed.head.getLong(1) == 2)
    } finally q.stop()
  }

  test("out-of-order late event never moves the session tail backwards (fMGWS)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Sessions.streamingSessions(spark, input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // late but above-watermark (wm = 10:20 - 30min = 9:50): merges into
      // the open session and must NOT pull its tail back to 10:10
      input.addData((1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 13:00:00"))) // wm -> 12:30, close it
      q.processAllAvailable()
      val s = spark.sql(
        "SELECT start, end, n_events FROM sess_ooo_out WHERE user_id = 1").collect()
      assert(s.length == 1)
      assert(s.head.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(s.head.getTimestamp(1) == ts("2024-01-01 10:20:00"),
        "session end must stay at the max event time seen")
      assert(s.head.getLong(2) == 3)
    } finally q.stop()
  }

  test("out-of-order late event never moves the session tail backwards (TWS)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Sessions.streamingSessionsTws(spark, input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_tws_out").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:10:00"))) // late, above watermark
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val s = spark.sql(
        "SELECT start, end, n_events FROM sess_ooo_tws_out WHERE user_id = 1").collect()
      assert(s.length == 1, s"expected one closed session, got ${s.length}")
      assert(s.head.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(s.head.getTimestamp(1) == ts("2024-01-01 10:20:00"),
        "a stale timer (from before the late event) must not close the " +
          "session early with a rewound end")
      assert(s.head.getLong(2) == 3)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState: per-user per-type running counts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String)]
    val q = Sessions.streamingTypeCounts(spark, input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("type_counts_out").start()
    try {
      input.addData((1L, "view"), (1L, "view"), (1L, "click"), (2L, "view"))
      q.processAllAvailable()
      input.addData((1L, "view"), (2L, "purchase"))
      q.processAllAvailable()
      // state persists across batches: the LATEST update per (user, type)
      // carries the cumulative count
      val latest = spark.sql(
        "SELECT user_id, event_type, max(n) AS n FROM type_counts_out GROUP BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(latest == Map(
        (1L, "view") -> 3L, (1L, "click") -> 1L,
        (2L, "view") -> 1L, (2L, "purchase") -> 1L))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState sessionization (Spark 4 arbitrary-state API + RocksDB store)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Sessions.streamingSessionsTws(spark, input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_tws_out").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT user_id, n_events FROM sess_tws_out WHERE user_id = 1").collect()
      assert(closed.length >= 1, "first session should close via event-time timer")
      assert(closed.head.getLong(1) == 2)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("cohort retention: hand-computed weekly triangle") {
    import spark.implicits._
    // epoch week boundaries: 1970-01-01 is day 0, so week w covers
    // days [7w, 7w+7). u1 first on day 0 (week 0), active days 0, 3, 14
    // (offsets 0, 0, 2); u2 first day 1 (week 0), active day 8 (offset 1);
    // u3 first day 7 (week 1), active day 7 only.
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(day).atTime(12, 0))
    val ev = Seq(
      (1L, d(0)), (1L, d(3)), (1L, d(14)),
      (2L, d(1)), (2L, d(8)),
      (3L, d(7))).toDF("user_id", "ts")
    val out = Sessions.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // u1 (days 0,3) + u2 (day 1) in their first week
      (0L, 1L) -> 1L, // u2 back in week offset 1 (day 8)
      (0L, 2L) -> 1L, // u1 back in week offset 2 (day 14)
      (1L, 0L) -> 1L  // u3's cohort is epoch week 1
    ), s"got $out")
  }

  test("robustOutliers: median/MAD rule flags the spike, not the bulk") {
    import spark.implicits._
    // group a: values 1..7 plus a 100.0 spike. median = 4.5 (half-cents
    // 900), devs |2c-900| = {700,500,300,100,100,300,500,19100}, MAD of
    // those (quarter-cents over 2*dev) = 800 -> threshold 3*800 = 2400
    // in quarter-cents: only the spike's 2*19100 = 38200 exceeds it.
    val ev = ((1 to 7).map(i => (i.toLong, "a", i.toDouble)) :+
      (8L, "a", 100.0) :+ (9L, "b", 5.0))
      .toDF("event_id", "event_type", "value")
    val out = Sessions.robustOutliers(ev).select("event_id").as[Long]
      .collect().toSeq
    assert(out == Seq(8L), s"got $out")
    // a constant group has MAD 0: every deviation > 0 is an outlier,
    // the constant rows themselves are not
    val const = Seq((1L, "c", 2.0), (2L, "c", 2.0), (3L, "c", 9.0))
      .toDF("event_id", "event_type", "value")
    val out2 = Sessions.robustOutliers(const).select("event_id").as[Long]
      .collect().toSeq
    assert(out2 == Seq(3L), s"got $out2")
  }

  test("trimmedMean: rank-trimmed interior average, deterministic ties") {
    import spark.implicits._
    // group g: cents 1..10 -> trim 1 each end -> mean of 2..9 = 5.5 cents
    val ev = ((1 to 10).map(i => (i.toLong, "g", i / 100.0)) :+
        ((99L, "h", 7.00))) // tiny group: lo = 0, nothing trimmed
      .toDF("event_id", "event_type", "value")
    val got = Sessions.trimmedMean(ev, "event_type", "value", "event_id")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("g") == ((10L, 8L, 5.5)), got("g").toString)
    assert(got("h") == ((1L, 1L, 700.0)), got("h").toString)
  }

  test("decayedCounts: whole-half-life shift decay, hand-computed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      ("u1", 100L, 1.00), // 0 half-lives old -> full weight
      ("u1", 95L, 1.00),  // 5s / hl=10 -> still bucket 0
      ("u1", 80L, 1.00),  // 20s -> bucket 2 -> /4
      ("u2", 100L, 2.00)) // anchor defines tmax = 100
      .toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.decayedCounts(ev, halfLifeSeconds = 10L,
        keyCols = Seq("user_id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1: 100e6 + 100e6 + 100e6/4 = 225_000_000
    assert(got("u1") == ((3L, 225000000L)), got.toString)
    assert(got("u2") == ((1L, 200000000L)), got.toString)
    // cap: an event 1000 half-lives old shifts by 40, not 1000
    val old = Seq(("u3", 100L, 1.00), ("u3", 100L - 10000L, 1.00))
      .toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val capped = Sessions.decayedCounts(old, halfLifeSeconds = 10L,
        keyCols = Seq("user_id")).collect().head.getLong(2)
    assert(capped == 100000000L + 100000000L / (1L << 40), capped.toString)
  }

  test("seasonalNaiveError: lag-season forecasts, leading points dropped") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10L), ("a", 2, 20L), ("a", 3, 13L), ("a", 4, 18L),
      ("a", 5, 30L),
      ("b", 1, 5L), ("b", 2, 6L)).toDF("g", "t", "x")
    val got = Sessions.seasonalNaiveError(df, "g", "t", "x", season = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("forecast"), r.getAs[Long]("abs_err"))).toMap
    // a: t3 f=10 |13-10|=3; t4 f=20 err 2; t5 f=13 err 17; b: none
    assert(got == Map(
      ("a", 3) -> ((10L, 3L)),
      ("a", 4) -> ((20L, 2L)),
      ("a", 5) -> ((13L, 17L))), got.toString)
  }

  test("interArrivalStats: exact gap order statistics; singletons omitted") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 0L), (2L, 100L, 10L), (3L, 100L, 40L), (4L, 100L, 100L),
      (5L, 200L, 7L)) // single event -> no gaps
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.interArrivalStats(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap_s"),
          r.getAs[Long]("median_gap_s"), r.getAs[Long]("p90_gap_s"),
          r.getAs[Long]("max_gap_s"))).toMap
    // gaps 10, 30, 60: median rank 2 -> 30, p90 rank ceil(2.7)=3 -> 60
    assert(got == Map(100L -> ((3L, 10L, 30L, 60L, 60L))), got.toString)
  }

  test("theilSenSlope: outlier-immune median slope, exact micro units") {
    import spark.implicits._
    // user 1: perfectly linear 1.00/s with one wild outlier at t=3 —
    // pairwise slopes (micro c/s): 1e8 x3 (clean pairs), then the three
    // outlier pairs; lower median of 6 = rank 3 = the clean 1e8.
    // user 2: single point -> no pairs, zero row with n_points = 1.
    val ev = Seq(
      (1L, 1L, 0L, 0.00), (2L, 1L, 1L, 1.00), (3L, 1L, 2L, 2.00),
      (4L, 1L, 3L, 100.00),
      (5L, 2L, 0L, 5.00))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.theilSenSlope(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("slope_micro"))).toMap
    assert(got(1L) === ((4L, 6L, 100000000L)))
    assert(got(2L) === ((1L, 0L, 0L)))
  }

  test("mannKendall: hand-computed S and tie-corrected variance, exact z gate") {
    import spark.implicits._
    // user 1: strictly increasing 5 points -> S = C(5,2) = 10, no ties,
    // var18 = 5·4·15 = 300; 18·100·1e12 > 1.959964²·300·1e6-ish ->
    // 1.8e15 vs 3.84·300 ≈ 1152e12 -> significant.
    // user 2: constant 4 points -> S = 0, all tied: var18 =
    // 4·3·13 − 4·3·13 = 0, trend none, not significant.
    // user 3: down 3 points -> S = −3, var18 = 3·2·11 = 66, |z| =
    // 3/√(66/18) = 1.566 < 1.96 -> decreasing but not significant.
    val ev = (
      (1 to 5).map(i => (i.toLong, 1L, i.toLong, i.toDouble)) ++
        (1 to 4).map(i => (10L + i, 2L, i.toLong, 7.0)) ++
        (1 to 3).map(i => (20L + i, 3L, i.toLong, 9.0 - i)))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.mannKendall(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("s_stat"),
          r.getAs[Long]("var18"), r.getAs[String]("trend"),
          r.getAs[Boolean]("significant")))).toMap
    assert(got(1L) === ((5L, 10L, 300L, "increasing", true)))
    assert(got(2L) === ((4L, 0L, 0L, "none", false)))
    assert(got(3L) === ((3L, -3L, 66L, "decreasing", false)))
    // partition invariance
    val got2 = Sessions.mannKendall(ev.repartition(7))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("s_stat"),
          r.getAs[Long]("var18"), r.getAs[String]("trend"),
          r.getAs[Boolean]("significant")))).toMap
    assert(got2 === got)
  }

  test("mannKendall: duplicate timestamps per key raise loudly (ADVICE r14)") {
    import spark.implicits._
    // two events at the same instant: the strict ta < tb pair relation
    // would silently drop their pair from S while n_points counted both
    val ev = Seq((1L, 9L, 1L, 1.0), (2L, 9L, 1L, 2.0), (3L, 9L, 2L, 3.0))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val e = intercept[Exception] { Sessions.mannKendall(ev).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate timestamps")),
      s"want the named-key raise, got: ${msgs(e).mkString(" | ")}")
  }

  test("holtLinearForecast: hand-stepped recursion, negative trend floors portably") {
    import spark.implicits._
    // g=a [10, 20]: l₁=(20e6+4·10e6)/5=12e6, b₁=2e6/10=200000, sae=10e6
    // g=b [5, 5, 5]: level pinned at 5e6, zero trend, zero error
    // g=c [10, 0]: l₁=8e6, b₁=⌊−2e6/10⌋ via the +BIG offset = −200000
    val rows = Seq(("a", 1, 10L), ("a", 2, 20L),
      ("b", 1, 5L), ("b", 2, 5L), ("b", 3, 5L),
      ("c", 1, 10L), ("c", 2, 0L)).toDF("g", "t", "x")
    val got = Sessions.holtLinearForecast(rows, Seq("g"), "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("level_micro"),
          r.getAs[Long]("trend_micro"), r.getAs[Long]("mae_micro"),
          r.getAs[Long]("fc2_micro"))).toMap
    assert(got("a") == ((2L, 12000000L, 200000L, 10000000L, 12400000L)),
      got.toString)
    assert(got("b") == ((3L, 5000000L, 0L, 0L, 5000000L)), got.toString)
    assert(got("c") == ((2L, 8000000L, -200000L, 10000000L, 7600000L)),
      got.toString)
    // input order / partitioning must not matter (sort_array restores)
    val got2 = Sessions.holtLinearForecast(
        rows.orderBy(col("x")).repartition(5), Seq("g"), "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("level_micro"), r.getAs[Long]("trend_micro"))).toMap
    assert(got2 == got.map { case (k, v) => k -> ((v._2, v._3)) }, got2.toString)
  }

  test("holtLinearForecast: hot key past maxPointsPerGroup surfaces zeroed, never folds") {
    import spark.implicits._
    // hot=120 points (over the cap of 100), cool=3 points (under it):
    // the hot key must keep its true n_points but report all-zero
    // stats instead of materializing the giant per-group array
    val rows = (1 to 120).map(i => ("hot", i, 10L)) ++
      Seq(("cool", 1, 5L), ("cool", 2, 5L), ("cool", 3, 5L))
    val got = Sessions.holtLinearForecast(rows.toDF("g", "t", "x"),
        Seq("g"), "t", "x", maxPointsPerGroup = 100)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("level_micro"),
          r.getAs[Long]("trend_micro"), r.getAs[Long]("mae_micro"),
          r.getAs[Long]("fc1_micro"))).toMap
    assert(got("hot") == ((120L, 0L, 0L, 0L, 0L)), got.toString)
    assert(got("cool") == ((3L, 5000000L, 0L, 0L, 5000000L)), got.toString)
  }
  test("autocorrelation: hand-computed ACF on a dense alternating series") {
    import spark.implicits._
    // type a, hourly counts [2,0,2,0,2]: S=6, centered n*x-S = [4,-6,4,-6,4]
    // den = 3*16 + 2*36 = 120
    // lag1 num = -96 -> -800000; lag2 = 68 -> 566666 (trunc)
    // lag3 = -48 -> -400000; lag4 = 16 -> 133333
    val ev = Seq(
      (1L, 0L), (2L, 10L),           // hour 0: 2 events
      (3L, 7200L), (4L, 7300L),      // hour 2: 2 events
      (5L, 14400L), (6L, 14410L))    // hour 4: 2 events
      .toDF("event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("a"))
    val got = Sessions.autocorrelation(ev, maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("acf_micro"))).toMap
    assert(got(1L) == ((5L, -800000L)), got.toString)
    assert(got(2L) == ((5L, 566666L)), got.toString)
    assert(got(3L) == ((5L, -400000L)), got.toString)
    assert(got(4L) == ((5L, 133333L)), got.toString)
  }

  test("fano factor: hand-computed dispersion; Poisson-ish vs bursty order") {
    import spark.implicits._
    // group a: hour counts [2,0,2] over the 3-bucket grid: S=4, Q=8,
    // F = (3*8-16)*1e6 / (3*4) = 666666
    // group b (bursty): see below
    val ev = (Seq((1L, 0L), (2L, 10L), (3L, 7200L), (4L, 7210L))
        .map { case (i, s) => (i, s, "a") } ++
      ((10L to 15L).map(i => (i, 60L * i, "b")) :+ ((20L, 3600L * 3, "b"))))
      .toDF("event_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.fanoFactor(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((3L, 4L, 666666L)), got.toString)
    // b: hour counts [6,0,0,1]: S=7, Q=37, n=4 ->
    // F = (148-49)*1e6/28 = 3535714
    assert(got("b") == ((4L, 7L, 3535714L)), got.toString)
    assert(got("b")._3 > got("a")._3, "bursty group must rank higher")
  }

  test("pacf: Durbin-Levinson replay from ACF values; AR(1)-ish decay") {
    import spark.implicits._
    // alternating-ish counts: strong lag-1 structure
    val ev = (0 until 24).flatMap { h =>
      val cnt = if (h % 2 == 0) 3 else 1
      (0 until cnt).map(i => (h.toLong * 10 + i, h.toLong * 3600))
    }.toDF("event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("a"))
    val acf = Sessions.autocorrelation(ev, maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Long]("acf_micro"))
      .toMap
    val got = Sessions.partialAutocorrelation(ev).collect()(0)
    // sequential replay of the closed forms with the same quantization
    def mulm(a: Long, b: Long) = {
      val m = math.abs(a) * math.abs(b) / 1000000L
      if ((a >= 0) == (b >= 0)) m else -m
    }
    def divm(n: Long, d: Long) =
      if (d == 0L) 0L
      else {
        val m = math.abs(n) * 1000000L / math.abs(d)
        if ((n >= 0) == (d >= 0)) m else -m
      }
    val (r1, r2, r3) = (acf(1L), acf(2L), acf(3L))
    val p22 = divm(r2 - mulm(r1, r1), 1000000L - mulm(r1, r1))
    val a21 = r1 - mulm(p22, r1)
    val p33 = divm(r3 - mulm(a21, r2) - mulm(p22, r1),
      1000000L - mulm(a21, r1) - mulm(p22, r2))
    assert(got.getAs[Long]("pacf1_micro") == r1)
    assert(got.getAs[Long]("pacf2_micro") == p22, s"got $got want $p22")
    assert(got.getAs[Long]("pacf3_micro") == p33, s"got $got want $p33")
    // the alternating series has a strong direct lag-1 effect
    assert(math.abs(r1) > 500000L)
  }

  test("autocorrelation: grid-explosion guard fails loudly, constant series pins zero") {
    import spark.implicits._
    // a timestamp outlier that would densify 1000+ buckets under
    // maxGrid=10 must raise, not silently materialize the grid
    val outlier = Seq((1L, 0L), (2L, 3600L * 1000L))
      .toDF("event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("x"))
    val ex = intercept[Exception] {
      Sessions.autocorrelation(outlier, maxLag = 1, maxGrid = 10L).collect()
    }
    assert(ex.getMessage != null)
    // constant series: every centered term is 0 -> den = 0 -> pinned 0
    val const = Seq((1L, 0L), (2L, 3600L), (3L, 7200L))
      .toDF("event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("event_type", lit("c"))
    val got = Sessions.autocorrelation(const, maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Long]("acf_micro"))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), got.toString)
  }
}
