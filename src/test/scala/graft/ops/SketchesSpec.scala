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

  test("portable hll estimate is within its rsd envelope in-regime") {
    // m=256 ⇒ rsd ≈ 1.04/√256 ≈ 6.5%; the raw estimator's regime is
    // n ≥ 2.5m = 640 — at sf0.1 every group holds 1500 distinct users,
    // so pin a 3-sigma-ish envelope there
    val ev = graft.T.events(spark, "/root/testdata/sf0.1")
    val rows = Sketches.hllCardinalityWithExact(ev, Seq("event_type"), "user_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1) / 1e6
      val exact = r.getLong(2)
      val err = math.abs(approx - exact) / exact
      assert(err < 0.20, s"${r.getString(0)}: approx=$approx exact=$exact err=$err")
    }
  }

  test("portable hll below-regime bias is upward and bounded (documented)") {
    // below 2.5m the RAW estimator biases HIGH — the regime classical HLL
    // patches with linear counting, whose ln() is not integer-portable;
    // we keep the raw estimator (oracle-exact) and pin the bias shape
    val ev = graft.T.events(spark, "/root/testdata/sf0.01") // 150 < 640
    Sketches.hllCardinalityWithExact(ev, Seq("event_type"), "user_id")
      .collect().foreach { r =>
        val approx = r.getLong(1) / 1e6
        val exact = r.getLong(2).toDouble
        assert(approx >= exact * 0.8 && approx <= exact * 3.0,
          s"${r.getString(0)}: approx=$approx exact=$exact")
      }
  }

  test("portable hll registers merge by max: union corpus == merged shards") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
    val whole = Sketches.hllRegisters(ev, Seq("event_type"), "user_id")
    val shardA = ev.filter(col("user_id") % 2 === 0)
    val shardB = ev.filter(col("user_id") % 2 =!= 0)
    val merged = Sketches.hllRegisters(shardA, Seq("event_type"), "user_id")
      .unionByName(Sketches.hllRegisters(shardB, Seq("event_type"), "user_id"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("max_rank")).as("max_rank"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty,
      "per-bucket max must merge shard sketches into the union's sketch")
  }

  test("portable hll is partition-invariant (exact integer pipeline)") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllCardinality(df, Seq("event_type"), "user_id")
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
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

  test("cms estimates are one-sided overcounts with bounded error") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val n = ev.filter(col("user_id").isNotNull).count()
    val rows = Sketches.cmsHeavyHitters(ev, "user_id", 50).collect()
    assert(rows.length == 50)
    // CM guarantee: exact ≤ estimate ≤ exact + e·N/w with prob 1−(1/e)^d;
    // pin the deterministic lower bound row-by-row and a generous
    // multiple of the expected-overcount bound (N/w per row in
    // expectation, d-row min far below it)
    val w = 1L << Sketches.CmsWBits
    rows.foreach { r =>
      val est = r.getLong(1)
      val exact = r.getLong(2)
      assert(est >= exact, s"${r.getString(0)}: est=$est < exact=$exact")
      assert(est - exact <= math.max(4L, 3L * n / w),
        s"${r.getString(0)}: overcount ${est - exact} beyond bound")
    }
  }

  test("cmsTopK serves the same ranking sketch-only (no exact-count agg)") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val served = Sketches.cmsTopK(ev, "user_id", 50)
    // identical (value, estimate) ranking as the demonstration form
    val a = served.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = Sketches.cmsHeavyHitters(ev, "user_id", 50).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
    // and NO aggregate in the plan computes a COUNT keyed by the raw
    // value — the exact-count groupBy the sketch replaces is absent
    // (the value-keyed aggregates that remain are the distinct probe
    // and the min-over-rows estimate)
    val exactCounts = served.queryExecution.optimizedPlan.collect {
      case ag: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if ag.groupingExpressions.exists(_.references.toSeq
            .exists(_.name == "user_id")) &&
            ag.aggregateExpressions.exists(_.collectFirst {
              case c: org.apache.spark.sql.catalyst.expressions.aggregate.Count => c
            }.isDefined) => ag
    }
    assert(exactCounts.isEmpty,
      s"sketch-only serve must not exact-count the value space: $exactCounts")
  }

  test("cms counters merge by sum: union corpus == merged shards") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"))
    val whole = Sketches.cmsCounters(ev, "user_id")
    val merged = Sketches.cmsCounters(ev.filter(col("user_id") % 2 === 0), "user_id")
      .unionByName(Sketches.cmsCounters(ev.filter(col("user_id") % 2 =!= 0), "user_id"))
      .groupBy(col("hash_row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty,
      "per-cell sum must merge shard counters into the union's counters")
  }

  test("cms is partition-invariant and probes-from-anywhere consistent") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsHeavyHitters(df, "user_id", 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(ev) == run(ev.repartition(13)))
  }

  test("grouped cms: per-group one-sided overcounts, k rows per group") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val rows = Sketches.cmsHeavyHittersByGroup(ev, Seq("event_type"), "user_id", 5)
      .collect()
    val perGroup = rows.groupBy(_.getString(0))
    assert(perGroup.nonEmpty && perGroup.values.forall(_.length == 5))
    val exact = ev.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id").cast("string").as("u"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) >= exact(key),
        s"$key: est=${r.getLong(2)} < exact=${exact(key)}")
    }
  }

  test("histogram quantiles are within the 1/16 relative-error envelope") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val est = Sketches.histQuantiles(ev, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Seq(0.5 -> 0, 0.9 -> 1, 0.99 -> 2).foreach { case (p, slot) =>
      ev.groupBy("event_type")
        .agg(expr(s"percentile(value, $p)").as("exact"))
        .collect().foreach { r =>
          val exactMicro = r.getDouble(1) * 1e6
          val lo = slot match {
            case 0 => est(r.getString(0))._1
            case 1 => est(r.getString(0))._2
            case _ => est(r.getString(0))._3
          }
          // the estimate is a bin lower bound: value/(1+1/16) ≤ lo ≤ value
          // (percentile() interpolates, so allow one bin width of slack)
          assert(lo <= exactMicro * 1.07 && lo >= exactMicro / 1.15,
            s"${r.getString(0)} p=$p: lo=$lo exact=$exactMicro")
        }
    }
  }

  test("histogram registers merge by sum: union corpus == merged shards") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
      .filter(col("value").isNotNull)
    val whole = Sketches.histRegisters(ev, Seq("event_type"), "value")
    val merged = Sketches.histRegisters(ev.filter(col("user_id") % 2 === 0),
        Seq("event_type"), "value")
      .unionByName(Sketches.histRegisters(ev.filter(col("user_id") % 2 =!= 0),
        Seq("event_type"), "value"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty,
      "per-bin sum must merge shard histograms into the union's histogram")
  }

  test("hll ledger: persisted registers + new batch == union estimate") {
    // the incremental flow: day-1 registers persist to parquet; day-2
    // merges its own registers against the loaded ledger — history's raw
    // values are never re-read, yet the estimate is bit-identical to
    // recomputing over the union corpus
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
    val day1 = ev.filter(col("event_id") % 2 === 0)
    val day2 = ev.filter(col("event_id") % 2 =!= 0)
    val ledgerPath = java.nio.file.Files
      .createTempDirectory("graft-hll-ledger").toString
    Sketches.hllRegisters(day1, Seq("event_type"), "user_id")
      .write.mode("overwrite").parquet(ledgerPath)
    val merged = Sketches.mergeHllRegisters(
      spark.read.parquet(ledgerPath),
      Sketches.hllRegisters(day2, Seq("event_type"), "user_id"),
      Seq("event_type"))
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllCardinalityFromRegisters(df, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
    val whole = Sketches.hllRegisters(ev, Seq("event_type"), "user_id")
    assert(est(merged) == est(whole))
  }

  test("histogram bin count stays bounded regardless of value range") {
    import spark.implicits._
    val wide = Seq(0.000001, 0.5, 1.0, 3.14, 1e3, 1e6, 1e9, 5e11)
      .flatMap(v => Seq.fill(4)(v)).toDF("value").withColumn("g", lit("all"))
    val hist = Sketches.histRegisters(wide, Seq("g"), "value")
    // 8 magnitudes over 18 decades → still one bin per distinct octave
    // position, far under the 16·63 ceiling
    assert(hist.count() <= 16 * 63)
    // rank order preserved: bins increase with value
    val bins = Sketches.histRegisters(
      Seq(1.0, 2.0, 4.0, 8.0, 1e6).toDF("value").withColumn("g", lit("all")),
      Seq("g"), "value").orderBy("bin").collect().map(_.getLong(1))
    assert(bins.sorted.sameElements(bins))
  }

  test("rolling WAU/MAU: churn drops stickiness; estimates near truth") {
    import spark.implicits._
    // 6 weeks, 200 users/week, half-overlapping cohorts: user range
    // [100w, 100w+200) — trailing-4-week union is 500 distinct users
    val ev = (0 until 6).flatMap { w =>
      (0 until 200).map(u =>
        (new java.sql.Timestamp((w.toLong * 604800 + 3600) * 1000),
          (100 * w + u).toLong))
    }.toDF("ts", "user_id")
    val got = Sketches.rollingHllStickiness(ev, "ts", "user_id")
      .collect().map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("wau_micro"), r.getAs[Long]("mau_micro"),
          r.getAs[Long]("stickiness_micro"))).toMap
    assert(got.size == 6)
    val last = got(got.keySet.max)
    // raw-HLL envelope is loose at small cardinalities — assert the
    // ORDER property (WAU ~200 well below MAU ~500) not tight error
    assert(last._1 < last._2, s"WAU must be below MAU: $last")
    assert(last._3 < 700000L && last._3 > 200000L,
      s"stickiness ~0.4 expected: $last")
    // first week has no trailing history: MAU == WAU, stickiness = 1
    assert(got(got.keySet.min)._3 == 1000000L)
    // partition invariance (registers are max-merged combine-aggs)
    val again = Sketches.rollingHllStickiness(ev.repartition(7), "ts",
      "user_id").collect().map(_.toSeq).toSet
    assert(again == Sketches.rollingHllStickiness(ev, "ts", "user_id")
      .collect().map(_.toSeq).toSet)
  }

  test("drift monitor: per-batch KS vs reference, shifted batch alarms") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def tdir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    // reference distribution: values 1..100
    val ref = Sketches.histRegisters(
      (1 to 100).map(_.toDouble).toDF("value").withColumn("__g", lit("r")),
      Seq("__g"), "value").select(col("bin"), col("cnt"))
      .localCheckpoint()
    val in = MemoryStream[Double]
    val out = tdir("graft-drift-out")
    val q = Sketches.driftMonitor(in.toDS().toDF("value"), ref, "value",
      out, tdir("graft-drift-ck"))
    try {
      in.addData((1 to 100).map(_.toDouble): _*) // same distribution
      q.processAllAvailable()
      in.addData((1 to 100).map(i => 100000.0 + i): _*) // hard shift
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("batch_id"), col("ks_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L, s"identical batch must score 0: $got")
    assert(got(1L) == 1000000L, s"disjoint batch must score unit: $got")
    // the batch-vs-reference form agrees with the one-pass grouped form
    val both = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", 100000.0 + i))).toDF("g", "value")
    val one = Sketches.ksDrift(both, "g", "value", "a", "b")
      .collect().head.getAs[Long]("ks_micro")
    assert(one == 1000000L)
  }

  test("ksDrift: separated groups -> unit, identical groups -> 0") {
    import spark.implicits._
    // complete separation: every A value below every B value
    val sep = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 40).map(i => ("b", 1000.0 + i))).toDF("g", "value")
    val s = Sketches.ksDrift(sep, "g", "value", "a", "b").collect().head
    assert(s.getAs[Long]("n_a") == 50L && s.getAs[Long]("n_b") == 40L)
    assert(s.getAs[Long]("ks_micro") == 1000000L) // ECDF gap of exactly 1
    // identical samples: every bin has cumA·nB == cumB·nA
    val same = ((1 to 30).map(i => ("a", i * 3.0)) ++
      (1 to 30).map(i => ("b", i * 3.0))).toDF("g", "value")
    val z = Sketches.ksDrift(same, "g", "value", "a", "b").collect().head
    assert(z.getAs[Long]("ks_micro") == 0L)
    // partition invariance (histogram + triangular cumsum are combine-aggs)
    val again = Sketches.ksDrift(sep.repartition(7), "g", "value", "a", "b")
      .collect().map(_.toSeq).toSet
    assert(again == Set(s.toSeq))
  }

  test("psi: hand-computed terms, zero on identical slices, invariance") {
    import spark.implicits._
    // direct bin counts: (bin 1: a=3 b=1), (bin 2: a=1 b=3)
    // add-one + floored micro: p1 = 4e6/6 = 666666, q1 = 2e6/6 = 333333
    // and symmetric in bin 2; 666666 = 2·333333 exactly, so the log2
    // gap is exactly one bit each way -> term = 333333 per bin
    val bins = Seq((1L, 3L, 1L), (2L, 1L, 3L)).toDF("bin", "ca", "cb")
    val got = Sketches.psiFromCounts(bins)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("p_micro"), r.getAs[Long]("q_micro"),
          r.getAs[Long]("term_micro"), r.getAs[Long]("psi_micro")))).toMap
    val l6a = graft.functions.ExactMicroOps.log2Micro(666666L)
    val l6b = graft.functions.ExactMicroOps.log2Micro(333333L)
    val t = (666666L - 333333L) * (l6a - l6b) / 1000000L
    assert(got(1L) === ((666666L, 333333L, t, 2 * t)))
    assert(got(2L) === ((333333L, 666666L, t, 2 * t)))
    assert(l6a - l6b == 1000000L) // doubling = exactly one bit
    // identical slices -> every term 0, psi 0 (end-to-end psiDrift)
    val same = ((1 to 30).map(i => ("a", i * 3.0)) ++
      (1 to 30).map(i => ("b", i * 3.0))).toDF("g", "value")
    val z = Sketches.psiDrift(same, "g", "value", "a", "b").collect()
    assert(z.nonEmpty && z.forall(_.getAs[Long]("psi_micro") == 0L))
    // drifted slices -> positive psi; partition-invariant
    val sep = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 40).map(i => ("b", 1000.0 + i))).toDF("g", "value")
    val p1 = Sketches.psiDrift(sep, "g", "value", "a", "b")
      .collect().map(_.toSeq).toSet
    assert(p1.head.last.asInstanceOf[Long] > 1000000L) // > 1 bit apart
    val p2 = Sketches.psiDrift(sep.repartition(7), "g", "value", "a", "b")
      .collect().map(_.toSeq).toSet
    assert(p2 == p1)
  }

  test("psiFromCounts: all-zero bins (outer-joined relations) are excluded (ADVICE r14)") {
    import spark.implicits._
    val bins = Seq((1L, 3L, 1L), (2L, 1L, 3L)).toDF("bin", "ca", "cb")
    val padded = bins.unionByName(
      Seq((3L, 0L, 0L), (4L, 0L, 0L)).toDF("bin", "ca", "cb"))
    val a = Sketches.psiFromCounts(bins).collect().map(_.toSeq).toSet
    val b = Sketches.psiFromCounts(padded).collect().map(_.toSeq).toSet
    // zero-count bins must not inflate __nbins or claim smoothing mass
    assert(b == a, s"padded zero bins changed the result:\n$a\nvs\n$b")
  }

  test("cmsJoinSizeEstimate: one-sided, exact on a collision-free key set") {
    import spark.implicits._
    // a: key k appears k times; b: key k appears 2k times (k = 1..5)
    val a = (1 to 5).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 5).flatMap(k => Seq.fill(2 * k)(k.toLong)).toDF("k")
    val exact = (1 to 5).map(k => k.toLong * (2 * k)).sum // sum 2k^2 = 110
    val est = Sketches.cmsJoinSizeEstimate(a, b, "k")
      .collect().head.getLong(0)
    assert(est >= exact, s"one-sided law violated: $est < $exact")
    // 5 keys in 1024 buckets: no collisions -> estimate is exact
    assert(est == exact, s"expected exact $exact, got $est")
    // disjoint key sets -> empty bucket intersection on every row -> 0
    // (the row spine matters: a colliding row must not mask an empty one)
    val d = Seq(100L, 101L).toDF("k")
    val z = Sketches.cmsJoinSizeEstimate(a, d, "k").collect().head.getLong(0)
    assert(z == 0L, s"disjoint sides must estimate 0, got $z")
  }

  test("cusumByGroup matches the textbook max(0, s+x-k) recurrence") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 5L), ("a", 2, 5L), ("a", 3, 9L), ("a", 4, 9L), ("a", 5, 5L),
      ("b", 1, 1L), ("b", 2, 9L))
      .toDF("g", "t", "x")
    val got = Sketches.cusumByGroup(df, "g", "t", "x", lit(5L), lit(6L))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm"))).toMap
    // a: s = 0,0,4,8,8 (alarm once s>6); b: dips below zero reset to 0,
    // then 4 — the max(0,·) reset the prefix-min form must reproduce
    assert(got == Map(
      ("a", 1) -> ((0L, false)), ("a", 2) -> ((0L, false)),
      ("a", 3) -> ((4L, false)), ("a", 4) -> ((8L, true)),
      ("a", 5) -> ((8L, true)),
      ("b", 1) -> ((0L, false)), ("b", 2) -> ((4L, false))), got.toString)
    // reference sequential recurrence, cross-checked per group
    def ref(xs: Seq[Long], k: Long): Seq[Long] =
      xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail
    assert(ref(Seq(5, 5, 9, 9, 5), 5) == Seq(0L, 0L, 4L, 8L, 8L))
    assert(ref(Seq(1, 9), 5) == Seq(0L, 4L))
  }

  test("cusumByGroup laws: non-negative, level-shift invariant, matches ref") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val xs = (1 to 300).map(i => ("g", i, rnd.nextInt(20).toLong))
    val df = xs.toDF("g", "t", "x")
    val base = Sketches.cusumByGroup(df, "g", "t", "x", lit(9L), lit(30L))
      .collect().map(r => r.getInt(1) -> r.getAs[Long]("cusum")).toMap
    assert(base.values.forall(_ >= 0L), "CUSUM is non-negative by definition")
    // shifting every observation AND the reference by c leaves s unchanged
    val shifted = Sketches.cusumByGroup(
        df.withColumn("x", col("x") + 1000L), "g", "t", "x",
        lit(1009L), lit(30L))
      .collect().map(r => r.getInt(1) -> r.getAs[Long]("cusum")).toMap
    assert(shifted == base, "level shift must cancel against k")
    // exact agreement with the sequential textbook recurrence
    def ref(vals: Seq[Long], k: Long): Seq[Long] =
      vals.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail
    val expect = ref(xs.map(_._3), 9L).zipWithIndex
      .map { case (s, i) => (i + 1) -> s }.toMap
    assert(base == expect)
  }

  test("kmv set ops: k above both cardinalities makes every estimate exact") {
    import spark.implicits._
    // A = 1..30, B = 20..50: |A∩B| = 11, |A∪B| = 50, |A\B| = 19.
    // With k = 64 > 50 the union sketch holds everything, θ = 2^60, and
    // each estimate collapses to the exact count.
    val df = ((1L to 30L).map(("A", _)) ++ (20L to 50L).map(("B", _)))
      .toDF("g", "u")
    val regs = Sketches.kmvRegisters(df, Seq("g"), "u", k = 64)
    val out = Sketches.kmvSetOps(regs, "g", k = 64).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("theta") == (1L << 60))
    assert(r.getAs[Long]("est_inter") == 11L)
    assert(r.getAs[Long]("est_union") == 50L)
    assert(r.getAs[Long]("est_diff_a") == 19L)
  }

  test("kmv registers are k-bounded, sorted-minimal, and mergeable") {
    import spark.implicits._
    val df = (1L to 500L).map(("A", _)).toDF("g", "u")
    val regs = Sketches.kmvRegisters(df, Seq("g"), "u", k = 32).collect()
    assert(regs.length == 32)
    val hs = regs.map(_.getAs[Long]("h")).sorted
    // merging two half-sketches re-minimizes to the full sketch
    val h1 = Sketches.kmvRegisters(
      (1L to 250L).map(("A", _)).toDF("g", "u"), Seq("g"), "u", k = 32)
    val h2 = Sketches.kmvRegisters(
      (251L to 500L).map(("A", _)).toDF("g", "u"), Seq("g"), "u", k = 32)
    // merge = union of register hashes + per-group k smallest
    val direct = h1.select(col("g"), col("h"))
      .unionByName(h2.select(col("g"), col("h")))
      .distinct().orderBy(col("h")).limit(32)
      .collect().map(_.getAs[Long]("h")).sorted
    assert(direct.toSeq == hs.toSeq)
  }

  test("kmv estimates land inside the published k-min error envelope") {
    import spark.implicits._
    // overlapping ranges with true |A∩B| = 1000, |A∪B| = 3000
    val df = ((1L to 2000L).map(("A", _)) ++ (1001L to 3000L).map(("B", _)))
      .toDF("g", "u")
    val regs = Sketches.kmvRegisters(df, Seq("g"), "u", k = 64)
    val r = Sketches.kmvSetOps(regs, "g", k = 64).collect().head
    // rse ≈ 1/√(k−1) ≈ 12.6%; assert 4σ envelopes
    assert(math.abs(r.getAs[Long]("est_union") - 3000L) < 1600,
      s"union est ${r.getAs[Long]("est_union")}")
    assert(math.abs(r.getAs[Long]("est_inter") - 1000L) < 700,
      s"inter est ${r.getAs[Long]("est_inter")}")
    // internal consistency: inter + diff_a ≤ union estimate + slack from
    // the shared θ (they count the same sample, so it's exact equality
    // on the counts: n_common + n_only_a + n_only_b = n_union)
    assert(r.getAs[Long]("n_common") + r.getAs[Long]("n_only_a") <=
      r.getAs[Long]("n_union"))
  }
}
