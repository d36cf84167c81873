package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("hashFraction is in [0,1), deterministic, and salt-independent") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
      .select(Curation.hashFraction(col("id"), "a").as("ua"),
        Curation.hashFraction(col("id"), "b").as("ub"))
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) < 1))
    // different salts decorrelate: mean abs diff well away from 0
    val diff = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / rows.length
    assert(diff > 0.2)
    // rerun gives identical draws
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      rows.map(_.getDouble(0)).toSeq)
  }

  test("planMixUnimax: hand-computed waterfilling, both branches, invariance") {
    import spark.implicits._
    // masses a=10, b=15, c=50; caps (maxEpochs 2) = 20, 30, 100.
    // budget 100: a fits (20·3 ≤ 100), b fits (30·2 ≤ 80), c does not
    // (100·1 > 50) -> k=2, share = (100−50)/1 = 50; epochs: a,b capped
    // at 2.0, c downsampled to 1.0; leftover 0.
    val docs = Seq(("a", 4L), ("a", 6L), ("b", 15L), ("c", 50L))
      .toDF("lang", "n_chars")
    def planOf(budget: Long) =
      Curation.planMixUnimax(docs, "lang", col("n_chars"), budget,
          maxEpochs = 2)
        .collect().map(r => r.getAs[String]("lang") ->
          ((r.getAs[Boolean]("capped"), r.getAs[Long]("alloc_tokens"),
            r.getAs[Long]("epochs_micro"),
            r.getAs[Long]("leftover_tokens")))).toMap
    val p = planOf(100L)
    assert(p("a") === ((true, 20L, 2000000L, 0L)))
    assert(p("b") === ((true, 30L, 2000000L, 0L)))
    assert(p("c") === ((false, 50L, 1000000L, 0L)))
    // budget 1000: everything caps (k = L), leftover = 1000 − 150
    val q = planOf(1000L)
    assert(q("a") === ((true, 20L, 2000000L, 850L)))
    assert(q("c") === ((true, 100L, 2000000L, 850L)))
    // budget 9: nothing fits (20·3 > 9) -> k=0, share = 9 div 3 = 3
    val r = planOf(9L)
    assert(r("a") === ((false, 3L, 300000L, 0L)))
    assert(r("c") === ((false, 3L, 60000L, 0L)))
    // partition invariance
    val p2 = Curation.planMixUnimax(docs.repartition(5), "lang",
        col("n_chars"), 100L, maxEpochs = 2)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("alloc_tokens")).toMap
    assert(p2 === p.map { case (k, v) => k -> v._2 })
  }

  test("giniByStratum: hand-computed inequality, zero on uniform, tie-stable") {
    import spark.implicits._
    // a: [1,2,3,4] -> G = (2*30 - 5*10)/(4*10) = 0.25
    // b: [5,5,5]   -> 0 exactly (uniform)
    // c: [0,0,10]  -> (2*30 - 4*10)/(3*10) = 2/3 -> floor 666666 micro
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L),
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 10L))
      .toDF("src", "id", "x")
    val g = Curation.giniByStratum(rows, "src", "x", "id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g == Map("a" -> 250000L, "b" -> 0L, "c" -> 666666L))
    // result is invariant to input order / partitioning (ties included)
    val g2 = Curation.giniByStratum(rows.orderBy(col("x").desc)
        .repartition(5), "src", "x", "id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g2 == g)
  }

  test("giniByStratum: all-zero stratum is 0 (not NULL), sum is overflow-safe") {
    import spark.implicits._
    // z: [0,0] — S = 0; deflation convention pins gini to 0 instead of
    // the NULL a 0-denominator integer div would produce.
    // big: two docs at long-wrapping magnitude — a plain BIGINT sum of
    // 2 × (Long.MaxValue/2 + 1) wraps negative; the DECIMAL(38,0) sum
    // keeps the exact value, so gini stays 0 for the uniform pair.
    val big = Long.MaxValue / 2 + 1
    val rows = Seq(("z", 1L, 0L), ("z", 2L, 0L),
      ("big", 1L, big), ("big", 2L, big))
      .toDF("src", "id", "x")
    val g = Curation.giniByStratum(rows, "src", "x", "id")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(g == Map("z" -> 0L, "big" -> 0L))
  }

  test("stratifiedSample keeps ~rate per stratum and is content-stable") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val out = Curation.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5, "zh" -> 0.1))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 1000L) < 150)
    assert(math.abs(byLang("zh") - 200L) < 80)
    // unknown strata drop by default
    val docs2 = docs.withColumn("lang", lit("xx"))
    assert(Curation.stratifiedSample(docs2, "lang", "doc_id", Map("en" -> 0.5)).count() == 0)
    // sampling decision survives reordering/repartitioning
    val again = Curation.stratifiedSample(docs.repartition(7), "lang", "doc_id",
      Map("en" -> 0.5, "zh" -> 0.1))
    assert(again.select("doc_id").collect().map(_.getLong(0)).toSet ==
      out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("assignSplit respects weights and covers every row") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("id")
      .select(Curation.assignSplit(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
    val counts = df.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") - 4000L) < 200)
    assert(math.abs(counts("val") - 500L) < 100)
  }

  test("splitBounds exposes exact IEEE prefix sums") {
    val b = Curation.splitBounds(Seq("a" -> 0.8, "b" -> 0.1, "c" -> 0.1))
    assert(b.map(_._1) == Seq("a", "b", "c"))
    assert(b(0)._2 == 0.8 && b(1)._2 == 0.8 + 0.1)
  }

  test("redactPii scrubs emails, IPs, and phones; counts match") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith+x@example.co.uk end",
      "ip 192.168.0.1 and 10.0.0.255 here",
      "call +1-555-123-4567 now",
      "clean text with 1.2 version and a@b only").toDF("t")
    val got = df.select(
      Curation.redactPii(col("t")).as("r"),
      Curation.countMatches(col("t"), Curation.EmailRe).as("ne"),
      Curation.countMatches(col("t"), Curation.Ipv4Re).as("ni"),
      Curation.countMatches(col("t"), Curation.PhoneRe).as("np")).collect()
    assert(got(0).getString(0) == "mail <EMAIL> end" && got(0).getInt(1) == 1)
    assert(got(1).getString(0) == "ip <IP> and <IP> here" && got(1).getInt(2) == 2)
    assert(got(2).getString(0) == "call <PHONE> now" && got(2).getInt(3) == 1)
    // "1.2" is not an IP; "a@b" lacks a TLD — untouched
    assert(got(3).getString(0) == "clean text with 1.2 version and a@b only")
  }

  test("capPerStratum keeps at most cap rows per stratum, partition-invariant") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    val capped = Curation.capPerStratum(docs, "source", "doc_id", cap = 7)
    val bySrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ == 7L) && bySrc.size == 5)
    // small strata survive whole
    val tiny = (0L until 3L).map(i => (i, "only")).toDF("doc_id", "source")
    assert(Curation.capPerStratum(tiny, "source", "doc_id", 10).count() == 3)
    // same survivors regardless of partitioning
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.capPerStratum(docs.repartition(11), "source", "doc_id", 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("observed gate counts pass/total in the same job (no second pass)") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, if (i % 4 == 0) 0.9 else 0.1))
      .toDF("doc_id", "quality")
    val (gated, obs) = Curation.observedGate(docs, "quality_gate",
      col("quality") >= 0.5)
    assert(gated.count() == 25)
    val m = obs.get
    assert(m("total_rows") == 100L && m("kept_rows") == 25L)
  }

  test("streaming curation: quality gate + watermark dedup compose on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val good = "the quick brown fox is a dog and the cat is happy"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    // the batch gate is stateless map-only, so the same code runs on a
    // stream; watermark dedup bounds the state behind it
    val gated = TextAnalysis.annotateQualityLang(
        input.toDS().toDF("doc_id", "text", "ts"))
      .filter(col("quality") >= 0.5 && col("lang_guess") =!= "unknown")
    val out = Dedup.streamingDropDuplicates(gated, "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_out").start()
    try {
      input.addData(
        (1L, good, ts("2024-01-01 10:00:00")),
        (2L, good.toUpperCase, ts("2024-01-01 10:01:00")), // dup after normalize
        (3L, "zz", ts("2024-01-01 10:02:00")))             // fails the gate
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM scur_out")
        .collect().map(_.getLong(0)).toSet
      assert(got.size == 1 && got.subsetOf(Set(1L, 2L)),
        s"one gate-passing copy survives: $got")
    } finally q.stop()
  }

  test("token-budget sampling: exact prefix budgets, drops unbudgeted sources") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, s"s${i % 3}", 10 + (i % 7).toInt))
      .toDF("doc_id", "source", "n_tokens")
    val budgets = Map("s0" -> 200L, "s1" -> 55L) // s2 unbudgeted
    val kept = Curation.sampleTokenBudget(docs, budgets, nShards = 4)
    val bySource = kept.groupBy("source")
      .agg(sum("n_tokens").as("t"), max("budget_pos").as("maxPos"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!bySource.contains("s2"), "unbudgeted source must be dropped")
    budgets.foreach { case (s, budget) =>
      val (t, maxPos) = bySource(s)
      assert(t <= budget, s"$s over budget: $t > $budget")
      assert(t == maxPos, s"$s: budget_pos must equal the running token sum")
    }
    // maximality: every dropped budgeted doc would overshoot from its
    // global position (its prefix position exceeds the budget)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val droppedS1 = docs.filter(col("source") === "s1")
      .collect().map(_.getLong(0)).count(id => !keptIds.contains(id))
    assert(droppedS1 > 0, "s1's small budget must drop something")
    // partition invariance
    val again = Curation.sampleTokenBudget(docs.repartition(13), budgets, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == kept.collect().map(r => (r.getLong(0), r.getLong(3))).toSet)
  }

  test("sequence packing: contiguous shard fill, slot arithmetic, partition-invariant") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, 1 + (i % 37).toInt))
      .toDF("doc_id", "n_tokens")
    val packed = Curation.packSequences(docs, maxTokens = 100, nShards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(packed.length == 400)
    // slot arithmetic: start = bin_id*max + offset; offset < max
    packed.foreach { case (_, _, bin, off, _) =>
      assert(off >= 0 && off < 100 && bin >= 0)
    }
    // per shard, starts are the exact running sum of token counts: sorted
    // by start, each doc begins where the previous ended
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val byStart = rows.map { case (_, _, bin, off, n) => (bin * 100 + off, n) }
        .sortBy(_._1)
      byStart.scanLeft(0L) { case (expect, (start, n)) =>
        assert(start == expect, s"gap: doc starts at $start, expected $expect")
        expect + n
      }
    }
    // content-stable: identical packing on any partition layout
    val again = Curation.packSequences(docs.repartition(13), 100, 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(packed.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("top-quantile gate: exact ceil cut, deterministic ties, edge fractions") {
    import spark.implicits._
    val docs = Seq(
      // source a: 5 docs, q=0.25 -> ceil(1.25)=2 survivors (scores 50, 40)
      (1L, "a", 10), (2L, "a", 20), (3L, "a", 30), (4L, "a", 40), (5L, "a", 50),
      // source b: all-tied scores -> key order decides, ceil(0.25*4)=1
      (11L, "b", 7), (12L, "b", 7), (13L, "b", 7), (14L, "b", 7)
    ).toDF("doc_id", "source", "n_tokens")
    def kept(q: Long) =
      Curation.keepTopQuantile(docs, "source", "n_tokens", "doc_id", q)
        .collect().map(_.getLong(0)).toSet
    assert(kept(250000L) == Set(4L, 5L, 11L), s"got ${kept(250000L)}")
    assert(kept(1000000L) == (1L to 5L).toSet ++ (11L to 14L).toSet)
    assert(kept(0L) == Set.empty)
  }

  test("temperature flattening: smallest source whole, sqrt-ratio shares") {
    import spark.implicits._
    // sources: a=1000 docs, b=250, c=10 (smallest -> kept whole)
    val docs = ((1L to 1000L).map(i => (i, "a")) ++
      (2001L to 2250L).map(i => (i, "b")) ++
      (3001L to 3010L).map(i => (i, "c"))).toDF("doc_id", "source")
    val kept = Curation.temperatureFlatten(docs, "source", "doc_id")
      .select("source").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    // c: p = sqrt(10/10) = 1 -> all 10 survive
    assert(kept("c") == 10, s"got $kept")
    // a: p = sqrt(10/1000) = 0.1 -> ~100; b: p = sqrt(10/250) = 0.2 -> ~50
    assert(kept("a") > 60 && kept("a") < 140, s"got $kept")
    assert(kept("b") > 25 && kept("b") < 75, s"got $kept")
    // deterministic across partitionings (bit-identical keep set)
    val a = Curation.temperatureFlatten(docs, "source", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.temperatureFlatten(docs.repartition(13), "source", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("winsorize: clips at the exact per-stratum quantile value") {
    import spark.implicits._
    // source a: scores 10..100 by 10 (n=10); top-20% rank = ceil(2) = 2
    // -> threshold is the 2nd-highest value (90); 100 clips to 90
    val docs = (1L to 10L).map(i => (i, "a", (i * 10).toInt))
      .toDF("doc_id", "source", "n_tokens")
    val out = Curation.clipAtQuantile(docs, "source", "n_tokens", "doc_id",
        qMicro = 200000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_tokens_clipped"))).toMap
    assert(out.size == 10)
    assert(out(10L) == (100, 90), s"got ${out(10L)}")
    assert(out(9L) == (90, 90) && out(1L) == (10, 10))
    // every clipped value <= threshold, unclipped values unchanged
    assert(out.values.forall { case (v, c) => c == math.min(v, 90) })
  }

  test("global sample: exact count, partition-invariant, nested draws") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"s${i % 7}")).toDF("doc_id", "source")
    val s100 = Curation.sampleGlobal(docs, 100, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s100.size == 100)
    // partition-invariant draw
    val again = Curation.sampleGlobal(docs.repartition(17), 100, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s100 == again)
    // nestedness: hash-ranked draws grow monotonically — the 50-sample is
    // exactly the first half of the 100-sample (resizable samples for free)
    val s50 = Curation.sampleGlobal(docs, 50, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s50.subsetOf(s100) && s50.size == 50)
  }

  test("sketch winsorize: clips only the p99 tail, threshold brackets exact p99") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.01")
    val out = Curation.winsorizeBySketch(ev, "event_type", "value")
    val rows = out.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(when(col("value_clipped_micro") < col("value_micro"), 1L)
        .otherwise(0L)).as("clipped"),
      max(col("value_clipped_micro")).as("t_sketch")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, clipped, tSketch) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // only the tail above the (one-sided-low) sketch p99 clips:
      // ≥ ~1% of rows, but bounded by the 1/16 bin slack
      assert(clipped >= n / 100, s"${r.getString(0)}: clipped=$clipped of $n")
      assert(clipped <= n * 4 / 100, s"${r.getString(0)}: clipped=$clipped of $n")
      // the attained clip cap is the sketch threshold; exact p99 lies in
      // its bin: t_sketch ≤ p99_exact ≤ t_sketch·(1+1/16)
      val p99 = ev.filter(col("event_type") === r.getString(0))
        .stat.approxQuantile("value", Array(0.99), 0.0)(0) * 1e6
      assert(tSketch <= p99 * 1.001 && tSketch >= p99 / 1.08,
        s"${r.getString(0)}: t_sketch=$tSketch exact_p99=$p99")
    }
  }

  test("planMixUniform: hand-computed quotas, rates, epochs, shortfalls") {
    import spark.implicits._
    val docs = Seq(("A", 100L), ("B", 50L), ("C", 10L)).toDF("src", "n")
    val out = Curation.planMixUniform(docs, "src", col("n"), budget = 120L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // P = 3 -> quota 40 each
    assert(out("A") == (100L, 40L, 400000L, 400000L, 0L), s"A: ${out("A")}")
    assert(out("B") == (50L, 40L, 800000L, 800000L, 0L), s"B: ${out("B")}")
    // C is under quota: rate caps at 1, epochs 4x, 30 tokens short
    assert(out("C") == (10L, 40L, 1000000L, 4000000L, 30L), s"C: ${out("C")}")
  }

  test("rankNormalize: hand-computed percentiles, singletons at 0, id ties") {
    import spark.implicits._
    val df = Seq((1L, "A", 10L), (2L, "A", 30L), (3L, "A", 20L),
      (4L, "B", 99L), (5L, "A", 20L)).toDF("id", "src", "s")
    val out = Curation.rankNormalize(df, "src", "s", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // A ranks by (s asc, id): 1(10)->0, 3(20)->2/3, 5(20)->1/3... wait
    // (20, id 3) before (20, id 5): ranks 1=id1, 2=id3, 3=id5, 4=id2
    assert(out(1L) == 0L)
    assert(out(3L) == 333333L && out(5L) == 666666L) // tie ordered by id
    assert(out(2L) == 1000000L)
    assert(out(4L) == 0L) // singleton stratum normalizes to 0
  }

  test("sampleWeighted: exact n, weight-proportional inclusion, invariant") {
    import spark.implicits._
    // 100 heavy rows (weight 500) among 900 light rows (weight 1)
    val df = (0L until 1000L)
      .map(i => (i, if (i < 100) 500L else 1L)).toDF("id", "w")
    val out = Curation.sampleWeighted(df, n = 100, weightCol = "w",
      keyCol = "id")
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 100)
    // heavy rows carry ~98% of total weight -> they dominate the sample
    assert(ids.count(_ < 100L) > 80, s"only ${ids.count(_ < 100L)} heavy rows")
    // deterministic + partition-invariant
    val again = Curation.sampleWeighted(df.repartition(7), n = 100,
      weightCol = "w", keyCol = "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // non-positive weights are never drawn
    val withZero = df.withColumn("w", when(col("id") < 999L, col("w")).otherwise(0L))
    assert(!Curation.sampleWeighted(withZero, n = 1000, weightCol = "w",
      keyCol = "id").select("id").collect().map(_.getLong(0)).contains(999L))
  }

  test("curriculumInterleave: round-robin over equal-depth difficulty buckets") {
    import spark.implicits._
    val df = (1 to 6).map(i => (i.toLong, "s", i * 10)).toDF("id", "src", "score")
    val got = Curation.curriculumInterleave(df, "src", "score", "id", nBuckets = 3)
      .orderBy(col("sched_rank"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("sched_rank")))
    // easy->hard within every window of 3: 1 (b0), 3 (b1), 5 (b2), 2, 4, 6
    assert(got.toSeq == Seq((1L, 0L, 0L), (3L, 1L, 1L), (5L, 2L, 2L),
      (2L, 0L, 3L), (4L, 1L, 4L), (6L, 2L, 5L)))
    // partition invariance
    val again = Curation.curriculumInterleave(df.repartition(5), "src",
      "score", "id", nBuckets = 3).collect().map(_.toSeq).toSet
    assert(again == Curation.curriculumInterleave(df, "src", "score", "id",
      nBuckets = 3).collect().map(_.toSeq).toSet)
  }

  test("planMixEpochs: full epochs + named fractional membership add up") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "small", 10L)) ++ // 100 tokens
      (11 to 30).map(i => (i.toLong, "big", 50L))).toDF("doc_id", "src", "n_tokens")
    val got = Curation.planMixEpochs(df, "src", targetTokens = 250L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val s = got("small") // 100 tokens -> 2.5 epochs
    assert(s.getAs[Long]("epochs_micro") == 2500000L)
    assert(s.getAs[Long]("full_epochs") == 2L)
    assert(s.getAs[Long]("frac_micro") == 500000L)
    assert(s.getAs[Long]("planned_tokens") ==
      2L * 100L + s.getAs[Long]("partial_tokens"))
    val b = got("big") // 1000 tokens -> 0.25 epochs: pure subsample
    assert(b.getAs[Long]("full_epochs") == 0L)
    assert(b.getAs[Long]("frac_micro") == 250000L)
    assert(b.getAs[Long]("planned_tokens") == b.getAs[Long]("partial_tokens"))
    // the fractional membership is the hash predicate, independently computed
    val hm = df.select(col("doc_id"), col("src"),
      pmod(Dedup.hashStr(col("doc_id").cast("string"), 97), lit(1000000L))
        .as("hm")).collect().map(r => (r.getString(1), r.getLong(2)))
    val expSmall = hm.count { case (g, h) => g == "small" && h < 500000L }
    assert(s.getAs[Long]("partial_docs") == expSmall.toLong)
    // partition invariance
    val again = Curation.planMixEpochs(df.repartition(7), "src", 250L)
      .collect().map(_.toSeq).toSet
    assert(again ==
      Curation.planMixEpochs(df, "src", 250L).collect().map(_.toSeq).toSet)
  }

  test("planRepeatValue: no-decay reduces to the fresh plan; halving decay hand-checks") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "small", 10L)) ++ // 100 tokens
      (11 to 30).map(i => (i.toLong, "big", 50L))).toDF("doc_id", "src", "n_tokens")
    // LAW — decayMicro = unit: every epoch at face value, so the plan
    // IS planMixEpochs (same rows) with effective == planned
    val fresh = Curation.planRepeatValue(df, "src", targetTokens = 250L,
        decayMicro = 1000000L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val base = Curation.planMixEpochs(df, "src", targetTokens = 250L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    fresh.foreach { case (src, r) =>
      assert(r.getAs[Long]("effective_tokens") == r.getAs[Long]("planned_tokens"),
        s"$src: no decay must be value-neutral")
      assert(r.getAs[Long]("value_ratio_micro") == 1000000L)
      assert(r.getAs[Long]("planned_tokens") ==
        base(src).getAs[Long]("planned_tokens"))
    }
    // δ = 1/2: log2Micro/exp2Micro are shift-exact on powers of two, so
    // epoch k is worth exactly floor(tokens/2^k) — hand-checkable.
    // small (100 tokens, 2 full epochs + partial p):
    //   effective = 100 + 50 + p/4
    val dec = Curation.planRepeatValue(df, "src", targetTokens = 250L,
        decayMicro = 500000L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val s = dec("small")
    val p = s.getAs[Long]("partial_tokens")
    assert(s.getAs[Long]("effective_tokens") == 100L + 50L + p / 4L,
      s"hand-checked halving decay: ${s.getAs[Long]("effective_tokens")}, p=$p")
    assert(s.getAs[Long]("effective_tokens") < s.getAs[Long]("planned_tokens"))
    // big: full_epochs = 0 -> only the k=0 partial at face value
    val b = dec("big")
    assert(b.getAs[Long]("effective_tokens") == b.getAs[Long]("planned_tokens"),
      "a never-repeated stratum pays no decay")
    // the epoch cap raises loudly instead of exploding unboundedly
    val e = intercept[Exception] {
      Curation.planRepeatValue(df, "src", targetTokens = 250L,
        decayMicro = 500000L, maxEpochs = 1).collect()
    }
    assert(e.getMessage.contains("planRepeatValue"), e.getMessage)
  }

  test("planRepeatOptimal: equal-depth waterfill hand-check, no-decay identity, exchange dominance") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "small", 10L)) ++ // 100 tokens
      (11 to 18).map(i => (i.toLong, "big", 50L)))            // 400 tokens
      .toDF("doc_id", "src", "n_tokens")
    // B = 1000 over U = 500: k* = 2 full levels, R = 0 — every stratum
    // at depth 2; with δ = 1/2 (shift-exact) the values hand-check
    val opt = Curation.planRepeatOptimal(df, "src", budget = 1000L,
        decayMicro = 500000L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val s = opt("small"); val b = opt("big")
    assert(s.getAs[Long]("full_levels") == 2L &&
      s.getAs[Long]("partial_tokens") == 0L &&
      s.getAs[Long]("alloc_tokens") == 200L &&
      s.getAs[Long]("effective_tokens") == 150L, s.toString)
    assert(b.getAs[Long]("alloc_tokens") == 800L &&
      b.getAs[Long]("effective_tokens") == 600L, b.toString)
    assert(s.getAs[Long]("leftover_tokens") == 0L)
    // no-decay identity: δ = unit prices every level at face value
    Curation.planRepeatOptimal(df, "src", budget = 1000L,
        decayMicro = 1000000L).collect().foreach { r =>
      assert(r.getAs[Long]("effective_tokens") == r.getAs[Long]("alloc_tokens"))
      assert(r.getAs[Long]("value_ratio_micro") == 1000000L)
    }
    // exchange dominance: the SAME 1000-token budget split unequally
    // (600 on the small stratum = depth 6, 400 on the big = depth 1)
    // values strictly less than the equal-depth plan's 750
    val skewS = Curation.planRepeatOptimal(df.filter(col("src") === "small"),
      "src", budget = 600L, decayMicro = 500000L)
      .collect().head.getAs[Long]("effective_tokens")
    val skewB = Curation.planRepeatOptimal(df.filter(col("src") === "big"),
      "src", budget = 400L, decayMicro = 500000L)
      .collect().head.getAs[Long]("effective_tokens")
    assert(skewS == 196L && skewB == 400L, s"$skewS/$skewB")
    assert(skewS + skewB < 150L + 600L,
      "unequal depth must value less at equal spend")
    // epoch cap raises loudly
    val e = intercept[Exception] {
      Curation.planRepeatOptimal(df, "src", budget = 1000000L,
        decayMicro = 500000L, maxEpochs = 3).collect()
    }
    assert(e.getMessage.contains("planRepeatOptimal"), e.getMessage)
  }

  test("splitByCluster: whole clusters share a split; singletons keyed by own id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3} via a pair chain, cluster {10,11}, singletons 20, 21
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Curation.splitByCluster(docs, pairs, w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = got.map(t => t._1 -> ((t._2, t._3))).toMap
    // one rep + one split per cluster, min-id representative
    assert(Set(1L, 2L, 3L).map(byDoc(_)).size == 1)
    assert(byDoc(1L)._1 == 1L)
    assert(Set(10L, 11L).map(byDoc(_)).size == 1)
    assert(byDoc(10L)._1 == 10L)
    // singletons are their own rep, split = plain per-doc assignment
    assert(byDoc(20L)._1 == 20L)
    val expected = docs.select(col("doc_id"),
        Curation.assignSplit(col("doc_id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc(20L)._2 == expected(20L) && byDoc(21L)._2 == expected(21L))
    // cluster split equals the REPRESENTATIVE's per-key draw
    assert(byDoc(2L)._2 == expected(1L))
  }

  test("kAnonymityAudit flags equivalence classes smaller than k") {
    import spark.implicits._
    val df = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("en", "books")) ++
        Seq(("fr", "web")))
      .toDF("lang", "source")
    val got = Curation.kAnonymityAudit(df, Seq("lang", "source"), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(("en", "web", 5L, false), ("en", "books", 2L, true),
      ("fr", "web", 1L, true)))
  }

  test("lDiversityAudit flags big-but-homogeneous classes k-anonymity passes") {
    import spark.implicits._
    // class (en, web): 5 rows but ONE sensitive value -> l-diversity
    // catches what a k=5 anonymity audit calls safe
    val df = (Seq.fill(5)(("en", "web", "cancer")) ++
        Seq(("en", "books", "flu"), ("en", "books", "cold"),
          ("en", "books", "cancer")))
      .toDF("lang", "source", "dx")
    val got = Curation.lDiversityAudit(df, Seq("lang", "source"), "dx", l = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSet
    assert(got == Set(
      ("en", "web", 5L, 1L, true),
      ("en", "books", 3L, 3L, false)), got.toString)
  }

  test("tClosenessAudit: hand-computed ordered EMD, skew flagged, centered class passes") {
    import spark.implicits._
    // values 0/1/2; global counts (3,1,3), N=7, m=3, cum G = (3,4,7)
    //  A = [0,0]    : C=(2,2,2) -> |14-6|? terms |7·2−2·3|,|14−8|,0 = 8+6 = 14
    //  B = [2,2]    : C=(0,0,2) -> 6+8 = 14
    //  C = [0,1,2]  : C=(1,2,3) -> 2+2 = 4
    val df = (Seq(("A", 0L), ("A", 0L), ("B", 2L), ("B", 2L),
        ("C", 0L), ("C", 1L), ("C", 2L))).toDF("q", "v")
    val got = Curation.tClosenessAudit(df, Seq("q"), "v", tMicro = 200000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      ("A", 2L, 14L * 1000000L / 28L, true),   // 500000
      ("B", 2L, 500000L, true),
      ("C", 3L, 4L * 1000000L / 42L, false)),  // 95238
      got.toString)
    // partition-invariance (the windows and joins carry no order dependence)
    val got2 = Curation.tClosenessAudit(df.repartition(5), Seq("q"), "v",
        tMicro = 200000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got2 == got)
  }

  test("tClosenessAudit: a class missing interior values still accumulates their terms") {
    import spark.implicits._
    // class D observes only the extremes 0 and 4 of a 0..4 domain — the
    // interior grid rows (1,2,3) must still contribute |N·C−n·G| terms
    val df = ((0L to 4L).map(v => ("bg", v)) ++ Seq(("D", 0L), ("D", 4L)))
      .toDF("q", "v")
    // global counts: each of 0..4 once, plus D's 0 and 4 -> (2,1,1,1,2), N=7
    // G cum = (2,3,4,5,7); D: C cum = (1,1,1,1,2), n=2
    // terms: |7−4|=3, |7−6|=1, |7−8|=1, |7−10|=3, |14−14|=0 -> Σ=8
    // emd = 8e6 // (4·2·7) = 142857
    val d = Curation.tClosenessAudit(df, Seq("q"), "v", tMicro = 100000L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(d("D") == 142857L, d.toString)
  }

  test("k-center coreset: farthest-point order, exact replay, invariance") {
    import spark.implicits._
    // three tight clusters at distance >> intra spread, plus the
    // max-norm pin: cluster A around (10, 0), B around (0, 10),
    // C around (-10, -10) — C has the largest norm so it seeds
    val mk = (id: Long, x: Double, y: Double) => (id, Array(x.toFloat, y.toFloat))
    val vecs = Seq(
      mk(1, 10.0, 0.0), mk(2, 10.1, 0.1), mk(3, 9.9, -0.1),
      mk(4, 0.0, 10.0), mk(5, 0.1, 10.1),
      mk(6, -10.0, -10.0), mk(7, -10.1, -9.9))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Curation.coresetKCenter(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // seed = max norm (id 7: 10.1²+9.9² > 10²+10²... id 6 vs 7: 6 is
    // 200e12, 7 is 200.02e12 -> id 7), then the farthest cluster reps
    assert(got(0)._1 == 1L && got(0)._2 == 7L && got(0)._3 == 0L, got.mkString(","))
    val pickedClusters = got.map(_._2).map {
      case i if i <= 3 => "A"; case i if i <= 5 => "B"; case _ => "C" }
    assert(pickedClusters.toSet == Set("A", "B", "C"),
      s"one center per cluster expected: ${got.mkString(",")}")
    // exact sequential replay of the greedy traversal
    def micro(v: Array[Float]) = v.map(x => math.floor(x * 1000000.0).toLong)
    val mv = vecs.map { case (id, v) => id -> micro(v) }.toMap
    def q(a: Array[Long]) = a.map(x => x * x).sum
    def d2(a: Array[Long], b: Array[Long]) =
      q(a) + q(b) - 2L * a.zip(b).map { case (x, y) => x * y }.sum
    var sel = Seq(mv.keys.toSeq.sortBy(id => (-q(mv(id)), id)).head)
    val replay = Seq.newBuilder[(Long, Long, Long)]
    replay += ((1L, sel.head, 0L))
    for (r <- 2 to 3) {
      val cand = mv.keys.toSeq.filterNot(sel.contains).map { id =>
        id -> sel.map(c => d2(mv(id), mv(c))).min
      }
      val (nid, nd) = cand.sortBy { case (id, dd) => (-dd, id) }.head
      replay += ((r.toLong, nid, nd))
      sel :+= nid
    }
    assert(got.toSeq == replay.result(), s"${got.mkString(",")}")
    // partition invariance
    val got2 = Curation.coresetKCenter(emb.repartition(5), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == got2.toSeq)
  }

  test("doremi: divergent domain upweighted, sequential replay, invariance") {
    import spark.implicits._
    // domain 'mix' draws from the shared vocabulary (KL ≈ 0); domain
    // 'odd' has its own vocabulary (large KL ⇒ large excess ⇒ weight ↑)
    val r = new scala.util.Random(5)
    val shared = (1 to 12).map(i => s"common$i")
    val odd = (1 to 12).map(i => s"rare$i")
    def doc(v: Seq[String]) =
      (1 to 20).map(_ => v(r.nextInt(v.size))).mkString(" ")
    val rows = (1 to 30).map(i => (i.toLong, doc(shared), "mix_a")) ++
      (31 to 60).map(i => (i.toLong, doc(shared), "mix_b")) ++
      (61 to 75).map(i => (i.toLong, doc(odd), "odd")) :+
      ((76L, "", "empty"))
    val docs = rows.toDF("doc_id", "text", "lang")
    val got = Curation.doremiDomainWeights(docs, rounds = 4, etaNum = 1L,
        etaDen = 4L)
      .collect().map(row => row.getString(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
          row.getLong(5)))).toMap
    assert(got.size == 4)
    assert(got("empty") == ((1L, 0L, 0L, 0L, got("empty")._5)))
    assert(got("odd")._4 > got("mix_a")._4, got.toString) // excess higher
    assert(got("odd")._5 > got("mix_a")._5, got.toString) // weight higher
    // sequential BigInt replay of the whole pipeline from raw tokens
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val toks = rows.flatMap { case (_, t, d) =>
      norm(t).split(" ").filter(_.nonEmpty).map(d -> _)
    }
    val cdw = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ndT = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cwT = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTot = toks.size.toLong
    import graft.functions.ExactMicroOps.{log2Micro, exp2Micro}
    val domains = rows.map(_._3).distinct.sorted
    val klSeq = domains.map { d =>
      val nd = ndT.getOrElse(d, 0L)
      if (nd == 0L) d -> 0L
      else {
        val num = cdw.collect { case ((`d`, w), c) =>
          BigInt(c) * (log2Micro(c) - log2Micro(nd) - log2Micro(cwT(w)) +
            log2Micro(nTot))
        }.sum
        val q = (num.abs / nd) * num.signum
        d -> q.toLong
      }
    }.toMap
    val xs = domains.map(d => d ->
      exp2Micro(math.min(math.max(klSeq(d), 0L) / 4L, 20000000L))).toMap
    var a = domains.map(d => d -> 1000000L / domains.size).toMap
    var asum = domains.map(d => d -> 0L).toMap
    for (_ <- 1 to 4) {
      val up = domains.map(d => d -> a(d) * xs(d) / 1000000L).toMap
      val s = up.values.sum
      a = domains.map(d => d -> up(d) * 1000000L / s).toMap
      asum = domains.map(d => d -> (asum(d) + a(d))).toMap
    }
    domains.foreach { d =>
      assert(got(d)._4 == math.max(klSeq(d), 0L), s"$d excess")
      assert(got(d)._5 == asum(d) / 4L, s"$d weight")
    }
    // partition invariance (exact integer arithmetic end to end)
    val got2 = Curation.doremiDomainWeights(docs.repartition(7), rounds = 4,
        etaNum = 1L, etaDen = 4L)
      .collect().map(row => row.getString(0) -> row.getLong(5)).toMap
    assert(domains.forall(d => got2(d) == got(d)._5))
  }

  test("planMixUnimax: NULL token masses coalesce to 0; negative masses raise loudly") {
    import spark.implicits._
    // stratum 'b' has only NULL tokens -> mass 0, cap 0, always capped
    val d = Seq(("a", Some(10L)), ("a", Some(10L)), ("b", None), ("b", None))
      .toDF("lang", "toks")
    val plan = Curation.planMixUnimax(d, "lang", col("toks"), budget = 30L,
        maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"))).toMap
    assert(plan("b")._1 == 0L, "NULL mass must coalesce to 0")
    assert(plan("b")._2 == 0L, "zero-mass stratum gets its zero cap")
    assert(plan("a")._1 == 20L)
    val neg = Seq(("a", 10L), ("b", -5L)).toDF("lang", "toks")
    val e = intercept[Exception] {
      Curation.planMixUnimax(neg, "lang", col("toks"), budget = 30L).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("negative token mass") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("negative token mass")),
      s"want the named-stratum raise, got: ${e.getMessage}")
  }

  test("dsirSelect: uniform target => zero log-weights; budget-sized keep set; determinism") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(i => (i, if (i % 3 == 0) "en" else "zh",
        s"token$i shared words here number${i % 7}"))
      .toDF("doc_id", "lang", "text")
    // target == everything -> p_t == p_r per bucket -> logw == 0 for all
    val uni = Curation.dsirSelect(docs, isTarget = lit(true), budget = 10,
      buckets = 64, seed = 29).collect()
    assert(uni.forall(_.getAs[Long]("logw_micro") == 0L),
      "uniform target must give zero log-weights")
    assert(uni.count(_.getAs[Boolean]("keep")) == 10)
    // a real target slice: weights move, en-doc mean weight > zh-doc mean
    val sel = Curation.dsirSelect(docs, isTarget = col("lang") === "en",
      budget = 10, buckets = 64, seed = 29)
    val rows = sel.collect()
    assert(rows.count(_.getAs[Boolean]("keep")) == 10)
    val byId = rows.map(r => r.getLong(0) -> r.getAs[Long]("logw_micro")).toMap
    val enMean = (0L until 60L).filter(_ % 3 == 0).map(byId).sum / 20
    val zhMean = (0L until 60L).filter(_ % 3 != 0).map(byId).sum / 40
    assert(enMean > zhMean,
      s"target-like docs must score higher: en=$enMean zh=$zhMean")
    // partition invariance (content-addressed draws, integer arithmetic)
    val again = Curation.dsirSelect(docs.repartition(7),
      isTarget = col("lang") === "en", budget = 10, buckets = 64, seed = 29)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("gumbel_micro"), r.getAs[Boolean]("keep"))).toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) ==
        (r.getAs[Long]("gumbel_micro"), r.getAs[Boolean]("keep")))
    }
  }

  test("dsirShiftEval: selection beats the size-matched random baseline toward the target") {
    import spark.implicits._
    // en docs share a distinctive vocabulary; zh docs another -> the
    // importance-weighted subset must be KL-closer to the en model than
    // a same-size random draw
    val docs = (0L until 80L)
      .map(i => (i, if (i % 2 == 0) "en" else "zh",
        if (i % 2 == 0) s"alpha beta gamma delta tok${i % 5}"
        else s"omega sigma lambda kappa tok${i % 5}"))
      .toDF("doc_id", "lang", "text")
    val r = Curation.dsirShiftEval(docs, isTarget = col("lang") === "en",
      budget = 20, buckets = 64, seed = 29).collect().head
    assert(r.getAs[Long]("kl_selected_micro") >= 0L)
    assert(r.getAs[Long]("improvement_micro") > 0L,
      s"selection must beat the random baseline: $r")
    assert(r.getAs[Long]("improvement_micro") ==
      r.getAs[Long]("kl_random_micro") - r.getAs[Long]("kl_selected_micro"))
    // partition invariance
    val r2 = Curation.dsirShiftEval(docs.repartition(7),
      isTarget = col("lang") === "en", budget = 20, buckets = 64,
      seed = 29).collect().head
    assert(r2.toSeq == r.toSeq)
  }

  test("sourceJsdMatrix: zero for identical sources, bounded, orders by distance") {
    import spark.implicits._
    // A and B share the same text; C is vocabulary-disjoint. Token
    // counts well above the bucket count so the Laplace mass (which
    // dominates when n << buckets and shrinks every divergence toward
    // 0 — correct smoothing behavior, wrong fixture) stays small.
    // vocabularies chosen to hash into DISJOINT buckets at seed 31,
    // B = 32 (verified against the md5 chain): A/B occupy buckets
    // {4, 28, 22, 27, 9}, C occupies {18, 11, 23, 14, 13}
    val a = ("alpha beta gamma delta epsilon " * 30).trim
    val c = ("omega kappa tau rho nu " * 30).trim
    val docs = Seq(
      (1L, a, "A"), (2L, a, "A"),
      (3L, a, "B"), (4L, a, "B"),
      (5L, c, "C"), (6L, c, "C"))
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceJsdMatrix(docs, buckets = 32, seed = 31)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("jsd_micro"))).toMap
    assert(got.size == 3)
    // identical distributions: every bucket term is exactly zero
    assert(got(("A", "B")) == 0L, got.toString)
    // JSD is bounded by 1 bit; disjoint vocab is far from both
    assert(got.values.forall(v => v >= 0L && v <= 1000000L), got.toString)
    assert(got(("A", "C")) > 400000L && got(("B", "C")) > 400000L,
      got.toString)
    assert(got(("A", "C")) == got(("B", "C")),
      "same distribution, same distance")
    // partition invariance
    val again = Curation.sourceJsdMatrix(docs.repartition(7),
      buckets = 32, seed = 31).collect().map(_.toSeq).toSet
    assert(again == Curation.sourceJsdMatrix(docs, buckets = 32,
      seed = 31).collect().map(_.toSeq).toSet)
  }

  test("dpGeometricCounts: inverse-CDF replay, pointwise epsilon monotonicity, guards") {
    import spark.implicits._
    import graft.functions.ExactMicroOps
    val docs = ((1 to 30).map(i => (i.toLong, "A")) ++
      (31 to 37).map(i => (i.toLong, "B")) ++
      (38 to 38).map(i => (i.toLong, "C"))).toDF("doc_id", "source")
    def run(eps: Long) = Curation.dpGeometricCounts(docs, "source",
        epsMicro = eps, seed = 47)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = run(1000000L)
    assert(got("A")._1 == 30L && got("B")._1 == 7L && got("C")._1 == 1L)
    assert(got.values.forall(_._3 >= 0L), "released counts clamp at 0")
    // sequential replay: same md5 uniforms, same quantized inverse CDF
    def h(seed: Int, s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$s".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val lgU6 = ExactMicroOps.log2Micro(1000000L)
    def noiseOf(s: String, eps: Long): Long = {
      val alpha = math.max(ExactMicroOps.exp2Micro(
        -(BigInt(eps) * 1442695L / 1000000L).toLong), 1L)
      val absLgA = lgU6 - ExactMicroOps.log2Micro(alpha)
      def x(seed: Int) =
        (lgU6 - ExactMicroOps.log2Micro(h(seed, s) % 1000000L + 1L)) / absLgA
      x(47) - x(48)
    }
    for ((s, (_, nz, _)) <- got)
      assert(nz == noiseOf(s, 1000000L), s"stratum $s")
    // more privacy budget -> pointwise no-larger geometric draws on the
    // SAME uniforms, in both directions of the difference
    val tight = run(4000000L)
    for (s <- got.keys) {
      assert(math.abs(tight(s)._2) <= math.abs(got(s)._2) ||
        noiseOf(s, 4000000L) == tight(s)._2) // signs may differ; replay pins
      assert(tight(s)._2 == noiseOf(s, 4000000L))
    }
    // at eps = 20 (absLgA huge) the quantized draws collapse to zero
    val wide = run(20000000L)
    assert(wide.values.forall(_._2 == 0L), wide.toString)
    // partition invariance + epsilon domain guard
    assert(run(1000000L) == Curation.dpGeometricCounts(
      docs.repartition(5), "source", epsMicro = 1000000L, seed = 47)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap)
    val e = intercept[IllegalArgumentException] {
      Curation.dpGeometricCounts(docs, "source", epsMicro = 50L)
    }
    assert(e.getMessage.contains("epsMicro"))
  }

  test("classBalancedWeights: hand-derived powers, imbalance monotonicity, beta=0 uniform") {
    import spark.implicits._
    // strata A:1 doc, B:3, C:12 — skewed on purpose (the registry
    // corpus is balanced, so the law lives here)
    val docs = ((1 to 1).map(i => (i.toLong, "A")) ++
      (2 to 4).map(i => (i.toLong, "B")) ++
      (5 to 16).map(i => (i.toLong, "C"))).toDF("doc_id", "source")
    val got = Curation.classBalancedWeights(docs, "source",
        betaMicro = 999000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // beta^1 = 999000; beta^3 via the LSB chain: 999000*998001/1e6
    assert(got("A")._2 == 999000L)
    assert(got("B")._2 == 997002L, got("B").toString)
    // bigger stratum -> bigger effective number -> SMALLER weight
    assert(got("A")._3 < got("B")._3 && got("B")._3 < got("C")._3)
    assert(got("A")._4 > got("B")._4 && got("B")._4 > got("C")._4)
    // floored normalization can only undershoot the unit
    val ws = got.values.map(_._4).sum
    assert(ws <= 1000000L && ws >= 999997L, ws.toString)
    // beta = 0: every sample worth 1, weights uniform
    val flat = Curation.classBalancedWeights(docs, "source",
        betaMicro = 0L)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(flat.forall(t => t._1 == 1000000L && t._2 == 333333L),
      flat.mkString(","))
    // strata guard fires loudly
    val e = intercept[IllegalArgumentException] {
      Curation.classBalancedWeights(docs, "doc_id", maxStrata = 5)
    }
    assert(e.getMessage.contains("16 strata"))
  }

  test("facilityLocationSelect: sequential replay, diminishing gains, pool guard") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val dims = 6
    val rows = (1L to 40L).map(i =>
      (i, Seq.fill(dims)(rnd.nextDouble() * 2 - 1)))
    val emb = rows.toDF("vec_id", "emb_d")
      .select(col("vec_id"),
        col("emb_d").cast("array<float>").as("embedding"))
    val got = Curation.facilityLocationSelect(emb,
        emb.filter(col("vec_id") <= 12L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 5 && got.map(_._1).toSeq == (1L to 5L))
    // submodularity: marginal gains never increase along the greedy path
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      got.mkString(","))
    // sequential replay: same micro quantization, floored sims, greedy
    def micro(v: Seq[Double]): Array[Long] =
      v.map(x => math.floor(x.toFloat.toDouble * 1e6).toLong).toArray
    val vs = rows.map { case (i, v) => i -> micro(v) }.toMap
    def sim(a: Long, b: Long): Long =
      math.max(vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum, 0L)
    val poolIds = (1L to 12L).toSeq
    var cur = rows.map(_._1 -> 0L).toMap
    var sel = Seq.empty[Long]
    val expect = (1 to 5).map { r =>
      val (cid, g) = poolIds.filterNot(sel.contains).map { j =>
        j -> rows.map { case (i, _) => math.max(sim(i, j) - cur(i), 0L) }
          .map(BigInt(_)).sum
      }.maxBy { case (j, g) => (g, -j) }
      sel :+= cid
      cur = cur.map { case (i, c) => i -> math.max(c, sim(i, cid)) }
      (r.toLong, cid, (g / 1000000).toLong)
    }
    assert(got.toSeq == expect, s"${got.toSeq} vs $expect")
    // partition invariance
    val again = Curation.facilityLocationSelect(emb.repartition(7),
      emb.filter(col("vec_id") <= 12L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
    // corpus-sized pools fail loudly
    val e = intercept[IllegalArgumentException] {
      Curation.facilityLocationSelect(emb, emb, k = 2, maxPool = 10)
    }
    assert(e.getMessage.contains("pool of 40"))
  }
}
