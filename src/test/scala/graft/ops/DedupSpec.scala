package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups by normalized content") {
    val d = docs(
      1L -> "Hello, World!",
      2L -> "hello   world",   // same after normalization
      3L -> "different text",
      4L -> "HELLO WORLD")
    val groups = Dedup.exactGroups(d).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
    assert(groups.head.getAs[Long]("n_dups") == 3L)
    val kept = Dedup.dropExactDuplicates(d).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("minhash-lsh finds planted near-duplicates, skips unrelated docs") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"word$i").mkString(" ") + " extra token"
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val pairs = Dedup.minHashLshPairs(d, threshold = 0.7).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.9)
  }

  test("edit-distance pairs: banded levenshtein over lossless length blocks") {
    val base = "x" * 100
    val d = docs(
      1L -> base,                // len 100
      2L -> (base + "abc"),      // len 103, dist(1,2)=3
      3L -> ("y" * 100),         // same block as 1, dist 100 > bound
      4L -> base.drop(2),        // len 98, dist(1,4)=2, dist(2,4)=5
      5L -> ("z" * 95),          // bucket 5 at W=16 …
      6L -> ("z" * 97))          // … bucket 6: adjacent-block pair, dist 2
    val pairs = Dedup.editDistancePairs(d, maxDist = 10, bucketWidth = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(pairs == Set((1L, 2L, 3), (1L, 4L, 2), (2L, 4L, 5), (5L, 6L, 2)))
  }

  test("edit-distance pairs: blocking width must exceed the bound") {
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs(1L -> "a"), maxDist = 16, bucketWidth = 16)
    }
  }

  test("passjoin finds the same pairs as length blocking (lossless)") {
    val base = "x" * 100
    val d = docs(
      1L -> base,
      2L -> (base + "abc"),
      3L -> ("y" * 100),
      4L -> base.drop(2),
      5L -> ("z" * 95),
      6L -> ("z" * 97))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val viaBlocks = rows(Dedup.editDistancePairs(d, maxDist = 10, bucketWidth = 16))
    val viaPassjoin = rows(Dedup.editPassJoinPairs(d, maxDist = 10))
    assert(viaPassjoin == viaBlocks)
    assert(viaPassjoin == Set((1L, 2L, 3), (1L, 4L, 2), (2L, 4L, 5), (5L, 6L, 2)))
  }

  private def levRef(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var diag = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = cur
      }
    }
    dp(b.length)
  }

  test("passjoin matches the quadratic edit-distance definition (randomized)") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
    def mutate(s: String, e: Int): String = (1 to e).foldLeft(s) { (t, _) =>
      val p = rnd.nextInt(t.length)
      rnd.nextInt(3) match {
        case 0 => t.take(p) + t.drop(p + 1)                       // delete
        case 1 => t.take(p) + (if (rnd.nextBoolean()) "a" else "b") + t.drop(p) // insert
        case _ => t.take(p) + (if (t(p) == 'a') "b" else "a") + t.drop(p + 1)   // substitute
      }
    }
    val bases = (0 until 10).map(_ => randStr(20 + rnd.nextInt(40)))
    val corpus = (bases ++ bases.map(s => mutate(s, rnd.nextInt(7))))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val expected = (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus
      if ia < ib && levRef(sa, sb) <= 4
    } yield (ia, ib, levRef(sa, sb))).toSet
    val got = Dedup.editPassJoinPairs(docs(corpus: _*), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got == expected)
    // Same ground truth for the length-block path: pins the lossless
    // char-histogram L1 prune in levenshteinVerify on random data (the
    // 2-letter alphabet keeps the bound maximally active).
    val gotBlocks = Dedup.editDistancePairs(docs(corpus: _*), maxDist = 4,
        bucketWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(gotBlocks == expected)
  }

  test("minhash signature is order-insensitive (set semantics)") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "gamma alpha beta")
    val sigs = Dedup.minhashSignatures(d).collect()
    assert(sigs.length == 2)
    val a = sigs.find(_.getLong(0) == 1L).get
    val b = sigs.find(_.getLong(0) == 2L).get
    (1 to 8).foreach(i => assert(a.getLong(i) == b.getLong(i)))
  }

  test("simhash: identical docs get identical signatures; near docs are close") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> (1 to 50).map(i => s"zzz$i").mkString(" "))
    val sigs = Dedup.simhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashNearPairs(Dedup.simhashSignatures(d)).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getAs[Int]("hamming") == 0))
  }

  test("dropNearDuplicates keeps the min-id member of each near-dup pair") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"word$i").mkString(" ") + " extra token"
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val kept = Dedup.dropNearDuplicates(d, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("cluster-complete near-dedup collapses hub clusters the greedy pass keeps") {
    // 1 and 2 are NOT near-dups of each other, but both near-dup hub 5:
    // greedy (drop any id_b) keeps {1, 2}; transitive closure keeps {1}
    val doc1 = (1 to 40).map(i => s"word$i").mkString(" ")
    val doc2 = (41 to 80).map(i => s"word$i").mkString(" ")
    val hub5 = (11 to 70).map(i => s"word$i").mkString(" ")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> doc1, 2L -> doc2, 5L -> hub5, 9L -> other)
    // rowsPerBand=1: single-hash bands catch the ~0.43-jaccard hub edges
    val pairs = Dedup.minHashLshPairs(d, threshold = 0.35, rowsPerBand = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 5L), (2L, 5L)), s"expected hub edges, got $pairs")
    val greedy = Dedup.dropNearDuplicates(d, 0.35, rowsPerBand = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val connected = Dedup.dropNearDuplicatesConnected(d, 0.35, rowsPerBand = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 2L, 9L))
    assert(connected == Set(1L, 9L), "one representative per transitive cluster")
    // keep-best: hub 5 is the LONGEST member (60 words vs 40), so the
    // best-scoring policy keeps it where min-id kept 1
    val best = Dedup.dropNearDuplicatesConnectedBest(
        d.withColumn("len", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))),
        0.35, scoreCol = "len", rowsPerBand = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(5L, 9L), s"longest member should represent: $best")
  }

  test("ngram jaccard: shared character grams score high") {
    val d = docs(1L -> "abcdefghij", 2L -> "abcdefghiX", 3L -> "zzzzzzzzzz")
    val pairs = Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("lsh candidate generation is a band equi-join, not a cross product") {
    val d = docs((1L to 20L).map(i => i -> s"completely unique text number $i ${"x" * i.toInt}"): _*)
    val plan = Dedup.lshCandidates(Dedup.minhashSignatures(d))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("one-pass exact dedup equals the agg+semi-join form") {
    import spark.implicits._
    val docs = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other text"),
      (5L, "HELLO world."), (9L, "other  text")).toDF("doc_id", "text")
    val a = Dedup.dropExactDuplicates(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Dedup.dropExactDuplicatesOnePass(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a == Set(1L, 3L))
  }

  test("normalize is idempotent and matches the reference implementation") {
    import spark.implicits._
    // the md5(normalize(text)) content key underpins every exact-dedup
    // operator AND the DuckDB oracle SQL — normalize must be a projection
    // (idempotent) and match a plain-Scala reference exactly
    def ref(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val rnd = new scala.util.Random(11)
    val alphabet = "abcXYZ 012!@#$%^&*()_+ü\n\t.,;:'\"-"
    val samples = (1 to 200).map(_ =>
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = samples.toDF("s")
      .select(Dedup.normalize(col("s")).as("once"),
        Dedup.normalize(Dedup.normalize(col("s"))).as("twice"))
      .collect()
    got.zip(samples).foreach { case (r, s) =>
      assert(r.getString(0) == r.getString(1), s"not idempotent on ${s.take(40)}")
      assert(r.getString(0) == ref(s), s"diverges from reference on ${s.take(40)}")
    }
  }

  test("streaming dedup drops re-arrivals within the watermark, readmits after") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = Dedup.streamingDropDuplicates(
      input.toDS().toDF("doc_id", "text", "ts"), "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    try {
      // batch 1: two byte-different spellings of the same content + one unique
      input.addData(
        (1L, "Hello, World!", ts("2024-01-01 10:00:00")),
        (2L, "hello   world", ts("2024-01-01 10:01:00")),
        (3L, "something else", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // batch 2: replay inside the watermark window -> dropped
      input.addData((4L, "HELLO WORLD", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // batch 3: same content, late enough to advance the watermark, but the
      // key's state (first-seen + 10min) is still live when this batch runs
      input.addData((5L, "hello world", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // batch 4: state expired (watermark moved past 10:00 + 10min) -> readmit
      input.addData((6L, "hello world", ts("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sdedup_out")
        .collect().map(_.getLong(0)).toSet
      assert(got.intersect(Set(1L, 2L)).size == 1, s"one of the batch-1 dups survives: $got")
      assert(got.contains(3L) && got.contains(6L), s"unique + readmitted: $got")
      assert(!got.contains(4L) && !got.contains(5L), s"in-window replays dropped: $got")
    } finally q.stop()
  }

  test("cross-doc shingle dup stats: shared spans flagged, unique docs clean") {
    import spark.implicits._
    // docs 1 and 2 share the leading 6 words (two distinct 5-gram
    // shingles); doc 3 is entirely unique; doc 4 is too short to shingle
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six apple banana cherry"),
      (3L, "alpha beta gamma delta epsilon zeta eta"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.shingleDupStats(docs, n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // doc 1: 5 shingles, 2 shared with doc 2
    assert(out(1L) == ((5L, 2L, 0.4, true)))
    assert(out(2L) == ((5L, 2L, 0.4, true)))
    assert(out(3L) == ((3L, 0L, 0.0, true)))
    assert(!out.contains(4L)) // < n words: no shingles, no row
    // near-identical docs cross the drop threshold
    val clones = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k")).toDF("doc_id", "text")
    val dupped = Dedup.shingleDupStats(clones, n = 5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(dupped == Map(1L -> false, 2L -> false)) // 5/6 dup > 0.7: drop both
  }

  test("hot-bucket guard bounds degenerate LSH buckets, keeps normal pairs") {
    // 30 identical boilerplate docs (every band bucket has 30 members)
    // plus one genuine near-dup pair in a separate vocabulary
    val boiler = (1 to 30).map(i => i.toLong -> (1 to 20).map(j => s"b$j").mkString(" "))
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"word$i").mkString(" ") + " extra token"
    val d = docs(boiler :+ (100L -> base) :+ (101L -> nearDup): _*)
    val sigs = Dedup.minhashSignatures(d)
    val unguarded = Dedup.lshCandidates(sigs).count()
    val guarded = Dedup.lshCandidates(sigs, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded >= 30L * 29 / 2, s"boilerplate cluster pairs expected: $unguarded")
    // the 30-member buckets are dropped; the 2-member bucket survives
    assert(guarded == Set((100L, 101L)), s"guarded candidates: $guarded")
    // same guard on the simhash chunk join
    val sPairs = Dedup.simhashNearPairs(Dedup.simhashSignatures(d), maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sPairs.contains((100L, 101L)) &&
      !sPairs.exists { case (a, b) => a <= 30 && b <= 30 }, s"simhash guarded: $sPairs")
  }

  test("within-doc span trimming keeps first occurrences in order") {
    // spanWords=2: doc 1 = [a b][c d][a b][e f] -> drop the repeat;
    // doc 2 has no repeats; the repeat ACROSS docs 1 and 2 is untouched
    val d = docs(
      1L -> "a b c d a b e f",
      2L -> "a b x y")
    val out = Dedup.dropRepeatedSpansWithinDoc(d, spanWords = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, 1L, "a b c d e f")))
    assert(out(2L) == ((2L, 0L, "a b x y")))
  }

  test("cross-corpus decontamination flags corpus docs near-duplicating probes") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"word$i").mkString(" ") + " extra token"
    val clean = (1 to 40).map(i => s"other$i").mkString(" ")
    val corpus = docs(1L -> nearDup, 2L -> clean)
    val probes = docs(10L -> base)
    val pairs = Dedup.crossCorpusPairs(corpus, probes, threshold = 0.7).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.9)
    // the probe corpus is never self-paired: identical docs WITHIN the
    // corpus are not flagged unless they also match a probe
    val c2 = docs(1L -> clean, 2L -> clean)
    assert(Dedup.crossCorpusPairs(c2, probes, threshold = 0.7).isEmpty)
    val kept = Dedup.decontaminate(corpus, probes, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("span dedup drops cross-doc repeated spans, keeps the remainder in order") {
    import spark.implicits._
    // spanWords=3: doc 1 = [A][B], doc 2 = [A][C], doc 3 unique,
    // doc 4 repeats its own span twice but shares it with nobody
    val docs = Seq(
      (1L, "one two three unique tail here"),
      (2L, "one two three other words now"),
      (3L, "alpha beta gamma delta"),
      (4L, "rep rep rep rep rep rep")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateSpans(docs, spanWords = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 1L, "unique tail here")))
    assert(out(2L) == ((2L, 1L, "other words now")))
    assert(out(3L) == ((2L, 0L, "alpha beta gamma delta")))
    // within-doc repetition alone (df=1 across docs) is NOT dropped
    assert(out(4L) == ((2L, 0L, "rep rep rep rep rep rep")))
    // a doc whose every span is shared reassembles to the empty string
    val boiler = Seq(
      (1L, "same old words same old words"),
      (2L, "same old words same old words")).toDF("doc_id", "text")
    val all = Dedup.dropDuplicateSpans(boiler, spanWords = 3, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(all == Map(1L -> "", 2L -> ""))
  }

  test("containment catches a short probe inside a long doc where jaccard fails") {
    import spark.implicits._
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq((2L, s"$filler $quote")).toDF("doc_id", "text")
    val probes = Seq((1L, quote)).toDF("doc_id", "text")
    // probe shingles: 2 five-grams, both present in the corpus doc
    val got = Dedup.crossCorpusContainment(corpus, probes, threshold = 0.9, n = 5)
      .collect()
    assert(got.length == 1 && got.head.getDouble(3) == 1.0, s"got ${got.toSeq}")
    // the symmetric jaccard of the same pair is tiny — the asymmetric
    // criterion is the one that flags the contamination
    val j = Dedup.crossCorpusPairs(corpus, probes, threshold = 0.0)
      .collect()
    assert(j.isEmpty || j.head.getDouble(2) < 0.1,
      s"jaccard should vanish for a short probe: ${j.toSeq}")
    // an unrelated probe is not flagged
    val clean = Seq((9L, "one two three four five six")).toDF("doc_id", "text")
    assert(Dedup.crossCorpusContainment(corpus, clean, 0.1, n = 5).collect().isEmpty)
    // the removal pass drops the contaminated doc, keeps the clean one
    val corpus2 = corpus.unionByName(
      Seq((3L, "totally different content " + (1 to 10).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text"))
    val kept = Dedup.decontaminateContainment(corpus2, probes, threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"kept $kept")
  }

  test("bloom-gated containment: identical result, gate visible in the plan") {
    val docs = graft.T.t(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val probes = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("text"))
    val gated = Dedup.crossCorpusContainmentBloom(corpus, probes,
      threshold = 0.6, n = 5)
    // the map-side reduction must actually be planned
    assert(gated.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"), "bloom gate missing from the plan")
    val a = gated.collect().map(_.toSeq).toSet
    val b = Dedup.crossCorpusContainment(corpus, probes, threshold = 0.6, n = 5)
      .collect().map(_.toSeq).toSet
    // no false negatives + exact verify => identical relation
    assert(a == b, s"bloom gate changed the result: ${a.diff(b)} / ${b.diff(a)}")
    assert(a.nonEmpty, "slice produced no pairs — tests nothing")
  }

  test("bloom size guard fails loudly instead of materializing a huge filter") {
    import spark.implicits._
    val corpus = Seq((2L, "a b c d e f g h")).toDF("doc_id", "text")
    val probes = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.crossCorpusContainmentBloom(corpus, probes, threshold = 0.5,
        fpp = 1e-10, maxBloomBytes = 4L)
    }
    assert(e.getMessage.contains("maxBloomBytes"))
  }

  test("source-pair guard fails loudly instead of broadcasting P^2 pairs") {
    import spark.implicits._
    // 4 distinct sources against maxSources=3: the require must fire at
    // pair-enumeration time, before any pair join is built.
    val docs = (1 to 4).map(i => (s"src$i", "a b c d e f"))
      .toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.sourceBottomKSim(docs, maxSources = 3)
    }
    assert(e.getMessage.contains("maxSources"))
  }

  test("streaming incremental dedup: each batch sees every earlier batch's ledger") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ledger = java.nio.file.Files.createTempDirectory("graft-sledger")
      .resolve("ledger").toString
    val survivors = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        survivors ++= Dedup.dedupBatchAgainstLedger(batch, ledger)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    try {
      in.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "ALPHA beta"))
      q.processAllAvailable() // batch 1: 3 is an in-batch dup of 1
      in.addData((11L, "gamma delta"), (12L, "epsilon zeta"))
      q.processAllAvailable() // batch 2: 11 was seen by batch 1's ledger
      in.addData((21L, "epsilon zeta"), (22L, "alpha beta"))
      q.processAllAvailable() // batch 3: both seen by earlier batches
      assert(survivors.toSet == Set(1L, 2L, 12L), s"survivors $survivors")
    } finally q.stop()
  }

  test("streaming near-dup dedup: signature collisions drop within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, Long, String)]
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val q = in.toDF().toDF("doc_id", "off", "text")
      .withColumn("ts", expr("timestamp_millis(" + base + "L + off * 1000)"))
      .transform(d => Dedup.streamingDropNearDuplicates(d, "ts", "10 minutes"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= batch.select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    try {
      in.addData(
        (1L, 0L, "alpha beta gamma delta"),
        // word REORDER + case + punctuation: same shingle set, certain
        // signature collision — exactly what exact dedup cannot catch
        (2L, 1L, "Delta gamma, BETA alpha!"),
        (3L, 2L, "epsilon zeta eta theta"))
      q.processAllAvailable() // 2 dropped as a near-dup of 1
      in.addData((11L, 3L, "beta alpha delta gamma"), (12L, 4L, "iota kappa"))
      q.processAllAvailable() // 11 collides with batch-1 state
      assert(got.toSet == Set(1L, 3L, 12L), s"survivors $got")
    } finally q.stop()
  }

  test("streaming near-dup survivors equal the batch ledger replay") {
    import spark.implicits._
    // Same corpus as the streaming case above: the batch first-arrival-
    // per-signature rule (the `streaming_sig_dedup` oracle query's
    // shape) must reproduce the streaming survivors exactly — this is
    // the bridge that lets the DuckDB oracle gate the streaming kernel.
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "Delta gamma, BETA alpha!"), (3L, "epsilon zeta eta theta"),
      (11L, "beta alpha delta gamma"), (12L, "iota kappa"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sig_key")).orderBy(col("doc_id"))
    val kept = docs
      .select(col("doc_id"), Dedup.signatureKey(col("text"), 8).as("sig_key"))
      .withColumn("kept", row_number().over(w) === lit(1))
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 12L)) // streaming survivors, same data
  }

  test("signatureKey: set semantics, empty-text fallback distinct") {
    import spark.implicits._
    val keys = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta ALPHA alpha"),
      (3L, "alpha beta delta"), (4L, "..."), (5L, "!!!"), (6L, "???  x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.signatureKey(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == keys(2L), "same shingle set must collide")
    assert(keys(1L) != keys(3L), "different sets must not collide")
    assert(keys(4L) == keys(5L), "empty-normalizing docs share the empty key")
    assert(keys(4L) != keys(6L), "empty fallback must not swallow non-empty docs")
  }

  test("incremental dedup: ledger drops seen content, batch keeps min-id") {
    import spark.implicits._
    val old = Seq((0L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "ALPHA beta"),   // seen in ledger (normalization folds case)
      (13L, "epsilon zeta"), // new
      (15L, "epsilon zeta"), // in-batch dup of 13 -> dropped
      (17L, "eta theta")     // new
    ).toDF("doc_id", "text")
    val kept = Dedup.dropSeenDocs(batch, Dedup.fingerprintLedger(old))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(13L, 17L), s"kept $kept")
    // an empty ledger degrades to plain in-batch exact dedup
    val emptyLedger = Dedup.fingerprintLedger(old.filter(col("doc_id") < 0))
    val kept2 = Dedup.dropSeenDocs(batch, emptyLedger)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(11L, 13L, 17L), s"kept $kept2")
  }

  test("repeatedSubstringRuns: maximal cross-doc runs at exact positions") {
    import spark.implicits._
    // docs 1 and 2 share the 6-word phrase at word offsets 2 and 0;
    // doc 3 is clean. With w=4, a 6-word repeat = a run of 3 shingles.
    val shared = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared zeta eta theta iota"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSubstringRuns(docs, w = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("start_word"),
        r.getAs[Long]("len_words"), r.getAs[Long]("n_shingles")))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1L, 2, 6L, 3L), (2L, 0, 6L, 3L)), got.toSeq)
    // a within-doc repeat is found too (any repeat double-counts loss)
    val loop = Seq((9L, "x y z w junk filler x y z w")).toDF("doc_id", "text")
    val self = Dedup.repeatedSubstringRuns(loop, w = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(self.toSeq == Seq((0, 4L), (6, 4L)), self.toSeq)
    // partition invariance
    val again = Dedup.repeatedSubstringRuns(docs.repartition(5), w = 4)
      .collect().map(_.toSeq).toSet
    assert(again ==
      Dedup.repeatedSubstringRuns(docs, w = 4).collect().map(_.toSeq).toSet)
  }

  test("prefix-filter join equals brute-force word Jaccard (lossless filter)") {
    import spark.implicits._
    // 30 docs over a tiny shared vocabulary — dense enough that pairs at
    // several thresholds exist and the prefix filter has real work to do
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val d = docs((0 until 30).map { i =>
      val words = vocab.indices.filter(j => (i + j) % 3 != 0 || j % (i % 4 + 1) == 0)
        .map(vocab)
      (i.toLong, words.mkString(" "))
    }: _*)
    def brute(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
      val sets = d.collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSet).toMap
      (for {
        a <- sets.keys; b <- sets.keys if a < b
        c = (sets(a) & sets(b)).size.toLong
        u = (sets(a) | sets(b)).size.toLong
        if c * den >= num * u
      } yield (a, b, c, u)).toSet
    }
    for ((num, den) <- Seq((1, 2), (7, 10), (9, 10))) {
      val got = Dedup.prefixFilterJaccardPairs(d, num, den)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == brute(num, den), s"threshold $num/$den")
    }
    // partition invariance
    val a = Dedup.prefixFilterJaccardPairs(d.repartition(7), 1, 2)
      .collect().map(_.toSeq).toSet
    val b = Dedup.prefixFilterJaccardPairs(d, 1, 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content") {
    val oldSnap = docs(
      1L -> "stable doc",
      2L -> "doomed doc",
      3L -> "old wording here",
      4L -> "Punctuation, only!")
    val newSnap = docs(
      1L -> "stable doc",
      3L -> "new wording here",
      4L -> "punctuation only",      // same after normalization -> unchanged
      5L -> "fresh doc")
    val got = Dedup.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"), got.toString)
  }

  test("cdcChunkProfile: divisor-1 degenerates to token sharing, zeros kept") {
    import spark.implicits._
    // divisor 1 -> every token is a boundary -> single-token chunks, so
    // sharing is exactly cross-doc token overlap (fully predictable)
    val docs = Seq((1L, "a b"), (2L, "c a"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkProfile(docs, divisor = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1L, 500000L)),
      2L -> ((2L, 2L, 1L, 500000L)),
      3L -> ((0L, 0L, 0L, 0L))), got.toString)
  }

  test("cdcChunkProfile: identical docs share every chunk, unique doc none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w v u t s"),
      (2L, "x y z w v u t s"),
      (3L, "entirely different words here"))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunkProfile(docs, divisor = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 1 and 2 chunk identically whatever the boundary draw -> all shared
    assert(got(1L)._1 == got(1L)._2 && got(1L)._3 == 1000000L, got.toString)
    assert(got(2L) == got(1L))
    assert(got(3L)._2 == 0L && got(3L)._3 == 0L, got.toString)
    // partition invariance (hash boundaries are content-only)
    val again = Dedup.cdcChunkProfile(docs.repartition(5), divisor = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == got)
  }

  test("lineDedup: corpus-frequent sentences drop, document order survives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two. common line. three"),
      (2L, "four. common line. five"),
      (3L, "common line. six"),
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, minOccurrences = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == Map(
      1L -> ((3L, 1L, "one two. three")),
      2L -> ((3L, 1L, "four. five")),
      3L -> ((2L, 1L, "six")),
      4L -> ((0L, 0L, ""))), got.toString)
    // below the occurrence floor nothing drops
    val none = Dedup.lineDedup(docs, minOccurrences = 4)
      .agg(org.apache.spark.sql.functions.sum("n_dropped")).head.getLong(0)
    assert(none == 0L)
  }

  test("dedupTokenImpact: non-canonical duplicate tokens roll up per stratum") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "s1"), (2L, "x", "s1"), (3L, "y z", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dedupTokenImpact(docs, "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got == Map(
      "s1" -> ((2L, 1L, 2L, 1L, 500000L)),
      "s2" -> ((1L, 0L, 2L, 0L, 0L))), got.toString)
  }

  test("lshBandPlanCurve: S-curves match closed form, monotone, recall-ordered") {
    val rows = Dedup.lshBandPlanCurve(spark).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 3 * 19, rows.length.toString)
    // closed form parity: the squaring chain equals 1-(1-s^r)^b within
    // rounding of the micro representation
    rows.foreach { case (b, r, sM, pM) =>
      val s = sM.toDouble / 1e6
      val expect = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      assert(math.abs(pM / 1e6 - expect) < 2e-5,
        s"(b=$b,r=$r,s=$s): got ${pM / 1e6} want $expect")
    }
    // monotone non-decreasing in s within each plan
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, ps) =>
      val ordered = ps.sortBy(_._3).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, c) => a <= c })
    }
    // more bands (same budget) = higher collision probability everywhere
    // strictly inside the grid: p_32x2 >= p_16x4 >= p_8x8 at every s
    val byPlan = rows.groupBy(t => (t._1, t._2))
      .map { case (k, ps) => k -> ps.sortBy(_._3).map(_._4) }
    val Seq(p32, p16, p8) =
      Seq((32, 2), (16, 4), (8, 8)).map(byPlan(_))
    p32.indices.foreach { i =>
      assert(p32(i) >= p16(i) && p16(i) >= p8(i),
        s"recall ordering violated at grid index $i")
    }
  }

  test("exact-substring spans: planted cross-doc duplicate found with exact boundaries") {
    // L = 10; docs 1 and 2 share a 22-char region ("shared boilerplate txt"
    // embedded at different offsets); doc 3 is clean.
    val boiler = "sharedboilerplatetext!" // 22 chars
    val d = docs(
      1L -> s"aaaaaaaaaa${boiler}bbbbbbbbbb",  // boiler at 11..32
      2L -> s"wxyz${boiler}defghijklmnopqrs",  // boiler at 5..26
      3L -> "completely unrelated content here")
    val spans = Dedup.exactSubstringSpans(d, minLen = 10)
      .orderBy(col("doc_id")).collect()
    assert(spans.map(_.getLong(0)).toSet == Set(1L, 2L))
    val s1 = spans.find(_.getLong(0) == 1L).get
    // 22-char shared region, 13 duplicated 10-windows (starts 11..23)
    assert(s1.getAs[Long]("span_start") == 11L, s1)
    assert(s1.getAs[Long]("span_end") == 32L, s1)
    assert(s1.getAs[Long]("span_len") == 22L, s1)
    assert(s1.getAs[Long]("n_windows") == 13L, s1)
    val s2 = spans.find(_.getLong(0) == 2L).get
    assert(s2.getAs[Long]("span_start") == 5L && s2.getAs[Long]("span_len") == 22L, s2)
  }

  test("exact-substring spans: within-doc repetition counts; disjoint runs stay separate") {
    // One doc repeating a 12-char phrase twice with a unique gap: both
    // occurrences are duplicated windows, merged into TWO runs (gap > L).
    val p = "repeatedbit!" // 12 chars
    val d = docs(4L -> s"$p--unique-middle-padding--$p")
    val spans = Dedup.exactSubstringSpans(d, minLen = 12)
      .orderBy(col("span_start")).collect()
    assert(spans.length == 2, spans.mkString(";"))
    assert(spans(0).getAs[Long]("span_start") == 1L)
    assert(spans(0).getAs[Long]("span_len") == 12L)
    assert(spans(1).getAs[Long]("span_len") == 12L)
  }

  test("exact-substring spans + removal: brute-force differential on random corpora") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val L = 4 + rnd.nextInt(4)
      val docsSeq = (1 to 2 + rnd.nextInt(4)).map { i =>
        val len = rnd.nextInt(40)
        (i.toLong,
          (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }
      // reference implementation: global window counts over a tiny
      // alphabet (duplicates abound), covered starts per doc, runs
      // merged at gap > L, coverage removal by position set
      val counts = docsSeq
        .flatMap { case (_, t) =>
          (0 to t.length - L).map(s => t.substring(s, s + L)) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val expSpans = docsSeq.flatMap { case (id, t) =>
        val starts = (1 to t.length - L + 1)
          .filter(s => counts(t.substring(s - 1, s - 1 + L)) >= 2)
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[Int]]
        starts.foreach { s =>
          if (runs.nonEmpty && s <= runs.last.last + L) runs.last += s
          else runs += scala.collection.mutable.ArrayBuffer(s)
        }
        runs.map(r => (id, r.head.toLong, (r.last + L - 1).toLong,
          (r.last + L - r.head).toLong, r.size.toLong))
      }.toSet
      val df = docs(docsSeq: _*)
      val gotSpans = Dedup.exactSubstringSpans(df, minLen = L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(gotSpans == expSpans, s"L=$L docs=$docsSeq")
      val expKept = docsSeq.map { case (id, t) =>
        val covered = expSpans.collect {
          case (`id`, s, e, _, _) => (s.toInt to e.toInt) }.flatten.toSet
        id -> t.zipWithIndex.collect {
          case (c, i) if !covered.contains(i + 1) => c }.mkString
      }.toMap
      val gotKept = Dedup.removeDuplicateSubstrings(df, minLen = L)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[String]("kept_text"), r.getAs[Long]("removed_chars"))).toMap
      docsSeq.foreach { case (id, t) =>
        assert(gotKept(id)._1 == expKept(id), s"L=$L doc=$id text=$t")
        assert(gotKept(id)._2 == t.length - expKept(id).length)
      }
    }
  }

  test("exact-substring removal: survivors stitch in order; full-dup docs empty; clean docs pass through") {
    val boiler = "sharedboilerplatetext!" // 22 chars, L = 10
    val d = docs(
      1L -> s"aaaaaaaaaa${boiler}bbbbbbbbbb",   // keep prefix+suffix
      2L -> s"wxyz${boiler}defghijklmnopqrs",   // keep 4 + 16 chars
      3L -> "completely unrelated clean doc",   // untouched
      4L -> boiler)                             // fully covered -> ""
    val got = Dedup.removeDuplicateSubstrings(d, minLen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("removed_chars"),
          r.getAs[Long]("kept_chars"), r.getAs[String]("kept_text")))).toMap
    assert(got(1L) === ((42L, 22L, 20L, "aaaaaaaaaa" + "bbbbbbbbbb")))
    assert(got(2L) === ((42L, 22L, 20L, "wxyz" + "defghijklmnopqrs")))
    assert(got(3L)._2 == 0L && got(3L)._4 == "completely unrelated clean doc")
    assert(got(4L) === ((22L, 22L, 0L, "")))
    // reassembly law: kept_text length == kept_chars, everywhere
    got.values.foreach { case (_, _, kc, kt) => assert(kt.length == kc) }
  }

  test("exact-substring contamination: eval coverage against the train side only") {
    val leak = "this exact benchmark sentence leaked verbatim" // 45 chars
    val evalDocs = docs(
      1L -> s"prefix--${leak}--suffix-material",
      2L -> "a fully novel eval item nothing shared",
      3L -> "shrt") // shorter than L -> zero windows, zero coverage
    val train = docs(
      100L -> s"some train doc containing ${leak} inside it",
      101L -> "a fully novel eval item nothing shared PLUS MORE") // shares a 38-char prefix with eval 2? (L=20 windows)
    val got = Dedup.exactSubstringContamination(evalDocs, train, minLen = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("covered_chars"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("coverage_micro")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "every eval doc gets a row")
    assert(got(1L)._1 == 1L && got(1L)._2 == 45L,
      s"the 45-char leak must surface exactly: ${got(1L)}")
    // eval 2 IS a prefix of train 101 -> its shared 38-char region covers
    assert(got(2L)._2 == 38L, s"${got(2L)}")
    assert(got(3L) == ((0L, 0L, 4L, 0L)), "sub-L docs have zero coverage")
    // eval-only duplication must NOT count (eval 1 vs eval 1 self)
    val selfOnly = Dedup.exactSubstringContamination(
      docs(5L -> (leak + "###" + leak)), docs(9L -> "unrelated train text"),
      minLen = 20).collect()
    assert(selfOnly.head.getAs[Long]("covered_chars") == 0L,
      "within-eval repetition is not train contamination")
    // the bloom-gated plan is result-EXACT (false positives scrubbed by
    // the hash equi-join): identical rows to the ungated form
    val gated = Dedup.exactSubstringContamination(evalDocs, train,
      minLen = 20, bloomGate = true)
      .collect().map(_.toSeq).toSet
    assert(gated == Dedup.exactSubstringContamination(evalDocs, train,
      minLen = 20).collect().map(_.toSeq).toSet,
      "bloom gate must be value-neutral")
  }

  test("token-window ExactSubstr: word-unit spans from a planted shared phrase") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val d = docs(
      1L -> s"pre1 pre2 $shared post1", // shared at token 3..9 of 10
      2L -> s"$shared tail1 tail2",     // shared at token 1..7 of 9
      3L -> "too few words here")       // < 6 tokens of any dup
    val spans = Dedup.exactSubstringSpansTokens(d, minLen = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
          r.getAs[Long]("span_len"), r.getAs[Long]("n_windows")))).toMap
    // 6-token windows inside the 7-token shared phrase: starts 3,4 in
    // doc 1 and 1,2 in doc 2 — each merges to ONE word-unit span
    assert(spans(1L) == ((3L, 9L, 7L, 2L)), spans.toString)
    assert(spans(2L) == ((1L, 7L, 7L, 2L)), spans.toString)
    assert(!spans.contains(3L), "no duplicated windows -> no span row")
  }

  test("token-window contamination: word-unit coverage against the train side only") {
    val leak = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val evalDocs = docs(
      1L -> s"pre1 pre2 $leak post1",          // covered tokens 3..10 of 11
      2L -> "a fully novel eval item",          // 5 tokens, < L -> no windows
      3L -> s"$leak")                           // fully covered (8 of 8)
    val train = docs(
      100L -> s"train filler $leak more filler",
      101L -> "other train material entirely")
    val got = Dedup.exactSubstringContaminationTokens(evalDocs, train,
        minLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("covered_tokens"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("coverage_micro")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "every eval doc gets a row")
    assert(got(1L) == ((1L, 8L, 11L, 1000000L * 8 / 11)), got.toString)
    assert(got(2L) == ((0L, 0L, 5L, 0L)), "sub-L docs report zero coverage")
    assert(got(3L) == ((1L, 8L, 8L, 1000000L)), "full-doc leak = unit coverage")
    // within-eval repetition is not train contamination
    val selfOnly = Dedup.exactSubstringContaminationTokens(
      docs(5L -> (leak + " filler " + leak)),
      docs(9L -> "unrelated train text entirely here"), minLen = 8).collect()
    assert(selfOnly.head.getAs[Long]("covered_tokens") == 0L)
  }

  test("substring window ledger: snapshot appends replace the train scan, probe survives train deletion") {
    val leak = "this exact benchmark sentence leaked verbatim" // 45 chars
    val evalDocs = docs(
      1L -> s"prefix--${leak}--suffix-material",
      2L -> "a fully novel eval item nothing shared")
    val snapA = docs(100L -> s"some train doc containing ${leak} inside it")
    val snapB = docs(101L -> "a fully novel eval item nothing shared PLUS MORE")
    // reference: the one-shot scan over both snapshots together
    val scan = Dedup.exactSubstringContamination(
        evalDocs, snapA.unionByName(snapB), minLen = 20)
      .collect().map(_.toSeq).toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft-wled").toString
    val ledgerPath = s"$tmp/ledger"
    def rmr(p: String): Unit = {
      val f = new java.io.File(p)
      Option(f.listFiles()).foreach(_.foreach(c => rmr(c.getPath)))
      f.delete(); ()
    }
    // snapshot 1: write, ledger-append from the PARQUET-backed frame,
    // then DELETE the snapshot — if any later step re-read the train
    // corpus it would fail loudly on the missing files
    snapA.write.parquet(s"$tmp/snapA")
    Dedup.appendSubstringLedger(
      spark.read.parquet(s"$tmp/snapA"), ledgerPath, minLen = 20)
    rmr(s"$tmp/snapA")
    // snapshot 2 likewise: the append scans ONLY the new snapshot
    snapB.write.parquet(s"$tmp/snapB")
    Dedup.appendSubstringLedger(
      spark.read.parquet(s"$tmp/snapB"), ledgerPath, minLen = 20)
    rmr(s"$tmp/snapB")
    // probe with BOTH train snapshots gone: the ledger alone carries
    // the decon — value-identical to the scan form
    val got = Dedup.exactSubstringContaminationLedger(
        evalDocs, spark.read.parquet(ledgerPath), minLen = 20)
      .collect().map(_.toSeq).toSet
    assert(got == scan, s"ledger probe diverged from the train scan:\n$got\nvs\n$scan")
    assert(got.exists(r => r.head == 1L && r(2) == 45L),
      "the 45-char leak must surface through the ledger")
    // crash-retry idempotence: a duplicate snapshot append is harmless
    // (the probe semi-joins — multiplicity-invariant)
    val again = docs(101L -> "a fully novel eval item nothing shared PLUS MORE")
    Dedup.appendSubstringLedger(again, ledgerPath, minLen = 20)
    val got2 = Dedup.exactSubstringContaminationLedger(
        evalDocs, spark.read.parquet(ledgerPath), minLen = 20)
      .collect().map(_.toSeq).toSet
    assert(got2 == scan, "duplicate ledger rows must not change coverage")
  }

  test("exact-substring spans: abutting duplicated windows merge into one maximal run") {
    // docs 5/6 share a 40-char region; every interior window duplicates,
    // so coverage merges into ONE span of exactly 40 chars.
    val shared = "0123456789" * 4
    val d = docs(5L -> s"xx${shared}yy", 6L -> s"zzzzz${shared}wwww")
    val spans = Dedup.exactSubstringSpans(d, minLen = 10).collect()
    // within the shared region the 10-char windows also self-repeat
    // (period 10), but coverage is still one contiguous 40-char run
    val s5 = spans.filter(_.getLong(0) == 5L)
    assert(s5.length == 1, s5.mkString(";"))
    assert(s5.head.getAs[Long]("span_start") == 3L, s5.head)
    assert(s5.head.getAs[Long]("span_len") == 40L, s5.head)
  }

  test("bBitMinhash: sequential replay, k_bbit >= k_full, identical docs saturate") {
    import spark.implicits._
    val texts = Map(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta", // exact dup of 1
      3L -> "alpha beta gamma delta other words here",
      4L -> "omega sigma kappa tau rho nu",
      5L -> "omega sigma kappa something else entirely",
      6L -> "unrelated vocabulary in this document")
    val d = texts.toSeq.map { case (i, t) => (i, t) }.toDF("doc_id", "text")
    val pairs = (for (a <- texts.keys; b <- texts.keys if a < b)
      yield (a, b)).toSeq.toDF("id_a", "id_b")
    val k = 16; val b = 2
    val got = Dedup.bBitMinhashEstimate(d, pairs, b, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got.size == 15)
    // a full-width collision is a b-bit collision; never the reverse
    assert(got.values.forall(v => v._2 >= v._1), got.toString)
    // exact duplicates: every perm collides, all three readouts saturate
    assert(got((1L, 2L)) == (16L, 16L, 1000000L, 1000000L, 1000000L))
    // sequential replay of hashStr -> min -> collision -> estimator
    def h(seed: Int, s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$s".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    def shingles(t: String): Set[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSet
    def sig(t: String): Seq[Long] =
      (0 until k).map(i => shingles(t).map(w => h(i, w)).min)
    for (((a, bb), (kf, kb, mh, be, jm)) <- got) {
      val (sa, sb) = (sig(texts(a)), sig(texts(bb)))
      val kfR = sa.zip(sb).count { case (x, y) => x == y }.toLong
      val kbR = sa.zip(sb).count { case (x, y) => x % 4 == y % 4 }.toLong
      assert((kf, kb) == (kfR, kbR), s"pair ($a,$bb)")
      assert(mh == 1000000L * kfR / k)
      assert(be == (if (4 * kbR <= k) 0L
        else 1000000L * (4 * kbR - k) / (k * 3)))
      val (ga, gb) = (shingles(texts(a)), shingles(texts(bb)))
      val inter = (ga & gb).size.toLong
      assert(jm == 1000000L * inter / (ga.size + gb.size - inter))
    }
    // partition invariance
    val again = Dedup.bBitMinhashEstimate(d.repartition(7), pairs, b, k)
      .collect().map(_.toSeq).toSet
    assert(again == Dedup.bBitMinhashEstimate(d, pairs, b, k)
      .collect().map(_.toSeq).toSet)
  }
}
