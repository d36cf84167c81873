package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    import spark.implicits._
    val d = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)).toDF("a", "b", "expect")
    val got = d.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expect")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k ranks by similarity with id tie-break") {
    val corpus = emb(
      1L -> Seq(1f, 0f),
      2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0f, 1f),
      4L -> Seq(0.95f, 0.05f))
    val got = Similarity.bruteForceTopK(
      emb(1L -> Seq(1f, 0f)), corpus, k = 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(got.toSeq.sortBy(_._2) == Seq((4L, 1), (2L, 2)))
  }

  test("lsh top-k achieves high recall vs brute force on real embeddings") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(queries, e, k = 5, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // 4 planes, multi-probe: ~5/16 of the corpus probed
    assert(recall > 0.35, s"lsh recall $recall too low")
    assert(lsh.size <= brute.size)
  }

  test("near-dup pairs: threshold filters and id_a < id_b") {
    val d = emb(1L -> Seq(1f, 0f), 2L -> Seq(0.99f, 0.01f), 3L -> Seq(0f, 1f))
    val pairs = Similarity.nearDupPairs(d, threshold = 0.9, blockByBucket = false).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("bucket-blocked near-dup pairs are a high-recall subset of brute force") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.nearDupPairs(e, threshold = 0.3, blockByBucket = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1 hyperplane: P(same bucket) = 1 - θ/π ≈ 0.6 at cosine 0.3
    val blocked = Similarity.nearDupPairs(e, threshold = 0.3,
        blockByBucket = true, nPlanes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute))
    if (brute.nonEmpty) {
      val recall = blocked.size.toDouble / brute.size
      assert(recall > 0.3, s"blocked recall $recall")
    }
  }

  test("ivf top-k: assignment + probing recovers most brute-force neighbors") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every=100 → 5 cells over the 500 sf0.001 vectors. DuckDB-checked
    // ground truth: recall 0.76 at nProbe=3, 0.94 at nProbe=4.
    val ivf3 = Similarity.ivfTopK(queries, e, k = 5, nProbe = 3, centroidEvery = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf4 = Similarity.ivfTopK(queries, e, k = 5, nProbe = 4, centroidEvery = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall3 = (brute & ivf3).size.toDouble / brute.size
    val recall4 = (brute & ivf4).size.toDouble / brute.size
    assert(recall4 >= recall3, "more probes must not lose recall")
    assert(recall4 > 0.85, s"ivf recall $recall4 too low")
  }

  test("ivf is deterministic: same centroids, same results across runs") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val c1 = Similarity.ivfCentroids(e, 10).map(_._1).toSeq
    assert(c1 == Similarity.ivfCentroids(e, 10).map(_._1).toSeq)
    assert(c1.nonEmpty && c1 == c1.sorted)
    val run = () => Similarity.ivfTopK(e.filter(col("vec_id") < 5), e, k = 3,
      centroidEvery = 10).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(run() == run())
  }

  test("brute-force corpus side is never shuffled (broadcast contract)") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$plan")
  }

  test("k-means training: right shape, lowers inertia, deterministic rerun") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = Similarity.trainIvfCentroids(e, k = 5, iters = 0)
    val trained = Similarity.trainIvfCentroids(e, k = 5, iters = 3)
    assert(trained.length == 5 && trained.forall(_._2.length == 64))
    assert(trained.map(_._1).toSeq == (0L until 5L).toSeq)
    // Lloyd iterations must not worsen the objective
    val i0 = Similarity.ivfInertia(e, seeds)
    val i3 = Similarity.ivfInertia(e, trained)
    assert(i3 <= i0 + 1e-9, s"inertia rose: $i0 -> $i3")
    // content-stable init + fixed partitioning => identical retrain
    val again = Similarity.trainIvfCentroids(e, k = 5, iters = 3)
    assert(trained.map(_._2.toSeq).toSeq == again.map(_._2.toSeq).toSeq)
  }

  test("micro k-means: integer centroids, PARTITION-INVARIANT retrain") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Similarity.trainIvfCentroidsMicro(e.repartition(1), k = 5, iters = 3)
    val b = Similarity.trainIvfCentroidsMicro(e.repartition(13), k = 5, iters = 3)
    assert(a.length == 5 && a.forall(_._2.length == 64))
    assert(a.map(_._1).toSeq == (0L until 5L).toSeq)
    // the property the float path cannot offer: layout never changes the
    // trained artifact (integer sums are order-independent)
    assert(a.map(_._2.toSeq).toSeq == b.map(_._2.toSeq).toSeq)
    // micro coordinates are the quantized means: |x| stays in the 1e9
    // offset envelope for this corpus
    assert(a.forall(_._2.forall(v => math.abs(v) < 1000000000L)))
  }

  test("micro-trained centroids drive ivfTopKWithMicro at useful recall") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.trainIvfCentroidsMicro(e, k = 5, iters = 3)
    val ivf = Similarity.ivfTopKWithMicro(queries, e, cents, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"micro trained-ivf recall $recall too low")
  }

  test("trained centroids drive ivfTopKWith at useful recall") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(queries, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.trainIvfCentroids(e, k = 5, iters = 3)
    val ivf = Similarity.ivfTopKWith(queries, e, cents, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"trained-ivf recall $recall too low")
  }

  test("ivf plan stays O(1) in centroid count (reference-object index)") {
    import spark.implicits._
    val dim = 8
    val e = (0L until 2000L)
      .map(i => (i, Array.tabulate(dim)(j => ((i * 31 + j) % 17).toFloat - 8f)))
      .toDF("vec_id", "embedding")
    // 2000 centroids: the per-element lit() formulation this replaced blew
    // past plan/codegen limits here; the IvfIndex form must stay compact.
    val out = Similarity.ivfTopK(e.filter(col("vec_id") < 3), e, k = 3,
      centroidEvery = 1, nProbe = 2)
    val planLen = out.queryExecution.executedPlan.toString.length
    assert(planLen < 100 * 1000, s"plan grew with centroid count: $planLen chars")
    assert(out.count() > 0)
  }

  test("ivf centroid guard fails loudly on an unbounded centroid set") {
    import spark.implicits._
    val e = (0L until 300L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfCentroids(e, every = 1, maxCentroids = 100)
    }
    assert(ex.getMessage.contains("maxCentroids"))
    // within the bound: all centroids collected, deterministic order
    assert(Similarity.ivfCentroids(e, every = 10).map(_._1).toSeq ==
      (0L until 300L by 10).toSeq)
  }

  test("int8 quantization: codes in range, roundtrip error <= scale/2") {
    val vecs = emb(
      1L -> Seq(0.5f, -1.0f, 0.25f, 0.0f),
      2L -> Seq(0f, 0f, 0f, 0f),
      3L -> Seq(127f, -64f, 1f, 0.5f))
    val q = Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    // the max-magnitude element maps to +/-127; zero vector -> scale 0
    assert(q(1L)._2.contains(-127) && q(1L)._2.forall(c => c.abs <= 127))
    assert(q(2L) == ((0.0, Seq(0, 0, 0, 0))))
    assert(q(3L)._2.head == 127)
    // reconstruction error bounded by scale/2 per element
    val rt = Similarity.dequantizeInt8(Similarity.quantizeInt8(vecs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    orig.foreach { case (id, v) =>
      val scale = q(id)._1
      v.zip(rt(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-6, s"vec $id: $a vs $b")
      }
    }
  }

  test("contrastive mining: exact positive, deterministic panel negatives") {
    def unit(dir: Int): Seq[Float] = Seq.tabulate(8)(i => if (i == dir) 1f else 0f)
    val corpus = emb((1L -> Seq(1f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f)) +:
      (2L -> Seq(1f, 0.12f, 0f, 0f, 0f, 0f, 0f, 0f)) +:
      (10L to 30L).map(i => i -> unit((i % 6).toInt + 2)): _*)
    val out = Similarity.mineContrastivePairs(
      corpus.filter(col("vec_id") === 1L), corpus, negatives = 3, nBuckets = 16)
      .collect()
    val pos = out.filter(_.getString(3) == "positive")
    assert(pos.length == 1 && pos.head.getLong(1) == 2L,
      s"positive must be the true nearest neighbour: ${pos.toSeq}")
    val negs = out.filter(_.getString(3) == "negative")
    assert(negs.length == 3 && negs.forall(_.getLong(1) != 1L))
    // deterministic: identical output across partitionings
    val again = Similarity.mineContrastivePairs(
      corpus.filter(col("vec_id") === 1L), corpus.repartition(5),
      negatives = 3, nBuckets = 16).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("semantic dedup keeps one representative per clone group") {
    // three exact-clone groups in well-separated directions + singletons
    def unit(dir: Int): Seq[Float] = Seq.tabulate(8)(i => if (i == dir) 1f else 0f)
    val rows =
      Seq(1L, 10L, 20L).map(_ -> unit(0)) ++   // clone group A
      Seq(2L, 11L).map(_ -> unit(1)) ++        // clone group B
      Seq(3L -> unit(2), 4L -> unit(3))        // singletons
    val kept = Similarity.semanticDedup(emb(rows: _*), threshold = 0.95,
        k = 4, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // identical vectors always share a cell: one survivor per group
    assert(kept == Set(1L, 2L, 3L, 4L), s"survivors: $kept")
  }

  test("semantic dedup closes chains: one survivor per connected group") {
    // chain in one cell: 1 at 0°, 9 at 25°, 5 at 50° (cos 25° ≈ 0.906,
    // cos 50° ≈ 0.64). Edges at threshold 0.9: (1,9) and (9,5) only.
    // Keep-one-per-group semantics keeps {1}; the old transitive-drop
    // rule would keep 5 too (its only direct match, 9, has a larger id).
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val rows = emb(1L -> at(0), 9L -> at(25), 5L -> at(50))
    val cents = Array(0L -> Array(1f, 0f))
    val kept = Similarity.semanticDedupWith(rows, cents, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"survivors: $kept")
  }

  test("semantic dedup maxCellSize cap excludes oversized cells from pairing") {
    def unit(dir: Int): Seq[Float] = Seq.tabulate(4)(i => if (i == dir) 1f else 0f)
    val rows = emb(Seq(1L, 2L, 3L).map(_ -> unit(0)) :+ (4L -> unit(1)): _*)
    val cents = Array(0L -> unit(0).toArray, 1L -> unit(1).toArray)
    // uncapped: the clone cell of 3 dedups to its min id
    val kept0 = Similarity.semanticDedupWith(rows, cents, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept0 == Set(1L, 4L), s"survivors: $kept0")
    // capped at 2: the 3-member cell skips pair generation — all survive
    // (the documented recall sacrifice; never a quadratic blowup)
    val kept2 = Similarity.semanticDedupWith(rows, cents, threshold = 0.95,
        maxCellSize = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L, 3L, 4L), s"survivors: $kept2")
  }

  test("mean pooling in micro-units: exact values, floor semantics, invariance") {
    import org.apache.spark.sql.functions.expr
    // group 0: 0.25 + (-0.75) + 0.0 over 3 vectors -> sum -500000 micro,
    // floor(-500000/3) = -166667 (floor, not truncation toward zero)
    val rows = emb(
      0L -> Seq(0.25f, 1f), 1L -> Seq(-0.75f, 1f), 2L -> Seq(0f, 1f),
      10L -> Seq(0.5f, -0.5f))
      .withColumn("group_id", expr("vec_id div 4"))
    val out = Similarity.meanPoolMicro(rows, "group_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((0L, 0)) == (-166667L, 3L), s"got ${out((0L, 0))}")
    assert(out((0L, 1)) == (1000000L, 3L))
    assert(out((2L, 0)) == (500000L, 1L))
    assert(out((2L, 1)) == (-500000L, 1L))
    // partition-invariant: integer sums are order-independent
    val again = Similarity.meanPoolMicro(rows.repartition(7), "group_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == again)
  }

  test("sign random projection: one-hot rows recover matrix columns exactly") {
    val dim = 16
    val m = Similarity.signMatrix(outDim = 4, dim = dim)
    // one-hot vector e_i projects to (m(0)(i), m(1)(i), m(2)(i), m(3)(i))
    val oneHots = (0 until dim).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => if (j == i) 1f else 0f))
    }
    val out = Similarity.randomProject(emb(oneHots: _*), outDim = 4, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (0 until dim).foreach { i =>
      assert(out(i.toLong) == (0 until 4).map(j => m(j)(i)),
        s"column $i mismatch")
    }
    // partition-invariant (fixed-order fold per row, no shuffle involved)
    val v = emb(oneHots: _*)
    val a = Similarity.randomProject(v, 4, dim).collect().map(_.toSeq).toSet
    val b = Similarity.randomProject(v.repartition(5), 4, dim)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("clusterPurity: hand-computed shares, argmax ties to the lowest label") {
    import spark.implicits._
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 2L), (7L, 2L)).toDF("vec_id", "cell")
    val labels = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 1),
      (6L, 3), (7L, 2)).toDF("vec_id", "label")
    val out = Similarity.clusterPurity(assign, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out(0L) == (3L, 0L, 2L, 666666L), s"cell 0: ${out(0L)}")
    assert(out(1L) == (2L, 1L, 2L, 1000000L), s"cell 1: ${out(1L)}")
    // 1-1 tie between labels 2 and 3 -> lowest label wins
    assert(out(2L) == (2L, 2L, 1L, 500000L), s"cell 2: ${out(2L)}")
  }

  test("mmrTopK: diversity penalty promotes the non-duplicate candidate") {
    import spark.implicits._
    // #1 and #2 are near-duplicates of EACH OTHER (both ~0.9 relevant);
    // #3 is equally relevant but on the other side of the query
    val corpus = Seq(
      (1L, Seq(0.9f, 0.44f, 0f, 0f)),
      (2L, Seq(0.9f, 0.43f, 0f, 0f)),
      (3L, Seq(0.9f, -0.44f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Array(1.0f, 0f, 0f, 0f)
    val mmr = Similarity.mmrTopK(q, corpus, n = 3, k = 3,
        lambdaMicro = 500000L)
      .collect().map(r => (r.getInt(1), r.getLong(0))).toMap
    // plain top-k would put the duplicate pair first (2 then 1); MMR
    // promotes the diverse #3 to rank 2, demoting the duplicate
    assert(mmr == Map(1 -> 2L, 2 -> 3L, 3 -> 1L), s"got $mmr")
    // rerun is identical (content-addressed, no RNG)
    val again = Similarity.mmrTopK(q, corpus, n = 3, k = 3,
        lambdaMicro = 500000L)
      .collect().map(r => (r.getInt(1), r.getLong(0))).toMap
    assert(again == mmr)
  }

  test("kCenterCoreset: farthest-point picks span the clusters, skip duplicates") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)), (1L, Seq(0.99f, 0.01f, 0f, 0f)),
      (2L, Seq(0f, 1.0f, 0f, 0f)), (3L, Seq(0.01f, 0.99f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1.0f, 0f)))
      .toDF("vec_id", "embedding")
    val picks = Similarity.kCenterCoreset(corpus, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getLong(2)))
    // seed = min id; then the orthogonal clusters (1e6 distance, id tie
    // to 2); the near-duplicates 1 and 3 are never picked
    assert(picks.map(p => (p._1, p._2)).toSeq ==
      Seq((1, 0L), (2, 2L), (3, 4L)), s"got ${picks.toSeq}")
    assert(picks(0)._3 == 0L && picks(1)._3 == 1000000L)
  }

  test("anisotropyByGroup: collapsed group scores 1, isotropic group scores 0") {
    import spark.implicits._
    val emb = Seq(
      // group 0: all identical -> mu == v -> anisotropy exactly 10^6
      (0L, Seq(0.5f, 0.5f, 0f, 0f), 0),
      (1L, Seq(0.5f, 0.5f, 0f, 0f), 0),
      // group 1: +/-e1, +/-e2 -> mu = 0 -> anisotropy 0
      (2L, Seq(1f, 0f, 0f, 0f), 1), (3L, Seq(-1f, 0f, 0f, 0f), 1),
      (4L, Seq(0f, 1f, 0f, 0f), 1), (5L, Seq(0f, -1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.anisotropyByGroup(emb, "label").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0)._1 == 2L && out(1)._1 == 4L)
    assert(out(0)._2 == 1000000L, s"collapsed group: ${out(0)}")
    // floor(-1.0 * 1e6) is exact, means are exactly 0
    assert(out(1)._2 == 0L, s"isotropic group: ${out(1)}")
    // partition invariance (integer sums throughout)
    val again = Similarity.anisotropyByGroup(emb.repartition(5), "label")
      .collect().map(_.toSeq).toSet
    assert(again == Similarity.anisotropyByGroup(emb, "label")
      .collect().map(_.toSeq).toSet)
  }

  test("daviesBouldinByCell: compact well-separated clusters score low") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.05f, 0f, 0f)), (1L, Seq(0.9f, 0.0f, 0f, 0f)),
      (2L, Seq(1.0f, -0.05f, 0f, 0f)),
      (3L, Seq(0.0f, 0.02f, 1.0f, 0f)), (4L, Seq(0f, -0.02f, 0.95f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      0L -> Array(1000000L, 0L, 0L, 0L),
      1L -> Array(0L, 0L, 1000000L, 0L))
    val out = Similarity.daviesBouldinByCell(emb, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet == Set(0L, 1L))
    // S ~ 0.002, M ~ 1.0 -> DB well under 0.3 for tight orthogonal groups
    assert(out.values.forall(_ < 300000L), s"high DB: $out")
    intercept[IllegalArgumentException] {
      Similarity.daviesBouldinByCell(emb, cents.take(1))
    }
  }

  test("silhouetteByCell: planted clusters score near 1, counts partition the corpus") {
    import spark.implicits._
    // two tight orthogonal clusters + their exact centroids in micro-units
    val emb = Seq(
      (0L, Seq(1.0f, 0.05f, 0f, 0f)), (1L, Seq(0.9f, 0.0f, 0f, 0f)),
      (2L, Seq(1.0f, -0.05f, 0f, 0f)),
      (3L, Seq(0.0f, 0.02f, 1.0f, 0f)), (4L, Seq(0f, -0.02f, 0.95f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      0L -> Array(1000000L, 0L, 0L, 0L),
      1L -> Array(0L, 0L, 1000000L, 0L))
    val out = Similarity.silhouetteByCell(emb, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 3L && out(1L)._1 == 2L) // n per cell partitions corpus
    // tight, near-orthogonal clusters: silhouette close to the 10^6 max
    assert(out.values.forall(_._2 > 900000L), s"low silhouette: $out")
    // partition invariance
    val again = Similarity.silhouetteByCell(emb.repartition(5), cents)
      .collect().map(_.toSeq).toSet
    assert(again == Similarity.silhouetteByCell(emb, cents).collect().map(_.toSeq).toSet)
    // a 1-centroid clustering has no "nearest other" — must fail loudly
    intercept[IllegalArgumentException] {
      Similarity.silhouetteByCell(emb, cents.take(1))
    }
  }

  test("rrfFuse: hand-computed integer reciprocal ranks, doc in both lists wins") {
    import spark.implicits._
    val lex = Seq((1, 10L, 1), (1, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val dns = Seq((1, 11L, 1), (1, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, dns), k = 3)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_micro")))
      .sortBy(_._1)
    // 10^6 div 61 = 16393, 10^6 div 62 = 16129; doc 11 sums both lists
    assert(got.toSeq == Seq(
      (1, 11L, 2L, 32522L), (2, 10L, 1L, 16393L), (3, 12L, 1L, 16129L)))
    intercept[IllegalArgumentException] { Similarity.rrfFuse(Seq.empty) }
  }

  test("matryoshkaEval: hand-computed prefix cosines, zero vector = unit") {
    import spark.implicits._
    // v1 micro-izes to (3,4,0,0): ssq 25, prefix-1 ssq 9 -> cos .6;
    // v2 is the zero vector -> cos = unit at every prefix
    val emb = Seq(
      (1L, Seq(0.003f, 0.004f, 0f, 0f)),
      (2L, Seq(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaEval(emb, prefixes = Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("mean_cos_micro"),
          r.getAs[Long]("min_cos_micro"))).toMap
    assert(got == Map(
      1 -> ((2L, 800000L, 600000L)),
      2 -> ((2L, 1000000L, 1000000L))), got.toString)
  }

  test("prototypePruneByCell: hardest half kept per cell, ties to low id") {
    import spark.implicits._
    // axis-aligned unit centroids; v2/v3 sit at cos .8 from their own
    // centroid (dist 200000), v1/v4 exactly on it (dist 0)
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.6f, 0.8f)), (4L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      (0L, Array(1000000L, 0L)), (1L, Array(0L, 1000000L)))
    val got = Similarity.prototypePruneByCell(emb, cents,
        keepNum = 1, keepDen = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((0L, 0L, 2, false)))       // easy: pruned
    assert(got(2L) == ((0L, 200000L, 1, true)))   // hard: kept
    assert(got(3L) == ((1L, 200000L, 1, true)))
    assert(got(4L) == ((1L, 0L, 2, false)))
    // keep-everything and keep-nothing bounds
    val all = Similarity.prototypePruneByCell(emb, cents, 1, 1)
      .collect().map(_.getBoolean(4))
    assert(all.forall(identity))
    val none = Similarity.prototypePruneByCell(emb, cents, 0, 1)
      .collect().map(_.getBoolean(4))
    assert(none.forall(!_))
  }

  test("d4Select: dedup drops clones first, prototype prune acts on survivors only") {
    import spark.implicits._
    // cell 0: clone pair (1, 10) on the centroid + hard point 2 at cos .8
    // cell 1: easy point 4 on the centroid + hard point 3 at cos .8
    val emb = Seq(
      (1L, Seq(1f, 0f)), (10L, Seq(1f, 0f)), (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.6f, 0.8f)), (4L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      (0L, Array(1000000L, 0L)), (1L, Array(0L, 1000000L)))
    val got = Similarity.d4Select(emb, cents, threshold = 0.95,
        keepNum = 1, keepDen = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4))).toMap
    // 10 is gone entirely (stage 1); with the clone collapsed, each
    // cell holds one easy + one hard point — hardest half kept
    assert(!got.contains(10L), s"clone must not reach stage 2: $got")
    assert(got(1L) == ((0L, 0L, 2, false)), got.toString)    // easy: pruned
    assert(got(2L) == ((0L, 200000L, 1, true)), got.toString) // hard: kept
    assert(got(3L) == ((1L, 200000L, 1, true)), got.toString)
    assert(got(4L) == ((1L, 0L, 2, false)), got.toString)
    // composition law: d4Select ≡ prototype prune of the dedup survivors
    val manual = Similarity.prototypePruneByCell(
        Similarity.semanticDedupWithMicro(emb, cents, threshold = 0.95),
        cents, 1, 2).collect().map(_.toSeq).toSet
    assert(Similarity.d4Select(emb, cents, 0.95, 1, 2)
      .collect().map(_.toSeq).toSet == manual)
    // WITHOUT dedup, the clone pair fills cell 0's keep quota ((1,10)
    // rank the centroid distance 0 pair last but n=3 keeps rank 1 only
    // = point 2): dedup-then-prune and prune-alone disagree — the two
    // stages remove different mass, the paper's point
    val pruneOnly = Similarity.prototypePruneByCell(emb, cents, 1, 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(pruneOnly(2L) && !pruneOnly(1L) && !pruneOnly(10L))
  }

  test("retrievalEval: hand-computed MRR and NDCG, zero-relevant guard") {
    import spark.implicits._
    // q1: relevant at ranks 2 and 3 of the pool; q2: nothing relevant
    val ranked = Seq(
      (1, 1, false), (1, 2, true), (1, 3, true),
      (2, 1, false), (2, 2, false))
      .toDF("query_id", "rk", "rel")
    val nRel = Seq((1, 5L), (2, 0L)).toDF("query_id", "n_rel")
    val got = Similarity.retrievalEval(ranked, nRel, k = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("rr_micro"), r.getAs[Long]("dcg_micro"),
          r.getAs[Long]("idcg_micro"), r.getAs[Long]("ndcg_micro"))).toMap
    val Seq((_, d1, p1), (_, d2, _), (_, d3, p3)) =
      Similarity.discountTable(3)
    assert((d1, d2, d3) == ((1000000L, 630930L, 500000L)))
    val dcg = d2 + d3
    assert(got(1) == ((500000L, dcg, p3, 1000000L * dcg / p3)),
      got.toString)
    // no relevant docs anywhere: all zeros, no division fault
    assert(got(2) == ((0L, 0L, 0L, 0L)), got.toString)
    // a query in the pool but MISSING from nRel must surface with
    // n_rel = 0 and zero scores, not vanish (left-join guard)
    val got2 = Similarity.retrievalEval(ranked,
        Seq((1, 5L)).toDF("query_id", "n_rel"), k = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_rel"), r.getAs[Long]("idcg_micro"),
          r.getAs[Long]("ndcg_micro"))).toMap
    assert(got2.contains(2), got2.toString)
    assert(got2(2) == ((0L, 0L, 0L)), got2.toString)
  }

  test("bitext mining: planted parallel pairs mine as mutual high-margin") {
    // A planted parallel corpus in one shared space: sources 0/2/4 each
    // have a near-identical target translation (101/103/105); target 107
    // is an unrelated distractor, and source 6 is AMBIGUOUS — equally
    // similar to all three planted targets, so no candidate stands out
    // of its neighborhood (the margin denominator ≈ the candidate sim).
    // Margin must (a) pair each source with its translation mutually,
    // (b) give those pairs high margins, (c) keep 6's best margin below
    // the CCMatrix bar — raw-cosine mining would happily pair 6 at
    // cos ≈ 0.58, the margin criterion is exactly what rejects it.
    val src = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f),
      6L -> Seq(0.577f, 0.577f, 0.577f, 0f))
    val tgt = emb(
      101L -> Seq(0.99f, 0.01f, 0f, 0f),
      103L -> Seq(0.01f, 0.99f, 0f, 0f),
      105L -> Seq(0f, 0.01f, 0.99f, 0f),
      107L -> Seq(0f, 0f, 0f, 1f))
    val fwd = Similarity.bruteForceTopK(src, tgt, k = 3)
    val bwd = Similarity.bruteForceTopK(tgt, src, k = 3)
    val scored = Similarity.bitextMarginPairs(fwd, bwd)
    val mutual = scored.filter(col("mutual")).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    assert(mutual.get(0L).contains(101L), mutual.toString)
    assert(mutual.get(2L).contains(103L), mutual.toString)
    assert(mutual.get(4L).contains(105L), mutual.toString)
    // threshold mining: the three planted pairs clear CCMatrix's 1.06
    // margin; ambiguous 6 does not surface at that bar
    val mined = Similarity.minedBitext(fwd, bwd, thresholdMicro = 1060000L)
      .collect().map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id"))
      .toMap
    assert(mined.keySet == Set(0L, 2L, 4L), mined.toString)
    // margins are in micro units around/above 1.0 for true pairs
    val m0 = scored.filter(col("src_id") === 0 && col("tgt_id") === 101)
      .head().getAs[Long]("margin_micro")
    assert(m0 > 1060000L, s"planted pair margin too low: $m0")
  }

  test("ivfTopKShuffledMicro: identical rows to the broadcast form, no broadcast of queries") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.trainIvfCentroidsMicro(e, k = 8, iters = 2)
    val broad = Similarity.ivfTopKWithMicro(e, e, cents, k = 3)
    val shuf = Similarity.ivfTopKShuffledMicro(e, e, cents, k = 3)
    val a = broad.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    val b = shuf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(a == b, s"shuffled IVF diverged: ${a.take(3)} vs ${b.take(3)}")
    // the corpus×corpus scale property: the probe join must NOT broadcast
    // (a corpus-sized query side cannot fit an executor broadcast)
    val bx = shuf.queryExecution.executedPlan.collect {
      case p: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => p
    }
    assert(bx.isEmpty, s"shuffled IVF still broadcasts: $bx")
  }

  test("bitext mining: sim_micro identical from either direction (dedup exact)") {
    val src = emb(0L -> Seq(1f, 0.25f), 2L -> Seq(0.3f, 1f))
    val tgt = emb(11L -> Seq(0.9f, 0.3f), 13L -> Seq(0.25f, 0.95f))
    val fwd = Similarity.bruteForceTopK(src, tgt, k = 2)
    val bwd = Similarity.bruteForceTopK(tgt, src, k = 2)
    // every pair appears in both directions here; dropDuplicates must
    // collapse them to exactly |src|x|tgt| rows, not 2x
    val n = Similarity.bitextMarginPairs(fwd, bwd).count()
    assert(n == 4L, s"expected 4 deduped candidate pairs, got $n")
  }

  test("bitext margins are role-symmetric: swapping src/tgt transposes the relation") {
    // the margin formula is symmetric in (x, y); feeding the directions
    // swapped must produce the exact transposed relation with the best
    // flags exchanged — a miner must not depend on which language is
    // called "source"
    val src = emb(
      0L -> Seq(1f, 0.2f, 0f), 2L -> Seq(0f, 1f, 0.3f),
      4L -> Seq(0.5f, 0.5f, 0.1f))
    val tgt = emb(
      11L -> Seq(0.9f, 0.25f, 0.05f), 13L -> Seq(0.1f, 0.95f, 0.28f),
      15L -> Seq(0.4f, 0.1f, 0.9f))
    val fwd = Similarity.bruteForceTopK(src, tgt, k = 2)
    val bwd = Similarity.bruteForceTopK(tgt, src, k = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Long]("sim_micro"), r.getAs[Long]("margin_micro"),
        r.getAs[Boolean]("is_src_best"), r.getAs[Boolean]("is_tgt_best"))).toSet
    val ab = rows(Similarity.bitextMarginPairs(fwd, bwd))
    val ba = rows(Similarity.bitextMarginPairs(bwd, fwd))
    val transposed = ab.map { case (s, t, sim, m, sb, tb) => (t, s, sim, m, tb, sb) }
    assert(ba == transposed,
      s"role swap not a transpose:\n  ab=$ab\n  ba=$ba")
  }

  test("prototypePruneByCell: zero vector pins dist_micro to unit") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(
      (0L, Array(1000000L, 0L)), (1L, Array(0L, 1000000L)))
    val got = Similarity.prototypePruneByCell(emb, cents, 1, 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // zero vector: cosine is 0/0 — pinned to dist = unit, assigned to
    // the lowest cell (all cells tie at the pinned distance)
    assert(got(2L) == ((0L, 1000000L)), got.toString)
    assert(got(1L) == ((0L, 0L)), got.toString)
  }

  test("ndcg: perfect ranking = 1e6; dot-vs-cos displacement exactly charged") {
    import spark.implicits._
    import graft.functions.ExactMicroOps.log2Micro
    // corpus where dot and cosine DISAGREE: long vectors win dot,
    // normalized direction wins cosine. Query 100 = (1, 0).
    val vecs = Seq(
      (100L, Array(1.0f, 0.0f)),   // query
      (1L, Array(0.9f, 0.1f)),     // near-parallel, short
      (2L, Array(5.0f, 4.0f)),     // long, off-direction -> wins dot
      (3L, Array(0.5f, 0.5f)),
      (4L, Array(-1.0f, 0.0f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 100L)
    val exact = Similarity.bruteForceTopKMicro(q, emb, k = 3)
    val approx = Similarity.bruteForceTopKDotMicro(q, emb, k = 3)
    val exRanks = exact.collect()
      .map(r => r.getLong(1) -> r.getInt(3).toLong).toMap
    val apRanks = approx.collect()
      .map(r => r.getLong(1) -> r.getInt(3).toLong).toMap
    assert(exRanks(1L) == 1L && apRanks(2L) == 1L,
      s"rankings should disagree: ex=$exRanks ap=$apRanks")
    val got = Similarity.ndcgAtK(approx, exact, k = 3).collect()(0)
    // sequential replay of the pinned per-term nano arithmetic
    val rel = exRanks.view.mapValues(r => 4L - r).toMap
    val dcg = apRanks.toSeq.map { case (id, r) =>
      rel.getOrElse(id, 0L) * 1000000000L / log2Micro(r + 1L) }.sum
    val idcg = exRanks.toSeq.map { case (id, r) =>
      rel(id) * 1000000000L / log2Micro(r + 1L) }.sum
    assert(got.getLong(1) == dcg && got.getLong(2) == idcg)
    assert(got.getLong(3) == dcg * 1000000L / idcg)
    assert(got.getLong(3) < 1000000L, "displaced ranking must score < 1")
    val nnRank = apRanks.getOrElse(exRanks.find(_._2 == 1L).get._1, 0L)
    assert(got.getLong(4) == nnRank &&
      got.getLong(5) == (if (nnRank == 0) 0L else 1000000L / nnRank))
    // self-comparison: identical rankings score exactly 1e6 with nn rank 1
    val self = Similarity.ndcgAtK(exact, exact, k = 3).collect()(0)
    assert(self.getLong(3) == 1000000L && self.getLong(4) == 1L &&
      self.getLong(5) == 1000000L)
  }
}
