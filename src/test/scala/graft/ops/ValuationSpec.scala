package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValuationSpec extends SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Double], Long)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "emb_d", "label")
      .select(col("vec_id"), col("emb_d").cast("array<float>").as("embedding"),
        col("label"))
  }

  test("knnShapley: all-match panel gives every train point 1/N in nano") {
    val train = emb(Seq((1L, Seq(0.9, 0.1), 7L), (2L, Seq(0.5, 0.5), 7L),
      (3L, Seq(0.1, 0.9), 7L)))
    val test = emb(Seq((100L, Seq(1.0, 0.0), 7L)))
    val out = Valuation.knnShapley(train, test, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // α_i = 1 ∀i → recursion collapses to s_i = ⌊10⁹/3⌋ everywhere
    assert(out == Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
  }

  test("knnShapley: no-match panel gives exactly zero everywhere") {
    val train = emb(Seq((1L, Seq(0.9, 0.1), 1L), (2L, Seq(0.1, 0.9), 2L)))
    val test = emb(Seq((100L, Seq(1.0, 0.0), 7L)))
    val out = Valuation.knnShapley(train, test, k = 1)
      .collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(0L, 0L))
  }

  test("knnShapley K=1, N=2: matches the hand-derived closed form, sign included") {
    val test = emb(Seq((100L, Seq(1.0, 0.0), 7L)))
    // near point matches, far point does not: s_near = 1, s_far = 0
    val t1 = emb(Seq((1L, Seq(0.9, 0.1), 7L), (2L, Seq(0.1, 0.9), 5L)))
    val o1 = Valuation.knnShapley(t1, test, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(o1 == Map(1L -> 1000000000L, 2L -> 0L))
    // near point mismatches, far point matches: s_near = −1/2, s_far = +1/2
    val t2 = emb(Seq((1L, Seq(0.9, 0.1), 5L), (2L, Seq(0.1, 0.9), 7L)))
    val o2 = Valuation.knnShapley(t2, test, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(o2 == Map(1L -> -500000000L, 2L -> 500000000L))
  }

  test("knnShapley sums panels and is partition-invariant") {
    val train = emb((1L to 40L).map(i =>
      (i, Seq(math.cos(i.toDouble), math.sin(i.toDouble)), i % 3)))
    val test = emb(Seq((100L, Seq(1.0, 0.0), 0L), (101L, Seq(0.0, 1.0), 1L)))
    val a = Valuation.knnShapley(train, test, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.forall(_._2 == 2L)) // both test points scored every train point
    val b = Valuation.knnShapley(train.repartition(7), test, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("knnShapley matches a direct sequential replay of the closed form (randomized)") {
    import graft.functions.ExactMicroOps
    val rnd = new scala.util.Random(12012)
    def micro(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 1000000.0d).toLong)
    // in-memory reference: the same micro cosine kernel, rank order,
    // floored nano terms, suffix sums — written as plain sequential
    // Scala so a window/join bug in the distributed form cannot hide
    def ref(train: Seq[(Long, Array[Double], Long)],
        test: Seq[(Long, Array[Double], Long)], k: Int): Map[Long, Long] = {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((_, qv, ql) <- test) {
        val qm = micro(qv)
        def cos(tv: Array[Long]): Long = {
          var dot = 0L; var na = 0L; var nb = 0L
          for (i <- tv.indices) {
            dot += tv(i) * qm(i); na += tv(i) * tv(i); nb += qm(i) * qm(i)
          }
          ExactMicroOps.cosMicroParts(dot, na, nb)
        }
        val ranked = train.map { case (id, tv, tl) =>
          (id, cos(micro(tv)), if (tl == ql) 1L else 0L) }
          .sortBy { case (id, s, _) => (-s, id) }
        val n = ranked.length
        val terms = ranked.zipWithIndex.map { case ((_, _, a), i0) =>
          val i = i0 + 1L
          if (i0 == n - 1) a * (1000000000L / n)
          else {
            val aNext = ranked(i0 + 1)._3
            (a - aNext) * ((math.min(k.toLong, i) * 1000000000L) / (k * i))
          }
        }
        val suffix = terms.scanRight(0L)(_ + _).init
        ranked.zip(suffix).foreach { case ((id, _, _), s) => acc(id) += s }
      }
      acc.toMap
    }
    val dims = 6
    val train = (1L to 60L).map(i =>
      (i, Array.fill(dims)(rnd.nextDouble() * 2 - 1), rnd.nextInt(4).toLong))
    val test = (100L to 107L).map(i =>
      (i, Array.fill(dims)(rnd.nextDouble() * 2 - 1), rnd.nextInt(4).toLong))
    val expected = ref(train, test, k = 5)
    val got = Valuation.knnShapley(
        emb(train.map { case (i, v, l) => (i, v.toSeq, l) }),
        emb(test.map { case (i, v, l) => (i, v.toSeq, l) }), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected,
      got.toSeq.sortBy(_._1).zip(expected.toSeq.sortBy(_._1)).filter(x => x._1 != x._2).take(5).toString)
  }

  test("knnShapleyTruncated: equals the exact form when nothing truncates") {
    // with every cell probed and m = |train|, the ANN candidate set IS
    // the full training set with the identical (sim desc, id) ordering,
    // so the truncated recursion must reproduce knnShapley bit-for-bit
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val train = e.filter(col("vec_id") % 25 =!= 0)
    val test = e.filter(col("vec_id") % 25 === 0)
    val cents = Similarity.quantizeMicro(Similarity.ivfCentroids(e, 50))
    val nTrain = train.count().toInt
    val exact = Valuation.knnShapley(train, test, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val trunc = Valuation.knnShapleyTruncated(train, test, k = 5,
        m = nTrain, cents, nProbe = cents.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(trunc.toSeq == exact.toSeq,
      trunc.zip(exact).filter(x => x._1 != x._2).take(5).toString)
  }

  test("knnShapleyTruncated m=16: bounded candidates, deterministic, ranks sane") {
    val e = graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")
    val train = e.filter(col("vec_id") % 25 =!= 0)
    val test = e.filter(col("vec_id") % 25 === 0)
    val cents = Similarity.quantizeMicro(Similarity.ivfCentroids(e, 50))
    val a = Valuation.knnShapleyTruncated(train, test, k = 5, m = 16, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // every train point appears in at most |test| neighborhoods of 16
    val nTest = test.count()
    assert(a.nonEmpty && a.forall(t => t._2 >= 1L && t._2 <= nTest), a.take(3).toString)
    assert(a.map(_._2).sum <= nTest * 16, "candidate volume must be <= |test|*m")
    val b = Valuation.knnShapleyTruncated(graft.T.par(spark, train), test,
        k = 5, m = 16, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("tracin self-influence: mislabeled docs score highest; exact replay") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = new scala.util.Random(37)
    val good = (1 to 8).map(i => s"good$i")
    val bad = (1 to 8).map(i => s"bad$i")
    def doc(v: Seq[String]) =
      (1 to 10).map(_ => v(r.nextInt(v.size))).mkString(" ")
    // ids 201..205 are good-vocab docs with FLIPPED labels
    val rows = (1 to 40).map(i => (i.toLong, doc(good), 1)) ++
      (41 to 80).map(i => (i.toLong, doc(bad), 0)) ++
      (201 to 205).map(i => (i.toLong, doc(good), 0))
    val docs = rows.toDF("doc_id", "text", "label")
    val got = Valuation.tracinSelfInfluence(docs, dim = 32, iters = 4,
        lrNum = 1L, lrDen = 8L)
      .collect().map(row => row.getLong(0) -> row.getLong(2)).toMap
    assert(got.size == 85)
    // the 5 mislabeled docs outrank the median clean doc
    val cleanMed = (1 to 80).map(i => got(i.toLong)).sorted.apply(40)
    assert((201 to 205).forall(i => got(i.toLong) > cleanMed),
      s"flipped not high: ${(201 to 205).map(i => got(i.toLong))} vs $cleanMed")
    // exact replay from epochs + feature norms
    val ep = QualityModel.logisticEpochScoresMicro(docs, dim = 32,
        iters = 4, lrNum = 1L, lrDen = 8L)
      .collect().map(row => (row.getLong(0), 1000000L - row.getLong(4)))
    val nn = QualityModel.hashedFeatures(docs, 32).collect()
      .map(row => (row.getLong(0), row.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 * t._2).sum).toMap
    ep.groupBy(_._1).foreach { case (id, es) =>
      val s2 = es.map(e => BigInt(e._2) * e._2).sum
      val want = (s2 * (nn.getOrElse(id, 0L) + 1L)) / (8L * 1000000L)
      assert(got(id) == want.toLong, s"doc $id")
    }
  }

  test("tracin: same-vocab train docs are proponents; sequential replay; invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = new scala.util.Random(29)
    val good = (1 to 8).map(i => s"good$i")
    val bad = (1 to 8).map(i => s"bad$i")
    def doc(v: Seq[String]) =
      (1 to 10).map(_ => v(r.nextInt(v.size))).mkString(" ")
    val train = ((1 to 20).map(i => (i.toLong, doc(good), 1)) ++
      (21 to 40).map(i => (i.toLong, doc(bad), 0))).toDF("doc_id", "text", "label")
    val test = Seq((101L, doc(good), 1), (102L, doc(bad), 0))
      .toDF("doc_id", "text", "label")
    val dim = 32; val iters = 3
    val got = Valuation.tracinInfluence(train, test, dim, iters,
        lrNum = 1L, lrDen = 8L, topK = 3)
      .collect().map(row => (row.getLong(0), row.getString(1),
        row.getLong(2), row.getLong(3), row.getLong(4)))
    assert(got.length == 12) // 2 tests x 2 kinds x top-3
    // the good-vocab test doc's proponents are good-vocab train docs
    val pro101 = got.filter(t => t._1 == 101L && t._2 == "proponent").map(_._4)
    assert(pro101.forall(_ <= 20L), pro101.mkString(","))
    assert(got.filter(t => t._1 == 101L && t._2 == "proponent")
      .forall(_._5 > 0L))
    // sequential replay of the factorized TracIn sum
    val ftr = QualityModel.hashedFeatures(train, dim).collect()
      .map(row => (row.getLong(0), row.getLong(1).toInt, row.getLong(2)))
    val fte = QualityModel.hashedFeatures(test, dim).collect()
      .map(row => (row.getLong(0), row.getLong(1).toInt, row.getLong(2)))
    val ys = (1 to 40).map(i => i.toLong -> (if (i <= 20) 1L else 0L)).toMap ++
      Map(101L -> 1L, 102L -> 0L)
    val traj = QualityModel.logisticTrajectoryMicro(train, dim, iters,
      lrNum = 1L, lrDen = 8L)
    def rOf(feats: Array[(Long, Int, Long)], id: Long, w: Array[Long], b: Long) = {
      val m = b + feats.collect { case (i, k, n) if i == id => n * w(k) }.sum
      graft.functions.ExactMicroOps.sigmoidMicro(m) - ys(id) * 1000000L
    }
    val full = Valuation.tracinInfluence(train, test, dim, iters,
        lrNum = 1L, lrDen = 8L, topK = 40)
      .collect().filter(_.getString(1) == "proponent")
      .map(row => (row.getLong(0), row.getLong(3)) -> row.getLong(4)).toMap
    for (i <- Seq(1L, 15L, 27L, 40L); j <- Seq(101L, 102L)) {
      val s = traj.map { case (w, b) =>
        BigInt(rOf(ftr, i, w, b)) * rOf(fte, j, w, b) }.sum
      val dot = (for ((ia, k, n) <- ftr if ia == i;
        (jb, k2, m) <- fte if jb == j && k2 == k) yield n * m).sum + 1L
      val expected = ((s.abs * dot) / (8L * 1000000L)) * s.signum
      assert(full.get((j, i)).contains(expected.toLong),
        s"pair ($i,$j): got ${full.get((j, i))} want $expected")
    }
    // partition invariance
    val got2 = Valuation.tracinInfluence(train.repartition(7), test, dim,
        iters, lrNum = 1L, lrDen = 8L, topK = 3)
      .collect().map(row => (row.getLong(0), row.getString(1),
        row.getLong(2), row.getLong(3), row.getLong(4)))
    assert(got.sortBy(t => (t._1, t._2, t._3)).toSeq ==
      got2.sortBy(t => (t._1, t._2, t._3)).toSeq)
  }

  test("datainf: exact sequential replay of the Sherman–Morrison chain; invariance") {
    import spark.implicits._
    val r = new scala.util.Random(61)
    val good = (1 to 8).map(i => s"good$i")
    val bad = (1 to 8).map(i => s"bad$i")
    def doc(v: Seq[String]) =
      (1 to 10).map(_ => v(r.nextInt(v.size))).mkString(" ")
    val train = ((1 to 15).map(i => (i.toLong, doc(good), 1)) ++
      (16 to 30).map(i => (i.toLong, doc(bad), 0))).toDF("doc_id", "text", "label")
    val test = Seq((101L, doc(good), 1), (102L, doc(bad), 0),
      (103L, doc(good), 1)).toDF("doc_id", "text", "label")
    val dim = 16; val iters = 3; val lrDen = 8L
    def side(d: org.apache.spark.sql.DataFrame) =
      (QualityModel.hashedFeatures(d, dim),
        d.select(col("doc_id").as("id"), col("label").cast("long").as("y")))
    val (ftr, ltr) = side(train); val (fte, lte) = side(test)
    val got = Valuation.datainfInfluenceFromFeats(ftr, ltr, fte, lte,
        dim, iters, lrNum = 1L, lrDen = lrDen)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .sortBy(_._1)
    assert(got.length == 30 && got.forall(_._2 == 3L))
    // ---- sequential replay: same trajectory, every floor in BigInt ----
    val feats = (ftr.collect() ++ fte.collect())
      .map(row => (row.getLong(0), row.getLong(1).toInt, row.getLong(2)))
    val ys = (1 to 30).map(i => i.toLong -> (if (i <= 15) 1L else 0L)).toMap ++
      Map(101L -> 1L, 102L -> 0L, 103L -> 1L)
    val (w, b) = QualityModel.logisticTrajectoryMicro(train, dim, iters,
      lrNum = 1L, lrDen = lrDen).last
    def resid(id: Long): Long = {
      val m = b + feats.collect { case (i, k, n) if i == id => n * w(k) }.sum
      graft.functions.ExactMicroOps.sigmoidMicro(m) - ys(id) * 1000000L
    }
    def sdiv(a: BigInt, d: BigInt): BigInt =
      if (a.signum >= 0) a / d else -((-a) / d)
    val trIds = (1L to 30L).toSeq; val teIds = Seq(101L, 102L, 103L)
    val rs = (trIds ++ teIds).map(i => i -> BigInt(resid(i))).toMap
    def vecOf(id: Long) = feats.collect { case (i, k, n) if i == id => (k, n) }
    val g2 = trIds.map { j =>
      j -> rs(j) * rs(j) * (vecOf(j).map(t => t._2 * t._2).sum + 1L) }.toMap
    val lam = BigInt(1L).max(g2.values.sum / (10 * trIds.length))
    def dot(i: Long, v: Long) = {
      val mv = vecOf(v).toMap
      vecOf(i).map { case (k, n) => n * mv.getOrElse(k, 0L) }.sum + 1L
    }
    val cjs = (for (j <- trIds; v <- teIds) yield {
      val vg = rs(j) * rs(v) * dot(j, v)
      (j, v) -> (vg, sdiv(1000000 * vg, lam + g2(j)))
    }).toMap
    // u_v over buckets + bias coordinate, then term2 per (i, v)
    val expected = trIds.map { i =>
      val sc = teIds.map { v =>
        val uv = Array.fill(dim)(BigInt(0)); var ub = BigInt(0)
        for (j <- trIds) {
          val c = cjs((j, v))._2
          for ((k, n) <- vecOf(j)) uv(k) += c * rs(j) * n
          ub += c * rs(j)
        }
        val ux = vecOf(i).map { case (k, n) => uv(k) * n }.sum
        val t2 = sdiv(rs(i) * (ux + ub), 1000000)
        sdiv(1000000 * (trIds.length * cjs((i, v))._1 - t2),
          trIds.length * lam).toLong
      }.sum
      (i, 3L, sc)
    }
    assert(got.toSeq == expected,
      got.zip(expected).filter(x => x._1 != x._2).take(5).toString)
    // partition invariance
    val got2 = Valuation.datainfInfluenceFromFeats(ftr.repartition(7), ltr,
        fte, lte, dim, iters, lrNum = 1L, lrDen = lrDen)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == got2.toSeq)
  }

  test("panel guards fail loudly on corpus-sized test panels") {
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, s"w$i w${i + 1}", i % 2))
      .toDF("doc_id", "text", "label")
    val e1 = intercept[IllegalArgumentException] {
      Valuation.tracinInfluence(docs, docs, dim = 8, iters = 1,
        maxPanel = 10)
    }
    assert(e1.getMessage.contains("maxPanel=10"))
    val vecs = emb((1L to 20L).map(i => (i, Seq(1.0, 0.0), 1L)))
    val e2 = intercept[IllegalArgumentException] {
      Valuation.knnShapley(vecs, vecs, k = 2, maxPanel = 10)
    }
    assert(e2.getMessage.contains("knnShapley"))
    // bounded panels still pass through the guard untouched
    assert(Valuation.tracinInfluence(docs.filter(col("doc_id") > 4),
      docs.filter(col("doc_id") <= 4), dim = 8, iters = 1,
      maxPanel = 10).count() > 0)
  }
}
