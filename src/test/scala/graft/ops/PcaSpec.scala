package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def syntheticEmb(n: Int, dim: Int) = {
    import spark.implicits._
    // deterministic anisotropic cloud: strong variance on axis 0, weaker
    // on axis 1, noise elsewhere — the planted spectrum the power method
    // must recover
    (0 until n).map { i =>
      val arr = Array.tabulate(dim) { j =>
        val base = ((i * 31 + j * 17) % 97 - 48) / 970.0f
        if (j == 0) ((i % 19) - 9) / 10.0f
        else if (j == 1) ((i % 7) - 3) / 12.0f + base / 4
        else base / 10
      }
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
  }

  test("powerDirections: r directions, deterministic, near-orthogonal") {
    val emb = syntheticEmb(300, 16)
    val d1 = Pca.powerDirections(emb, dim = 16, r = 2, iters = 3)
    val d2 = Pca.powerDirections(emb, dim = 16, r = 2, iters = 3)
    assert(d1.size == 2)
    assert(d1.map(_.toSeq) == d2.map(_.toSeq), "training is not deterministic")
    assert(d1.head.toSeq == Pca.powerDirection(emb, dim = 16, iters = 3).toSeq,
      "leading direction must match the single-component trainer")
    // deflation must remove the leading component: cos(v1, v2) well under
    // the cos between v1 and a random axis-ish vector
    val Seq(v1, v2) = d1.map(_.map(_.toDouble))
    val cos = math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) /
      (math.sqrt(v1.map(x => x * x).sum) * math.sqrt(v2.map(x => x * x).sum))
    assert(cos < 0.15, s"directions not near-orthogonal: |cos|=$cos")
  }

  test("abtt: exact sequential replay; common component mostly removed") {
    val dim = 8
    val emb = syntheticEmb(60, dim)
    val (mu, dirs) = Pca.abttStats(emb, dim = dim, r = 2, iters = 3)
    // sequential replay of mean + deflations on the raw rows
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000).toLong).toArray)
    val n = rows.length.toLong
    val muSeq = Array.tabulate(dim) { j =>
      val s = rows.map(_._2(j)).sum
      val d = math.abs(s) / n
      if (s < 0) -d else d
    }
    assert(mu.toSeq == muSeq.toSeq, "mean replay diverged")
    def deflate(x: Array[Long], v: Array[Long]): Array[Long] = {
      val vv = math.max(v.map(a => a * a).sum, 1L)
      val xv = x.zip(v).map { case (a, b) => a * b }.sum
      x.zip(v).map { case (a, b) =>
        val num = a * vv - b * xv
        val d = math.abs(num) / vv
        if (num < 0) -d else d
      }
    }
    val expected = rows.map { case (id, x) =>
      id -> dirs.foldLeft(x.zip(muSeq).map { case (a, b) => a - b })(deflate)
    }.toMap
    val got = Pca.abttTransform(emb, mu, dirs)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
    rows.foreach { case (id, _) =>
      assert(got(id).toSeq == expected(id).toSeq, s"vec $id") }
    // the removed directions really are (near-)gone: projecting the
    // transformed slice back onto each trained direction shrinks the
    // total |projection| mass by >10x vs the centered originals
    for (v <- dirs) {
      def mass(m: Map[Long, Array[Long]]) = rows.map { case (id, _) =>
        math.abs(m(id).zip(v).map { case (a, b) => a * b }.sum) }.sum
      val before = mass(rows.map { case (id, x) =>
        id -> x.zip(muSeq).map { case (a, b) => a - b } }.toMap)
      val after = mass(got.map { case (id, a) => id -> a.toArray })
      assert(after * 10 < before || before == 0L,
        s"direction not removed: before=$before after=$after")
    }
  }

  test("projectMicroTopR: one score column per direction, pure map") {
    val emb = syntheticEmb(50, 16)
    val dirs = Pca.powerDirections(emb, dim = 16, r = 2, iters = 2)
    val out = Pca.projectMicroTopR(emb, dirs)
    assert(out.columns.toSeq == Seq("vec_id", "pc1_micro", "pc2_micro"))
    assert(out.count() == 50)
    // serve is a map: no exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serve pass shuffles:\n$plan")
  }

  test("whitenOutliers: planted far-out vector flags, cloud does not") {
    import spark.implicits._
    val dim = 4
    val cloud = (0 until 300).map { i =>
      (i.toLong, Array(((i % 20) - 10) / 10.0f, ((i % 7) - 3) / 10.0f,
        ((i % 11) - 5) / 10.0f, ((i % 5) - 2) / 10.0f))
    }
    val planted = Seq((999L, Array(30.0f, -30.0f, 30.0f, -30.0f)))
    val emb = (cloud ++ planted).toDF("vec_id", "embedding")
    val (n, s1, sd) = Pca.whitenStats(
      emb.filter(col("vec_id") < 2000 && col("vec_id") =!= 999L), dim)
    // tau above the uniform-corner bound: a uniform [-a, a] coordinate
    // whitens to at most sqrt(3) sigma, so an all-corners row peaks at
    // mean z-squared = 3 — tau = 4 separates geometry from outliers
    val got = Pca.whitenOutliers(emb, n, s1, sd, dim, tau = 4L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("is_outlier")).toMap
    assert(got(999L) == 1L, s"planted outlier must flag: ${got(999L)}")
    assert(got.count(_._2 == 1L) == 1, // nothing in the cloud flags
      s"false positives: ${got.filter(_._2 == 1L)}")
  }

  test("whitenStats/whitenMicro: zero mean, unit variance, constant dim -> 0") {
    import spark.implicits._
    val dim = 4
    val emb = (0 until 200).map { i =>
      // dim 0: wide spread; dim 1: narrow; dim 2: constant; dim 3: offset
      (i.toLong, Array(
        ((i % 20) - 10) / 10.0f, ((i % 5) - 2) / 50.0f, 0.25f,
        0.5f + ((i % 11) - 5) / 30.0f))
    }.toDF("vec_id", "embedding")
    val (n, s1, sd) = Pca.whitenStats(emb, dim)
    assert(n == 200L && sd(2) == 0L) // constant dimension has zero spread
    val z = Pca.whitenMicro(emb, n, s1, sd, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // constant dim whitens to exactly 0
    assert(z.filter(_._2 == 2).forall(_._3 == 0L))
    // per-dim mean of z is ~0: |Σz| bounded by n units of truncation
    val byDim = z.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    for (d <- Seq(0, 1, 3)) {
      assert(math.abs(byDim(d).sum) <= 200L * 2,
        s"dim $d mean off: ${byDim(d).sum}")
      // variance ~ unit^2 (1e12) within 2%: scale is really removed
      val v = byDim(d).map(x => x.toDouble * x).sum / 200
      assert(math.abs(v - 1e12) < 2e10, s"dim $d var $v")
    }
    // partition invariance of the trained stats
    val (n2, s12, sd2) = Pca.whitenStats(emb.repartition(7), dim)
    assert(n2 == n && s12.toSeq == s1.toSeq && sd2.toSeq == sd.toSeq)
    // serve is a map: no exchange
    val plan = Pca.whitenMicro(emb, n, s1, sd)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"whiten serve shuffles:\n$plan")
  }
}
