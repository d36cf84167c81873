package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  test("ktruss: peels the bridge, keeps the clique, exact supports") {
    import spark.implicits._
    // K4 on {1,2,3,4} + a bridge 4-5 + a pendant triangle {5,6,7}
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L)))
      .toDF("id_a", "id_b")
    // 3-truss (support >= 1): bridge 4-5 is in no triangle -> peeled;
    // both the K4 and the triangle survive
    val t3 = Components.kTruss(pairs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3.keySet == (k4 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L))).toSet, t3)
    assert(t3((1L, 2L)) == 2L && t3((5L, 6L)) == 1L, t3.toString)
    // 4-truss (support >= 2): only the K4 survives (triangle edges have
    // support 1); peeling the triangle does not disturb K4 supports
    val t4 = Components.kTruss(pairs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == k4.toSet, t4.toString)
    assert(t4.values.forall(_ == 2L))
    // 5-truss: K4 edges have support 2 < 3 -> everything peels
    assert(Components.kTruss(pairs, k = 5).count() == 0L)
    // partition invariance
    val t3b = Components.kTruss(pairs.repartition(5), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3 == t3b)
  }

  /** threshold=0 forces the distributed large-star/small-star loop (the
    * default would route these tiny graphs to the driver union-find). */
  def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("src", "dst"), smallGraphThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  def ccLocal(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find for cross-checking. */
  def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("fixed-point pageRank: hub outranks leaves, exact partition invariance") {
    import spark.implicits._
    // symmetric star: center 0 <-> leaves 1..6
    val edges = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val pr = Components.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == (0L to 6L).toSet)
    assert(pr(0L) > pr(1L), s"hub must outrank a leaf: $pr")
    assert((1L to 6L).map(pr).toSet.size == 1, s"leaves must tie exactly: $pr")
    // integer arithmetic: bit-identical across partitionings
    val again = Components.pageRank(edges.repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == again)
  }

  test("chain collapses to one component rooted at the minimum") {
    assert(cc(1L -> 2L, 2L -> 3L, 3L -> 4L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint pairs stay separate") {
    assert(cc(1L -> 2L, 10L -> 11L, 20L -> 21L) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components merge through a late bridge edge") {
    assert(cc(1L -> 2L, 3L -> 4L, 2L -> 3L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges are harmless") {
    assert(cc(2L -> 1L, 1L -> 2L, 2L -> 2L, 1L -> 2L) == Map(1L -> 1L, 2L -> 1L))
  }

  test("long path converges within the iteration bound (log-round contraction)") {
    val path = (0L until 200L).map(i => i -> (i + 1))
    val got = cc(path: _*)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("matches union-find on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(pairs: _*) == unionFind(pairs))
  }

  test("driver union-find finish agrees with the distributed fixpoint") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    assert(ccLocal(pairs: _*) == cc(pairs: _*))
    assert(ccLocal(1L -> 2L, 2L -> 3L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("maxIter exhaustion with a still-large graph fails instead of collecting") {
    import spark.implicits._
    val pairs = Seq(1L -> 2L, 2L -> 3L, 4L -> 5L).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(pairs, maxIter = 0, smallGraphThreshold = 0)
    }
    assert(e.getMessage.contains("smallGraphThreshold"))
  }

  test("maxIter=0 with a small graph still finishes via the driver union-find") {
    import spark.implicits._
    val got = Components.connectedComponents(
      Seq(1L -> 2L, 2L -> 3L, 4L -> 5L).toDF("src", "dst"), maxIter = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("cluster sizes summarize per component") {
    import spark.implicits._
    val comps = Components.connectedComponents(
      Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("src", "dst"))
    val sizes = Components.clusterSizes(comps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 10L -> 2L))
  }

  test("triangleCounts: cliques count, stars and paths don't") {
    import spark.implicits._
    // K4 on 1-4 (4 triangles, each vertex in 3), two triangles sharing
    // edge 6-7, a star at 9 and a path 20-21-22 (no triangles)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val pairs = (k4 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L), (6L, 8L), (7L, 8L),
      (9L, 10L), (9L, 11L), (9L, 12L), (20L, 21L), (21L, 22L)))
      .toDF("id_a", "id_b")
    val got = Components.triangleCounts(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 2L, 7L -> 2L, 8L -> 1L), s"got $got")
    // orientation-invariance: reversed/duplicated input edges collapse
    val messy = pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))
      .unionByName(pairs)
    val got2 = Components
      .triangleCounts(messy.select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("labelPropagation: min-label communities, budget-invariant fixpoint") {
    import spark.implicits._
    // two cliques bridged by nothing: labels collapse to each clique's
    // minimum id within 2 sweeps
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val pairs = (cliqueA ++ cliqueB).toDF("id_a", "id_b")
    val r2 = Components.labelPropagation(pairs, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == ((1L to 4L).map(_ -> 1L) ++ (10L to 13L).map(_ -> 10L)).toMap,
      s"got $r2")
    // a large sweep budget must return the identical assignment — the
    // checksum fixpoint exits as soon as a sweep is a no-op, so the
    // budget is semantics-free (and the loop doesn't build 50 plans)
    val r50 = Components.labelPropagation(pairs, iters = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r50 == r2)
  }

  test("modularity: two clean cliques score Q = 0.5 exactly") {
    import spark.implicits._
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val pairs = (cliqueA ++ cliqueB).toDF("id_a", "id_b")
    val comm = Components.labelPropagation(pairs, iters = 2)
    val q = Components.modularity(pairs, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // m = 12; per clique e_c = 6, d_c = 12:
    // q_micro = 1e6*(4*12*6 - 144) div (4*144) = 1e6*144/576 = 250000
    assert(q.toSet == Set((1L, 6L, 12L, 250000L), (10L, 6L, 12L, 250000L)),
      s"got ${q.toSeq}")
    assert(q.map(_._4).sum == 500000L) // Q = 0.5, the textbook two-clique value
  }

  test("kCore: K4 kernel survives k=3, pendants peel, cascades empty a path") {
    import spark.implicits._
    // K4 {1..4} + pendant path 4-5-6: 5 and 6 never reach degree 3
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val g = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("id_a", "id_b")
    val core = Components.kCore(g, k = 3, sweeps = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core")
    // a path has no 2-core: endpoint peeling cascades to empty
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    assert(Components.kCore(path, k = 2, sweeps = 5).count() == 0L)
    // but a cycle is its own 2-core
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    assert(Components.kCore(cycle, k = 2, sweeps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // budget invariance: once converged, a larger budget changes nothing
    val a = Components.kCore(g, k = 3, sweeps = 3).collect().map(_.toSeq).toSet
    val b = Components.kCore(g, k = 3, sweeps = 10).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("personalizedPageRank: hand-computed walk-with-restart on a path") {
    import spark.implicits._
    // path 1-2-3 (undirected), plus disconnected pair 7-8, isolated seed 9
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (7L, 8L), (8L, 7L)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("id")
    val got = Components.personalizedPageRank(e, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // u0 = 1e12/2 = 5e11; base = 3*u0/20 = 7.5e10; unrolled by hand:
    // p1: 1 -> 75e9, 2 -> 425e9, 3 -> 0, 9 -> 75e9
    // p2: 1 -> 75e9+(17*212500000000)/20, 2 -> (17*75e9)/20, 3 -> 180625000000
    // p3 below
    assert(got(9L) == 75000000000L, got.toString)       // isolated seed: base only
    assert(got(7L) == 0L && got(8L) == 0L, got.toString) // unreachable: zero mass
    val p2_1 = 75000000000L + 17L * (425000000000L / 2) / 20
    val p2_2 = 17L * 75000000000L / 20
    val p2_3 = 17L * (425000000000L / 2) / 20
    val p3_1 = 75000000000L + 17L * (p2_2 / 2) / 20
    val p3_2 = 17L * (p2_1 + p2_3) / 20
    val p3_3 = 17L * (p2_2 / 2) / 20
    assert(got(1L) == p3_1 && got(2L) == p3_2 && got(3L) == p3_3, got.toString)
  }

  test("bfsHops: min hop distance from multi-source seeds, bounded depth") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a triangle 10-11-12 and isolated seed 20
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 10L, 20L).toDF("id")
    val got = Components.bfsHops(g, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, // 5 is 4 hops: absent
      10L -> 0, 11L -> 1, 12L -> 1, 20L -> 0))
    // multi-source min: adding seed 5 pulls 4 to distance 1
    val got2 = Components.bfsHops(g, Seq(1L, 5L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2 == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("hits: hand-computed 3-iteration trajectory, zero rows kept") {
    import spark.implicits._
    // 1→3, 2→3, 1→4: 3 is the authority (two hub in-links), 1 the hub
    // (links both authorities). Exact max-normalized integer trajectory:
    //   i1: a=(3:1e6, 4:500000)        h=(1:1e6, 2:666666)
    //   i2: a=(3:1e6, 4:600000)        h=(1:1e6, 2:625000)
    //   i3: a=(3:1e6, 4:615384)        h=(1:1e6, 2:619047)
    val e = Seq((1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Components.hits(e, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((1000000L, 0L)), 2L -> ((619047L, 0L)),
      3L -> ((0L, 1000000L)), 4L -> ((0L, 615384L))), got.toString)
    // partition invariance
    val got2 = Components.hits(e.repartition(5), iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got2 == got)
  }

  test("linkPrediction: path graph scores its one 2-hop pair exactly") {
    import spark.implicits._
    // 1—2—3: only candidate is (1,3) through center 2 (deg 2):
    // cn=1, ra=1e6 div 2, pref=1·1, jaccard=1e6·1 div (1+1−1)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.linkPrediction(e).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 3L)))
    assert(r.getAs[Long]("common_neighbors") == 1L)
    assert(r.getAs[Long]("ra_micro") == 500000L)
    assert(r.getAs[Long]("pref_attach") == 1L)
    assert(r.getAs[Long]("jaccard_micro") == 1000000L)
  }

  test("linkPrediction: 4-cycle pairs, triangle yields none, hub guard throws") {
    import spark.implicits._
    // square 1-2-3-4-1: candidates are the two diagonals, each with two
    // degree-2 centers: cn=2, ra=2·(1e6 div 2)=1e6, pref=2·2,
    // jaccard=1e6·2 div (2+2−2)=1e6
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val got = Components.linkPrediction(sq)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("ra_micro"),
          r.getAs[Long]("pref_attach"), r.getAs[Long]("jaccard_micro"))).toMap
    assert(got == Map(
      (1L, 3L) -> ((2L, 1000000L, 4L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L, 4L, 1000000L))), got.toString)
    // a closed triangle has no unlinked 2-hop pair
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Components.linkPrediction(tri).collect().isEmpty)
    // celebrity-hub quadratic corner: guarded, not silently enumerated
    val star = (1L to 5L).map(l => (0L, l)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      Components.linkPrediction(star, maxCenterDegree = 3L)
    }
    assert(ex.getMessage.contains("maxCenterDegree"))
  }

  test("weightedPageRank: unit weights reproduce pageRank; weight shifts mass") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L))
      .toDF("src", "dst")
    val unweighted = Components.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unitW = Components.weightedPageRank(
        edges.withColumn("weight", lit(1L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unitW == unweighted, s"unit weights must equal pageRank:\n" +
      s"weighted=$unitW unweighted=$unweighted")
    // tilt 0's mass toward 1: same topology, weight 3 on 0->1
    val tilted = Seq((0L, 1L, 3L), (1L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "weight")
    val w = Components.weightedPageRank(tilted, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(1L) > w(2L), s"heavier edge must outrank: $w")
    // parallel edges coalesce by weight sum: (0->1 w2) == (0->1 w1 twice)
    val dup = Seq((0L, 1L, 1L), (0L, 1L, 1L), (1L, 0L, 1L))
      .toDF("src", "dst", "weight")
    val merged = Seq((0L, 1L, 2L), (1L, 0L, 1L)).toDF("src", "dst", "weight")
    val a = Components.weightedPageRank(dup, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Components.weightedPageRank(merged, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("perSeedBfs keeps per-seed distances; harmonic sums their reciprocals") {
    import spark.implicits._
    // path 1-2-3-4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 4L).toDF("id")
    val dist = Components.perSeedBfs(path, seeds, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(dist == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2,
      (4L, 4L) -> 0, (4L, 3L) -> 1, (4L, 2L) -> 2), dist.toString)
    // 3 hops reach the far end: H = 1e6/1 + 1e6/2 + 1e6/3 per seed
    val h = Components.harmonicCentrality(path, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_reached"), r.getAs[Long]("harmonic_micro"))).toMap
    assert(h == Map(
      1L -> ((3L, 1833333L)), 4L -> ((3L, 1833333L))), h.toString)
    // an isolated seed (no edges touch it) must still get a row with
    // zero reach, not vanish from the output
    val h2 = Components.harmonicCentrality(path, Seq(1L, 99L).toDF("id"),
        maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_reached"), r.getAs[Long]("harmonic_micro"))).toMap
    assert(h2 == Map(
      1L -> ((3L, 1833333L)), 99L -> ((0L, 0L))), h2.toString)
  }

  test("degreeProfile: path graph endpoint/interior degrees") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Components.degreeProfile(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L), got.toString)
  }

  test("assortativity: star is perfectly disassortative, regular graph 0") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val s = Components.assortativity(star).collect().head
    assert(s.getAs[Long]("n_edges") == 3L)
    assert(s.getAs[Long]("assortativity_micro") == -1000000L, s.toString)
    // 4-cycle: every degree 2, zero variance -> defined as 0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val c = Components.assortativity(cyc).collect().head
    assert(c.getAs[Long]("assortativity_micro") == 0L, c.toString)
  }

  test("richClub: K4 core with pendants — density per threshold, empty club 0") {
    import spark.implicits._
    // K4 on 1..4 (each core vertex also carries one pendant -> deg 4)
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
      Seq((1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))
    val got = Components.richClub(k4.toDF("id_a", "id_b"), Seq(1L, 3L, 9L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // k=1: club = the 4 core vertices (deg 4 > 1), all 6 K4 edges inside
    assert(got(1L) == ((4L, 6L, 1000000L)), got.toString)
    // k=3: same club (pendants have deg 1)
    assert(got(3L) == ((4L, 6L, 1000000L)), got.toString)
    // k=9: nobody qualifies -> defined density 0
    assert(got(9L) == ((0L, 0L, 0L)), got.toString)
  }

  test("betweenness: path-graph dependencies match the Brandes recursion exactly") {
    import spark.implicits._
    // a(1)-b(2)-c(3)-d(4), seed {a}: δ(c)=σc·(u+δd)/σd=1e6, δ(b)=σb·(u+δc)/σc=2e6
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val got = Components.betweennessFromSeeds(pairs, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> ((2000000L, 1L)), 3L -> ((1000000L, 1L)),
      4L -> ((0L, 1L))), got.toString)
  }

  test("betweenness: diamond splits dependency by path counts (σ=2 floor)") {
    import spark.implicits._
    // a-b, a-c, b-d, c-d; seed a: σ(d)=2, δ(b)=⌊1·(1e6+0)/2⌋=500000=δ(c)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val got = Components.betweennessFromSeeds(pairs, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L), got.toString)
  }

  test("betweenness: multi-seed sums deltas; another seed is an ordinary node") {
    import spark.implicits._
    // path a-b-c with seeds {a, c}: from a, δ(b)=1e6 (endpoint c);
    // from c, δ(b)=1e6 (endpoint a) -> bc(b)=2e6 with n_seeds=2;
    // a and c each appear as the OTHER seed's endpoint with δ=0
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 3L).toDF("id")
    val got = Components.betweennessFromSeeds(pairs, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> ((2000000L, 2L)), 1L -> ((0L, 1L)),
      3L -> ((0L, 1L))), got.toString)
  }

  test("betweenness: both-orientation input does not double the path counts") {
    import spark.implicits._
    // same path graph as above but every edge delivered in BOTH
    // orientations — the canonicalize+distinct must collapse them, or
    // σ (which SUMS over edges, unlike the min-hop kernels) doubles
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val got = Components.betweennessFromSeeds(pairs, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> ((2000000L, 1L)), 3L -> ((1000000L, 1L)),
      4L -> ((0L, 1L))), got.toString)
  }

  test("betweenness matches a sequential Brandes replay on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(971203)
    val n = 26
    val edges = (for {
      u <- 1L to n.toLong; v <- (u + 1) to n.toLong
      if rnd.nextDouble() < 0.12
    } yield (u, v)).toVector
    val seedIds = Seq(1L, 7L, 13L)
    val maxHops = 3
    // plain sequential level-BFS + backward sweep with the SAME floor
    // arithmetic, so a join/visited-set bug in the distributed form
    // cannot hide behind hand-sized fixtures
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (s <- seedIds) {
      var levels = Vector(Map(s -> 1L)) // level -> node -> sigma
      var seen = Set(s)
      for (_ <- 1 to maxHops) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        for ((u, sig) <- levels.last; v <- adj(u) if !seen.contains(v))
          next(v) = next.getOrElse(v, 0L) + sig
        levels :+= next.toMap
        seen ++= next.keySet
      }
      var delta = levels.last.map { case (v, _) => v -> 0L }
      var out = delta.toSeq
      for (li <- (levels.size - 2) to 0 by -1) {
        val deeper = levels(li + 1)
        val d = levels(li).map { case (v, sv) =>
          v -> adj(v).filter(deeper.contains).toSeq.map { w =>
            (sv * (1000000L + delta(w))) / deeper(w)
          }.sum
        }
        out ++= d.toSeq
        delta = d
      }
      for ((v, dl) <- out if v != s) {
        val (b0, c0) = expected.getOrElse(v, (0L, 0L))
        expected(v) = (b0 + dl, c0 + 1L)
      }
    }
    val got = Components.betweennessFromSeeds(
        edges.toDF("id_a", "id_b"), seedIds.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected.toMap,
      (got.toSeq.sorted.take(8), expected.toSeq.sorted.take(8)).toString)
  }
}
