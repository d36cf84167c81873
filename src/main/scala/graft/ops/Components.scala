package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the clustering step
  * that turns near-duplicate *pairs* (MinHash/SimHash/embedding-cosine, see
  * [[Dedup]] / [[Similarity]]) into duplicate *clusters*, so a corpus keeps
  * exactly one representative per transitive group (reference behavior is
  * per-pair only; this is the standard completion for corpus-level dedup).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * a fixed small number of shuffles; convergence is O(log² n) rounds on
  * adversarial graphs and 2-4 rounds on real near-dup graphs — unlike
  * naive min-label propagation, which needs O(graph diameter) rounds and
  * dies on long chains at 100 TB scale.
  *
  * Scale mechanics:
  *  - iteration state is a plain edge DataFrame, `localCheckpoint`ed lazily
  *    each round so the convergence checksum's aggregate is the single
  *    action that both materializes the round and truncates lineage (on a
  *    real cluster: `checkpoint` to durable storage);
  *  - loop parallelism is sized from the *edge count*, not inherited from
  *    the (much wider) corpus scan that produced the pairs — a near-dup
  *    edge set is orders of magnitude smaller than the corpus, and paying
  *    the corpus's task count per round dominates small-graph runtimes;
  *  - convergence detection is an order-independent bit_xor checksum
  *    (overflow-free under ANSI mode), no driver-side data movement.
  */
object Components {

  /** Deterministic fixed-point PageRank over a directed edge list, in
    * integer micro-units (`unit` = mass 1.0): every contribution and
    * update is integer arithmetic — `pr div outdeg` per edge, damping
    * as the rational 17/20 — so per-node scores are EXACTLY
    * order-independent and engine-portable (the DuckDB oracle unrolls
    * the same iterations; float PageRank can never hash-match across
    * engines because the in-neighbor sum order differs). Runs a FIXED
    * `iters` iterations: rank use-cases (centrality ordering, cluster
    * hubs) stabilize in a few rounds, and a fixed count is what an
    * oracle can replay. Dangling nodes leak their mass (the standard
    * simplified variant) — total mass is not conserved, relative
    * ranking is unaffected.
    *
    * Scale shape per iteration: one join edges ⋈ ranks ⋈ outdeg
    * (shuffles keyed by src — outdeg reuses the ranks partitioning),
    * one aggregation keyed by dst with map-side combine. Iteration
    * state is `localCheckpoint`ed like the component loop. The single
    * `nodes.count()` action sizes the uniform prior. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && unit > 0, "need iters >= 1 and a positive unit")
    // materialize the (small) edge relation ONCE: it feeds the node set,
    // the out-degree aggregate, and every iteration's contribution join —
    // without the checkpoint each consumer re-executes the full upstream
    // pipeline that produced the edges (e.g. a complete MinHash pass
    // per iteration)
    // out-degree is loop-invariant: fold it into the edge relation ONCE
    // (and partition by src before the checkpoint, which preserves it) —
    // each iteration's contribution join then reads a src-partitioned
    // (src, dst, outdeg) relation with no per-iteration degree join and
    // no edge-side exchange; only the changing rank relation shuffles
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val e = e0
      .join(e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val u0 = unit / n
    val base = 3 * u0 / 20
    var pr = nodes.withColumn("pr", lit(u0))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20"))
            .as("pr"))
        .localCheckpoint(false)
    }
    pr
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) over a directed edge
    * relation, in exact integer micro-units: fixed `iters` rounds of
    *   auth(v) = Σ hub(u) over in-edges (u→v),
    *   hub(u)  = Σ auth(v) over out-edges (u→v),
    * each max-normalized to `unit` after its half-step
    * (`unit·x div max(x)` — integer division, so the trajectory replays
    * bit-identically in SQL; max-normalization replaces the float L2
    * norm for exactly that reason and preserves the ranking, which is
    * what HITS is consumed for). Nodes with no in-edges (pure hubs) get
    * authority 0, and vice versa — the coalesce keeps every node in
    * both relations.
    *
    * For link-structured corpora this is the hub/authority companion to
    * [[pageRank]]: crawl-frontier prioritization wants BOTH (a hub page
    * full of outlinks is a good frontier seed even with zero authority).
    *
    * Scale shape: the edge relation is checkpointed once and drives one
    * combine-agg join per half-step (shuffle keyed by dst then src);
    * the normalizing max is a one-row broadcast aggregate — never a
    * window. Normalization products ride DECIMAL(38,0): unit·Σhub wraps
    * a long once Σ over a node's in-neighbors passes ~9·10¹² micro —
    * i.e. in-degree ~9·10⁶ at full weight, real at web scale. */
  def hits(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      unit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && unit > 0, "need iters >= 1 and a positive unit")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      val m = raw.agg(max(col(valCol)).as("__m"))
      nodes.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"), expr(
          s"""CAST((CAST($unit AS DECIMAL(38,0)) *
             |  coalesce($valCol, CAST(0 AS BIGINT)))
             |  div greatest(__m, 1) AS BIGINT)""".stripMargin).as(valCol))
        .localCheckpoint(false)
    }
    var hub = nodes.withColumn("h", lit(unit))
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      auth = normalized(
        e.join(hub.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
          .withColumnRenamed("dst", "id"), "a")
      hub = normalized(
        e.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src")).agg(sum(col("a")).as("h"))
          .withColumnRenamed("src", "id"), "h")
    }
    hub.join(auth, Seq("id"))
      .select(col("id"), col("h").as("hub_micro"), col("a").as("auth_micro"))
  }

  /** Large-star: for every node u, link all strictly-larger neighbors to
    * the minimum of u's neighborhood (including u itself). Keeps every
    * edge's component connected while pointing big ids at small ids.
    * Output may contain duplicates — the next small-star dedups. */
  private def largeStar(edges: DataFrame, parts: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym.repartition(parts, col("src"))
      .groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"),
        collect_set(col("dst")).as("nbrs"))
      .select(col("m"), explode(col("nbrs")).as("v"), col("src"))
      .where(col("v") > col("src"))
      .select(col("v").as("src"), col("m").as("dst"))
  }

  /** Small-star: orient each edge (big, small); every big node links its
    * small neighbors (and itself) to the minimum among them. */
  private def smallStar(edges: DataFrame, parts: Int): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    oriented.repartition(parts, col("src"))
      .groupBy(col("src"))
      .agg(min(col("dst")).as("m"), collect_set(col("dst")).as("nbrs"))
      .select(col("m"), col("src"),
        explode(concat(col("nbrs"), array(col("src")))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .repartition(parts, col("src"), col("dst"))
      .dropDuplicates("src", "dst")
  }

  /** Order-independent checksum of an edge set (one scalar action).
    * bit_xor, not sum: xor never overflows under ANSI mode. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)),
      count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Rows-per-partition target for the iteration (edges are 16-byte pairs;
    * a few million rows per task keeps tasks ~100 MB and launch overhead
    * amortized). */
  private val RowsPerPartition = 4000000L

  /** Driver-side union-find finish for a contracted graph that fits in
    * driver memory (≤ smallGraphThreshold edges ≈ tens of MB). Replaces
    * O(log n) further distributed rounds — each a full shuffle cycle — with
    * one collect. Deterministic: the union rule keeps the minimum id as
    * root, so the result is the same partition the distributed fixpoint
    * yields. */
  private def localFinish(spark: SparkSession,
      edgeRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeRows.foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    import spark.implicits._
    parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "component")
  }

  /** Connected components of the undirected graph given by (srcCol, dstCol)
    * pairs. Returns one row per node that appears in any edge:
    * (id, component) with component = the minimum node id in the group.
    *
    * Self-loops are ignored; the input may contain duplicates either way
    * round. `maxIter` is a safety bound — the algorithm provably converges,
    * typically in < 5 rounds. `loopPartitions` overrides the edge-count
    * derived loop parallelism (0 = auto).
    */
  def connectedComponents(pairs: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 25,
      loopPartitions: Int = 0,
      smallGraphThreshold: Long = 1L << 21): DataFrame = {
    val spark = pairs.sparkSession
    var edges = pairs
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    // Small-graph fast path: ONE bounded action instead of the
    // checksum-job-then-collect-job sequence. limit(T+1) pulls at most
    // T+1 rows to the driver (a few tens of MB at the default threshold
    // — exactly what localFinish would have collected anyway); if the
    // whole edge set came back, union-find locally and skip the
    // distributed loop entirely. Oversized graphs pay one early-exit
    // partial scan and proceed through the normal fixpoint loop. Pair
    // graphs (near-dup output) are orders of magnitude smaller than the
    // corpus, so this is the common case — it halves the fixed job count
    // of every CC-consuming query.
    if (smallGraphThreshold <= (Int.MaxValue - 1).toLong) {
      val probe = edges.limit(smallGraphThreshold.toInt + 1).collect()
      if (probe.length <= smallGraphThreshold) return localFinish(spark, probe)
    }
    var prev = checksum(edges)
    val parts =
      if (loopPartitions > 0) loopPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (prev._2 / RowsPerPartition).toInt + 1))
    var converged = false
    var it = 0
    while (!converged && it < maxIter && prev._2 > smallGraphThreshold) {
      val next = smallStar(largeStar(edges, parts), parts).localCheckpoint(false)
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      edges = next
      it += 1
    }
    // Contracted below the driver threshold before reaching the fixpoint:
    // finish locally (components are unchanged by contraction rounds).
    // Only when the edge set actually shrank below the threshold — a loop
    // that exhausted maxIter with a still-large graph must fail, not
    // silently collect() an arbitrarily large edge set to the driver.
    if (!converged) {
      if (prev._2 <= smallGraphThreshold)
        return localFinish(spark, edges.collect())
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds with " +
          s"${prev._2} edges remaining (> smallGraphThreshold=" +
          s"$smallGraphThreshold); raise maxIter")
    }
    // Fixpoint is a star forest (Kiveris et al. Thm 1): every edge is
    // (member, root), members appear exactly once as src and never as dst,
    // roots only as dst. So components = member rows + one row per root.
    edges.select(col("src").as("id"), col("dst").as("component"))
      .unionAll(edges.select(col("dst").as("id"), col("dst").as("component")).distinct())
  }

  /** Cluster summary: one row per component with its size and id range. */
  def clusterSizes(components: DataFrame): DataFrame =
    components.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))

  /** Per-vertex triangle counts over an undirected graph — the local
    * clustering / community-density primitive (how clique-like is each
    * near-dup neighborhood?).
    *
    * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11;
    * the MapReduce form of Schank's forward algorithm). Every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one;
    * wedges are built by joining oriented edges on their shared SOURCE
    * and each wedge is closed by probing the oriented edge between its
    * two targets. Orientation caps out-degree at O(√m) — a celebrity
    * vertex with a million neighbors SOURCES almost no wedges because
    * nearly all its edges point INTO it — which is exactly the
    * curse-of-the-last-reducer fix; without it the hub's reducer would
    * enumerate ~deg² wedges. Each triangle is counted exactly once (its
    * vertices totally ordered by (degree, id); the wedge fixes the
    * minimum as source). Everything is equi-joins and counts —
    * deterministic, integer, engine-portable.
    *
    * Input: canonical undirected pairs (`aCol` < `bCol`); output one row
    * (id, n_tri) per vertex that participates in ≥ 1 triangle. */
  def triangleCounts(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    // materialize the edge set once: deg + ord both consume it, and the
    // upstream pair relation (typically a MinHash pipeline) is expensive
    val und = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"))
      .filter(col("u") < col("v")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val ord = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // The wedge stage does O(m^1.5) work off this relation with NO
    // exchange below it (broadcast joins preserve input partitioning),
    // so its partition count IS the stage's parallelism — and AQE
    // typically coalesces the small upstream join output to one
    // partition before the checkpoint, serializing the whole wedge
    // enumeration on one core (measured: 2.8 s single-task stage at
    // sf0.1). Repartition to compute parallelism first; the shuffle
    // moves only the m-row edge relation, negligible next to the wedge
    // work it parallelizes, and round-robin balances hub-heavy inputs.
    val edgeCount = und.count()
    val parts = math.max(
      und.sparkSession.sparkContext.defaultParallelism,
      (edgeCount / RowsPerPartition).toInt + 1)
    // three consumers (both wedge sides + the closing probe) — checkpoint
    // so the degree joins run once, not per consumer
    val oriented = ord.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"),
      when(fwd, col("dv")).otherwise(col("du")).as("dt"))
      .repartition(parts)
      .localCheckpoint()
    // localCheckpoint leaves the relation with unknown stats, so Catalyst
    // plans both wedge joins as SortMergeJoin — five exchanges + sorts on
    // the wedge path (O(m^1.5) rows). The edge relation is already
    // materialized, so its true size is one cached-RDD count away: when
    // the edges fit a broadcast (the wedge side never does — it's the
    // m^1.5 blowup), hint it and both joins become map-side hash probes.
    // Beyond the threshold the stats-blind SMJ is the right plan anyway.
    val orientedJ =
      if (edgeCount <= 4000000L) broadcast(oriented) else oriented
    val wedges = oriented.alias("o1")
      .join(orientedJ.alias("o2"), col("o1.s") === col("o2.s") &&
        (col("o1.dt") < col("o2.dt") ||
          (col("o1.dt") === col("o2.dt") && col("o1.t") < col("o2.t"))))
      .select(col("o1.s").as("a"), col("o1.t").as("b"), col("o2.t").as("c"))
    val tris = wedges.join(
      orientedJ.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara 2007, Phys. Rev. E 76) over an undirected graph,
    * made fully deterministic: every vertex starts labeled with its own
    * id, and each fixed iteration relabels every vertex with the most
    * frequent label among its neighbors, ties broken by the MINIMUM
    * label — no randomized vertex order, so the trajectory is
    * engine-replayable (the oracle unrolls the iterations, like
    * [[pageRank]]'s).
    *
    * The argmax-by-(count, min-label) is a single combine aggregate —
    * `max(struct(count, -label))` — not a per-vertex window, so each
    * iteration is exactly two shuffles (neighbor-label join keyed by
    * vertex, then the argmax agg). Edge state is lazily
    * `localCheckpoint`ed (no job until the first sweep consumes it) and
    * per-iteration label relations are checkpointed like the
    * connected-components loop.
    *
    * `iters` is the sweep BUDGET, not a fixed count: after each sweep an
    * order-independent label checksum (the CC loop's fixpoint trick)
    * stops the loop as soon as a sweep changed nothing. Synchronous LPA
    * at a fixpoint stays fixed — sweep(L) = L implies every later sweep
    * returns L — so early exit is result-identical to running the full
    * budget, and the unrolled oracle stays valid while deep community
    * structures can be given a large budget without plan blowup.
    *
    * Output: (id, community) for every non-isolated vertex. */
  def labelPropagation(pairs: DataFrame, iters: Int = 2,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    // checkpoint BEFORE the symmetrizing union (same double-evaluation
    // fence as kCore's: und feeds both union branches)
    val und = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(false)
    var prev = labelChecksum(labels)
    var converged = false
    var it = 0
    while (it < iters && !converged) {
      val cnt = edges
        .join(labels.select(col("id").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
      labels = cnt
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("id"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(false)
      val cur = labelChecksum(labels)
      converged = cur == prev
      prev = cur
      it += 1
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Newman modularity of a community assignment over an undirected
    * graph — the standard partition-quality score (Newman & Girvan 2004,
    * Phys. Rev. E 69: Q = Σ_c [e_c/m − (d_c/2m)²]), the companion eval
    * to [[labelPropagation]]: did the sweeps find real structure
    * (Q > 0) or noise (Q ≈ 0)?
    *
    * Exact integer form, per community:
    *   q_micro = unit·(4·m·e_c − d_c²) div (4·m²)
    * (the common-denominator form of the two terms), sign-split so
    * Spark's truncating `div` and DuckDB's flooring `//` agree when a
    * community is sparser than chance (negative numerator). Output one
    * row per community: (community, e_c, d_c, q_micro); Q itself is the
    * sum of q_micro — left to the consumer so the relation stays
    * per-community informative.
    *
    * Scale shape: canonical edges join the label relation twice (two
    * shuffles on node id), then everything is community-keyed
    * combine-aggs; m rides along as a one-row broadcast, no driver
    * action. Overflow envelope: unit·4·m² bounds m at ~1.5·10⁶ edges
    * for unit = 10⁶ — downshift the unit for denser graphs. */
  def modularity(pairs: DataFrame, communities: DataFrame,
      unit: Long = 1000000L, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val und = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    val lab = communities.select(col("id").cast("long").as("id"),
      col("community").cast("long").as("c"))
    val withC = und
      .join(lab.select(col("id").as("u"), col("c").as("cu")), Seq("u"))
      .join(lab.select(col("id").as("v"), col("c").as("cv")), Seq("v"))
      .localCheckpoint(false)
    val mRel = withC.agg(count(lit(1)).as("m"))
    val ec = withC.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("c")).agg(count(lit(1)).as("e_c"))
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, Seq("id"))
      .groupBy(col("c")).agg(sum(col("d")).as("d_c"))
    dc.join(ec, Seq("c"), "left")
      .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
      .crossJoin(broadcast(mRel))
      .withColumn("q_micro", expr(
        s"""CASE WHEN 4 * m * e_c - d_c * d_c < 0
           |THEN -((-($unit * (4 * m * e_c - d_c * d_c))) div (4 * m * m))
           |ELSE ($unit * (4 * m * e_c - d_c * d_c)) div (4 * m * m)
           |END""".stripMargin))
      .select(col("c").as("community"), col("e_c"), col("d_c"),
        col("q_micro"))
  }

  /** k-core of the undirected near-dup graph (Seidman 1983, "Network
    * structure and minimum degree") — the density filter that isolates
    * the heavily-duplicated kernel of a corpus (boilerplate families,
    * template farms): iteratively peel every vertex with degree < k
    * until a fixpoint; what survives is the maximal subgraph where
    * every member has ≥ k within-subgraph neighbors.
    *
    * Distributed peeling, two shuffles per sweep: degree = one
    * combine-agg over the symmetric edge relation, survivors semi-join
    * both endpoints back. `sweeps` is a BUDGET like
    * [[labelPropagation]]'s: peeling only shrinks the edge set, so an
    * unchanged edge COUNT (one scalar action per sweep, cheaper than a
    * checksum) certifies the fixpoint, and at a fixpoint every later
    * sweep is the identity — early exit is result-identical to the full
    * budget, which keeps the unrolled oracle valid.
    *
    * Output: (id, core_degree) for every vertex surviving the budget —
    * at convergence the true k-core with within-core degrees. */
  def kCore(pairs: DataFrame, k: Int, sweeps: Int = 5,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    require(k >= 1 && sweeps >= 1, "k and sweeps must be positive")
    // checkpoint BEFORE the symmetrizing union: und feeds both branches,
    // so an un-fenced upstream pair pipeline (e.g. the MinHash chain)
    // would run twice for one materialization
    val und = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    var edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var n = edges.count()
    var converged = false
    var it = 0
    while (it < sweeps && !converged) {
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("u"))
        .localCheckpoint(false) // consumed twice (both endpoints)
      edges = edges
        .join(keep, Seq("u"))
        .join(keep.select(col("u").as("v")), Seq("v"))
        .select(col("u"), col("v"))
        .localCheckpoint(false)
      val m = edges.count()
      converged = m == n
      n = m
      it += 1
    }
    edges.groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("id"), col("core_degree"))
  }

  /** k-truss decomposition by support peeling (Cohen 2008) — the
    * triangle-cohesion refinement of [[kCore]]: keep an edge only while
    * its SUPPORT (triangles through it) stays ≥ k−2, re-counting after
    * each peel. A k-truss is a strictly stronger community signal than
    * a k-core (every edge is reinforced by k−2 common neighbours;
    * bridges and stars that survive coring die here) — the near-dup
    * cluster-backbone extractor.
    *
    * Exact and deterministic: per sweep ONE wedge equi-join on the
    * symmetrized distinct edge relation (u-keyed fan-out, (v, w)-keyed
    * closure check — never a cartesian), an integer support count, and
    * an inner-join peel (an edge in no triangle has no support row and
    * drops, which is the k ≥ 3 semantics); `sweeps` bounds the rounds
    * with early convergence on a stable edge count, the [[kCore]]
    * discipline (per-sweep localCheckpoint, loud-free — peeling is
    * monotone so a sweep cap UNDER-peels, never corrupts; the fixpoint
    * is reached when the count stabilizes).
    *
    * Output: canonical (id_a < id_b) surviving edges with their final
    * recomputed support. */
  def kTruss(pairs: DataFrame, k: Int, sweeps: Int = 3,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    require(k >= 3 && sweeps >= 1, "need k >= 3 and sweeps >= 1")
    // canonicalize (least, greatest) BEFORE distinct — a directed input
    // carrying both orientations (mutual k-NN edges) would otherwise
    // duplicate after the symmetrizing union and double every wedge
    // count through it (the betweennessFromSeeds discipline)
    val und = pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("u"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    var edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    def support(e: DataFrame): DataFrame = e
      .join(e.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("w") =!= col("v"))
      .join(e.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"),
        "leftsemi")
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    var n = edges.count()
    var converged = false
    var it = 0
    while (it < sweeps && !converged) {
      edges = edges
        .join(support(edges).filter(col("support") >= (k - 2).toLong),
          Seq("u", "v"))
        .select(col("u"), col("v"))
        .localCheckpoint(false)
      val m = edges.count()
      converged = m == n
      n = m
      it += 1
    }
    support(edges)
      .filter(col("u") < col("v"))
      .select(col("u").as(aCol), col("v").as(bCol), col("support"))
  }

  /** Personalized PageRank (random walk with restart to the SEED set):
    * the teleport mass lands only on seeds — u0 = unit div |seeds| per
    * seed, zero elsewhere — so rank measures proximity-weighted
    * influence FROM the seeds rather than global centrality. The graded
    * companion to [[bfsHops]]: BFS gives hop distance, PPR gives
    * walk-probability mass (a doc two hops away through many short
    * paths outranks one two hops away through a single path) — the
    * standard contamination-influence / seed-expansion score.
    *
    * Same integer micro-unit discipline and per-iteration shape as
    * [[pageRank]] (one join + one combine-agg over checkpointed edges;
    * 17/20 damping, truncating div — bit-exact across engines, oracle
    * unrolls the same rounds). Non-seed sinks leak mass like the
    * uniform variant; scores are comparative, not a distribution. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "id", unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && unit > 0, "need iters >= 1 and a positive unit")
    // out-degree folded into the src-partitioned checkpointed edges
    // once (the [[pageRank]] r16 convention)
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val e = e0
      .join(e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
      .repartition(col("src"))
      .localCheckpoint()
    val sd = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .unionAll(sd.select(col("id"))).distinct()
      .join(sd.withColumn("__seed", lit(1)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(0)).as("__seed"))
      .localCheckpoint()
    val s = sd.count()
    require(s > 0, "empty seed set")
    val u0 = unit / s
    val base = 3 * u0 / 20
    var pr = nodes.withColumn("pr", col("__seed") * lit(u0))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("__seed"),
          (col("__seed") * lit(base) +
            expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")).as("pr"))
        .localCheckpoint(false)
    }
    pr.select(col("id"), col("pr"))
  }

  /** Bounded multi-source BFS: minimum hop distance (0..maxHops) from
    * any seed vertex, over the undirected pair relation. The
    * contamination-proximity primitive — "how many near-dup hops is
    * each document from a KNOWN-bad seed" — where a plain decontam
    * anti-join only removes direct hits, BFS depth grades the blast
    * radius (a doc two template-hops from leaked eval data is still
    * suspect).
    *
    * Frontier form: dist starts at 0 for seeds; each round joins the
    * CURRENT FRONTIER (vertices first reached last round — not the
    * whole reached set) against the edge relation and min-merges, so
    * round r's join is |frontier_r|·d̄ work, the textbook
    * level-synchronous BFS. maxHops bounds the loop (the oracle unrolls
    * the same rounds); each round is one equi-join + one combine-agg
    * min — two shuffles, no window, no driver state beyond the loop
    * counter. localCheckpoint fences each round's result from re-deriving
    * the upstream pair pipeline, same discipline as [[pageRank]].
    *
    * Output: (id, hops) for every vertex reached within maxHops —
    * unreached vertices are absent (not sentinel-valued), so the result
    * size is the reachable set, not the graph. */
  def bfsHops(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 3,
      aCol: String = "id_a", bCol: String = "id_b",
      seedCol: String = "id"): DataFrame = {
    require(maxHops >= 1, "maxHops must be positive")
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var dist = seeds.select(col(seedCol).cast("long").as("id"))
      .distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint(false)
    var frontier = dist
    var hop = 1
    while (hop <= maxHops) {
      val next = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(col("v").as("id"), lit(hop).as("hops"))
        .join(dist.select(col("id"), lit(1).as("__seen")), Seq("id"), "left")
        .filter(col("__seen").isNull)
        .select(col("id"), col("hops"))
        .distinct()
        .localCheckpoint(false)
      dist = dist.unionByName(next).localCheckpoint(false)
      frontier = next
      hop += 1
    }
    dist
  }

  /** Per-seed BFS distances — [[bfsHops]] keyed by (seed, node) so each
    * seed's OWN reach is preserved instead of min-merged across the
    * set. State and frontier rows are (seed, id) pairs: round r costs
    * Σ_seeds |frontier_r(seed)|·d̄ — linear in the per-seed reach, the
    * price of per-seed attribution. Same checkpointed level-synchronous
    * loop, same maxHops bound. */
  def perSeedBfs(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 3,
      aCol: String = "id_a", bCol: String = "id_b",
      seedCol: String = "id"): DataFrame = {
    require(maxHops >= 1, "maxHops must be positive")
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var dist = seeds.select(col(seedCol).cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("id"), lit(0).as("hops"))
      .localCheckpoint(false)
    var frontier = dist
    var hop = 1
    while (hop <= maxHops) {
      val next = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(col("seed"), col("v").as("id"), lit(hop).as("hops"))
        .join(dist.select(col("seed"), col("id"), lit(1).as("__seen")),
          Seq("seed", "id"), "left")
        .filter(col("__seen").isNull)
        .select(col("seed"), col("id"), col("hops"))
        .distinct()
        .localCheckpoint(false)
      dist = dist.unionByName(next).localCheckpoint(false)
      frontier = next
      hop += 1
    }
    dist
  }

  /** Bounded-distance Brandes betweenness from a seed (pivot) set —
    * the k-betweenness family of Brandes' variants paper ("On variants
    * of shortest-path betweenness centrality and their generic
    * computation", Social Networks 30, 2008): how much shortest-path
    * traffic from the pivots flows THROUGH each node, truncated at
    * `maxHops` (hop-3 neighborhoods carry nearly all the mass in
    * small-world graphs — the same truncation contract as
    * [[harmonicCentrality]], and what an unrolled oracle can replay).
    * Pivot sampling instead of all-sources is the standard production
    * estimator (Brandes–Pich 2007).
    *
    * Exact arithmetic: forward path counts σ are exact integers (sums
    * over predecessor σ along the level DAG); each backward dependency
    * term is floored ONCE — ⌊σ_v · (unit + δ_w) / σ_w⌋, non-negative
    * operands, so Spark `div` and DuckDB `//` agree — and δ sums the
    * terms (the floored-term quantization is the operator's definition,
    * same convention as [[graft.ops.Valuation.knnShapley]]).
    *
    * Scale shape: level-synchronous per-seed BFS — state rows are
    * (seed, node), so round r costs Σ_seeds |frontier_r|·d̄ exactly like
    * [[perSeedBfs]]; the backward sweep is one equi-join per level
    * (bounded by maxHops) between adjacent level relations. Everything
    * is checkpointed per level (bounded loop), nothing corpus-quadratic.
    *
    * Output: (id, bc_micro, n_seeds) over non-seed visited nodes —
    * boundary-level nodes carry δ = 0 but still report reach. */
  def betweennessFromSeeds(pairs: DataFrame, seeds: DataFrame,
      maxHops: Int = 3, unit: Long = 1000000L, aCol: String = "id_a",
      bCol: String = "id_b", seedCol: String = "id"): DataFrame = {
    require(maxHops >= 1 && unit > 0, "need maxHops >= 1 and unit > 0")
    // canonicalize (least, greatest) before distinct: σ SUMS over edges,
    // so an input carrying both orientations of a pair would double
    // every path count after symmetrization (the min-hop kernels are
    // immune; this one is not). localCheckpoint: `und` feeds both union
    // branches — without the fence the (often expensive) pair pipeline
    // upstream evaluates twice when `edges` materializes.
    val und = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    val edges = und
      .unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    val l0 = seeds.select(col(seedCol).cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("id"), lit(1L).as("sigma"))
      .localCheckpoint(false)
    // forward: per-level (seed, id, sigma), σ = Σ predecessor σ
    var levels = List(l0)
    var all = l0.select(col("seed"), col("id")).localCheckpoint(false)
    var frontier = l0
    for (_ <- 1 to maxHops) {
      val next = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(col("seed"), col("v").as("id"), col("sigma"))
        .join(all.withColumn("__seen", lit(1)), Seq("seed", "id"), "left")
        .filter(col("__seen").isNull)
        .groupBy(col("seed"), col("id")).agg(sum(col("sigma")).as("sigma"))
        .localCheckpoint(false)
      levels = next :: levels
      all = all.unionByName(next.select(col("seed"), col("id")))
        .localCheckpoint(false)
      frontier = next
    }
    // backward: δ = 0 at the truncation boundary, then one join per
    // level against the (deeper level ⋈ its δ) relation
    var deeper = levels.head
    var deltaNext = deeper.select(col("seed"), col("id"), lit(0L).as("delta"))
    var out = deltaNext
    for (lev <- levels.tail) {
      val down = deeper.join(deltaNext, Seq("seed", "id"))
        .select(col("seed"), col("id").as("v"), col("sigma").as("__sw"),
          col("delta").as("__dw"))
      val contrib = lev
        .join(edges, lev("id") === edges("u"))
        .select(col("seed"), lev("id"), col("sigma"), col("v"))
        .join(down, Seq("seed", "v"))
        .select(col("seed"), col("id"), expr(
          s"CAST((CAST(sigma AS DECIMAL(38,0)) * ($unit + __dw)) div __sw " +
            "AS BIGINT)").as("__c"))
        .groupBy(col("seed"), col("id")).agg(sum(col("__c")).as("delta"))
      val dFull = lev.select(col("seed"), col("id"))
        .join(contrib, Seq("seed", "id"), "left")
        .select(col("seed"), col("id"),
          coalesce(col("delta"), lit(0L)).as("delta"))
        .localCheckpoint(false)
      out = out.unionByName(dFull)
      deltaNext = dFull
      deeper = lev
    }
    out.filter(col("id") =!= col("seed"))
      .groupBy(col("id"))
      .agg(sum(col("delta")).as("bc_micro"), count(lit(1)).as("n_seeds"))
  }

  /** Truncated harmonic centrality (Boldi & Vigna 2014) of a seed set:
    * H(s) = Σ_{v ≠ s reachable within maxHops} unit div d(s, v) — the
    * influence readout that, unlike closeness, handles disconnected
    * graphs gracefully (unreachable nodes contribute 0, not ∞). The
    * maxHops truncation is the standard production form (hop-3
    * neighborhoods carry nearly all the mass in small-world graphs) and
    * is what an unrolled oracle can replay. Also reports the per-hop
    * reach counts. One combine-agg over [[perSeedBfs]]'s output. */
  def harmonicCentrality(pairs: DataFrame, seeds: DataFrame,
      maxHops: Int = 3, unit: Long = 1000000L, aCol: String = "id_a",
      bCol: String = "id_b", seedCol: String = "id"): DataFrame = {
    val agg = perSeedBfs(pairs, seeds, maxHops, aCol, bCol, seedCol)
      .filter(col("hops") >= 1)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr(s"$unit div hops")).as("harmonic_micro"))
    // An isolated seed reaches nothing: the hops>=1 filter removes its
    // hop-0 self row and the groupBy would then emit NO row for it.
    // "Unreachable contributes 0" must also hold for the seed itself —
    // left-join the aggregate back onto the distinct seed set so every
    // seed reports n_reached=0 / harmonic_micro=0 instead of vanishing.
    seeds.select(col(seedCol).cast("long").as("seed")).distinct()
      .join(agg, Seq("seed"), "left_outer")
      .select(col("seed"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"),
        coalesce(col("harmonic_micro"), lit(0L)).as("harmonic_micro"))
  }

  /** Degree distribution profile of an undirected graph: one row per
    * distinct degree with the vertex count — the power-law-tail /
    * celebrity-vertex triage that decides salting and
    * [[linkPrediction]]'s `maxCenterDegree` before any quadratic
    * operator runs. Two combine-aggs, degree-cardinality-sized out. */
  def degreeProfile(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_vertices"))
  }

  /** Degree assortativity coefficient (Newman 2002) of an undirected
    * graph — do hubs link hubs (r > 0, social graphs) or leaves
    * (r < 0, the web / most crawl graphs)? The sign decides whether
    * hub-guards ([[linkPrediction]]'s `maxCenterDegree`) bite on a few
    * celebrity vertices or on a correlated core.
    *
    * For a symmetric edge multiset (each undirected edge counted in
    * both orientations) Pearson's r over (deg_u, deg_v) pairs needs NO
    * square root: r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) since the two
    * marginals coincide — every term is an exact integer
    * (DECIMAL(38,0); (Σx)² wraps a long at ~3·10⁹ edge-endpoints), one
    * sign-split division at the end. Degenerate (regular) graphs with
    * zero variance report 0.
    *
    * Scale shape: degree agg + two endpoint joins + ONE one-row
    * combine-agg — no window, nothing pairwise beyond the edge list
    * itself. */
  def assortativity(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", unit: Long = 1000000L): DataFrame = {
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") < col("v")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
    sym.agg(count(lit(1)).as("__m"),
        sum(expr("CAST(du AS DECIMAL(38,0))")).as("__sx"),
        sum(expr("CAST(du AS DECIMAL(38,0)) * du")).as("__sxx"),
        sum(expr("CAST(du AS DECIMAL(38,0)) * dv")).as("__sxy"))
      .select(expr("__m div 2").as("n_edges"),
        expr(s"""CAST(CASE
          | WHEN __m * __sxx - __sx * __sx = 0 THEN 0
          | WHEN $unit * (__m * __sxy - __sx * __sx) < 0
          | THEN -((-($unit * (__m * __sxy - __sx * __sx)))
          |        div (__m * __sxx - __sx * __sx))
          | ELSE ($unit * (__m * __sxy - __sx * __sx))
          |      div (__m * __sxx - __sx * __sx)
          | END AS BIGINT)""".stripMargin).as("assortativity_micro"))
  }

  /** Rich-club profile (Colizza et al. 2006): for each degree threshold
    * k, how many vertices exceed it, how many edges run INSIDE that
    * club, and the club's edge density φ(k) = 2m / (n(n−1)) in micro
    * units — does the hub elite wire to itself (the hallmark of
    * citation/collaboration graphs) or scatter (crawl graphs)?
    * Complements [[assortativity]] (a single global r) with the
    * per-threshold curve.
    *
    * Scale shape: one degree agg; per threshold one filtered count of
    * the degree relation + one filtered count of the degree-annotated
    * edge relation — the thresholds relation is a |ks|-row broadcast
    * crossed against both, never a re-scan per k. Exact integers;
    * clubs of size < 2 report density 0. */
  def richClub(pairs: DataFrame, ks: Seq[Long],
      aCol: String = "id_a", bCol: String = "id_b",
      unit: Long = 1000000L): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0), "need non-negative thresholds")
    val spark = pairs.sparkSession
    import spark.implicits._
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") < col("v")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val kdf = broadcast(ks.distinct.sorted.toDF("k"))
    val nRich = deg.crossJoin(kdf)
      .filter(col("d") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_rich"))
    val edges = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
    val mRich = edges.crossJoin(kdf)
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("m_rich"))
    kdf
      .join(nRich, Seq("k"), "left")
      .join(mRich, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_rich"), lit(0L)).as("n_rich"),
        coalesce(col("m_rich"), lit(0L)).as("m_rich"))
      .withColumn("density_micro", expr(
        s"""CASE WHEN n_rich < 2 THEN CAST(0 AS BIGINT)
           | ELSE ($unit * 2 * m_rich) div (n_rich * (n_rich - 1))
           | END""".stripMargin))
  }

  /** Order-independent checksum of a label assignment (one scalar
    * action) — same xor-of-hashes form as the edge [[checksum]]. */
  private def labelChecksum(labels: DataFrame): (Long, Long) = {
    val r = labels.agg(
      coalesce(expr("bit_xor(xxhash64(id, lbl))"), lit(0L)),
      count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** [[weightedPageRank]] with IDENTICAL integer arithmetic (same pr
    * trajectory value-for-value, same oracle replay) but a fully LAZY
    * plan: node count, u0, and the damped base ride the plan as a
    * broadcast one-row aggregate instead of a driver `count()`, and
    * iterations chain without per-round localCheckpoints — only the
    * edge relation materializes (it feeds strength + every round).
    *
    * Use this for SMALL-DEPTH loops over graphs built inline by a
    * larger query (TextRank's per-doc sentence cliques): at iters ≤ 3
    * the lineage is shallow and the ~2·iters checkpoint/count driver
    * actions the eager kernel pays dominate its runtime on
    * sub-million-edge graphs (measured: text_textrank_sentences
    * 6.4 s → the edge-build cost alone with this kernel). For deep
    * loops or giant graphs keep [[weightedPageRank]]: checkpoints
    * bound lineage and re-execution there. Empty graphs yield an empty
    * result instead of the eager kernel's require-failure. */
  def weightedPageRankLazy(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "weight", unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && unit > 0, "need iters >= 1 and a positive unit")
    // strength folded into the (lazily checkpointed) edge relation once
    // — the eager kernels' r16 convention; saves a per-iteration join
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val e = e0
      .join(e0.groupBy(col("src")).agg(sum(col("w")).as("strength")),
        Seq("src"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    // u0 = unit div n and the damped base as plan-carried columns —
    // exactly the eager kernel's driver-side longs, per row
    val k = nodes.agg(count(lit(1)).as("__n"))
    var pr = nodes.crossJoin(broadcast(k))
      .select(col("id"), expr(s"CAST($unit AS BIGINT) div __n").as("pr"),
        col("__n"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("id"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * w) div strength AS BIGINT)")
            .as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = nodes.crossJoin(broadcast(k))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"(3 * (CAST($unit AS BIGINT) div __n)) div 20 " +
            "+ (17 * coalesce(s, CAST(0 AS BIGINT))) div 20").as("pr"),
          col("__n"))
    }
    pr.select(col("id"), col("pr"))
  }

  /** Edge-weighted PageRank — [[pageRank]] with contributions
    * proportional to edge weight: contrib(u→v) = (pr(u)·w) div
    * strength(u), strength = Σ out-weights. The natural rank for link
    * graphs that carry multiplicities (how many pages on host A link
    * host B) — unweighted rank treats a 1000-link neighbor like a
    * 1-link one. Parallel edges in the input are coalesced by summing
    * their weights. Same exact-integer discipline as [[pageRank]]
    * (damping 17/20, dangling mass leaks); the pr·w product rides
    * DECIMAL(38,0) — pr ≤ unit = 10¹² wraps a long at weight ~9·10⁶.
    *
    * Scale shape per iteration: identical to [[pageRank]] (one join +
    * combine-agg over the checkpointed weighted edges; strength reuses
    * the src keying). */
  def weightedPageRank(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "weight", unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && unit > 0, "need iters >= 1 and a positive unit")
    // strength is loop-invariant — folded into the src-partitioned
    // checkpointed edges once (the [[pageRank]] r16 convention)
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val e = e0
      .join(e0.groupBy(col("src")).agg(sum(col("w")).as("strength")),
        Seq("src"))
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val u0 = unit / n
    val base = 3 * u0 / 20
    var pr = nodes.withColumn("pr", lit(u0))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * w) div strength AS BIGINT)")
            .as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20"))
            .as("pr"))
        .localCheckpoint(false)
    }
    pr
  }

  /** Link prediction over an undirected graph: for every 2-hop pair that
    * is NOT already an edge, the four classic neighborhood scores
    * (Liben-Nowell & Kleinberg, CIKM'03) — common-neighbor count,
    * resource-allocation index (Zhou, Lü & Zhang 2009; the 1/deg variant
    * of Adamic–Adar whose terms are exactly rational, so it replays
    * bit-identically where Adamic–Adar's 1/log deg cannot), preferential
    * attachment deg(a)·deg(b), and Jaccard |N∩|/|N∪|. In crawl/corpus
    * pipelines this ranks which host or citation links to expect next —
    * the retrieval-augmentation companion to [[triangleCounts]].
    *
    * Integer contract: ra_micro = Σ_w (unit div deg(w)) and
    * jaccard_micro = (unit·cn) div (deg(a)+deg(b)−cn) — all floor
    * divisions over positive integers, engine-portable.
    *
    * Scale shape: wedges are built by joining the bidirectional
    * adjacency on its CENTER vertex, so a center of degree d emits
    * ~d²/2 candidate pairs — the same quadratic corner as all-pairs
    * similarity. `maxCenterDegree` guards it (one single-row aggregate
    * action): a celebrity hub beyond the bound makes the wedge join
    * explode on one reducer, and the fix at 100 TB is to EXCLUDE such
    * hubs from centering (they connect everything to everything and
    * carry no signal — the standard production mitigation) rather than
    * silently enumerate 10¹² pairs; this operator keeps exact semantics
    * and throws so the caller chooses. Everything else is equi-joins
    * with map-side-combined aggregation; the existing-edge exclusion is
    * a broadcast-friendly left-anti join on the pair key. */
  def linkPrediction(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", unit: Long = 1000000L,
      maxCenterDegree: Long = 100000L): DataFrame = {
    require(unit > 0 && maxCenterDegree > 0, "unit and degree bound > 0")
    val und = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") < col("v")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val dmax = deg.agg(coalesce(max(col("d")), lit(0L))).head().getLong(0)
    require(dmax <= maxCenterDegree,
      s"max degree $dmax exceeds maxCenterDegree=$maxCenterDegree: the " +
        "wedge join would enumerate ~d^2 candidate pairs per hub; drop " +
        "or cap hub vertices upstream, or raise the bound explicitly")
    // bidirectional adjacency keyed by the wedge CENTER w
    val adj = und.select(col("u").as("w"), col("v").as("t"))
      .unionAll(und.select(col("v").as("w"), col("u").as("t")))
      .join(deg.select(col("id").as("w"), col("d").as("dw")), Seq("w"))
      .localCheckpoint()
    val cand = adj.alias("l")
      .join(adj.alias("r"),
        col("l.w") === col("r.w") && col("l.t") < col("r.t"))
      .select(col("l.t").as("a"), col("r.t").as("b"),
        expr(s"$unit div l.dw").as("ra"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("ra")).as("ra_micro"))
      // 2-hop pairs only: drop pairs already connected directly
      .join(und.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a").as(aCol), col("b").as(bCol),
        col("common_neighbors"), col("ra_micro"),
        (col("da") * col("db")).as("pref_attach"),
        expr(s"($unit * common_neighbors) div (da + db - common_neighbors)")
          .as("jaccard_micro"))
  }
}
