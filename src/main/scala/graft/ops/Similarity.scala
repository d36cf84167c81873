package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{IvfIndex, IvfIndexMicro, PlaneSet, ProjMatrix}
import graft.functions.VectorFunctions.{vec_dot, nearest_cells, sign_lsh_bucket, vec_project, cos_micro, nearest_cells_micro}

/** Embedding similarity search over `ArrayType(FloatType)` columns
  * (SURVEY §2.10; the `embeddings` testdata table).
  *
  * All arithmetic promotes each element to double *before* multiplying and
  * accumulates left-to-right — per-row deterministic, engine-portable, and
  * still whole-stage-codegen'd (zip_with/aggregate are built-in higher-order
  * functions, no UDFs).
  *
  * Scale design: brute-force top-k is the exact baseline — a broadcast of
  * the (small) query set against an arbitrarily large corpus, no shuffle of
  * the corpus, TakeOrderedAndProject per query via a window. The scale path
  * is sign-LSH bucketing ([[signLshBucket]]): 2^p deterministic hyperplane
  * buckets prune the corpus ~2^p-fold before exact re-ranking; recall is
  * tunable with multi-probe (hamming-adjacent buckets).
  */
object Similarity {

  /** Σ aᵢ·bᵢ with per-element double promotion — a codegen'd custom
    * Catalyst expression ([[graft.functions.VecDot]]); the interpreted
    * zip_with/aggregate formulation computes the identical value ~100×
    * slower (per-element lambda dispatch). */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  /** Precomputed L2 norm — attach once per side before a pairwise join so
    * each candidate pair costs a single dot product, not three. */
  def norm(v: Column): Column = sqrt(vec_dot(v, v))

  /** cosine = dot / (||a|| * ||b||), written exactly like the oracle SQL. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbours for each query vector.
    *
    * @param queries (qidCol, vecCol) — small, broadcast side
    * @param corpus  (cidCol, vecCol) — large side, scanned once
    * @param roundTo decimal places to round similarity to before ranking
    *                (pins cross-engine float determinism; ties broken by id)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val sim = round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Recall@k of an approximate ranked neighbor list against the exact
    * one — THE standard ANN index-quality metric (what a FAISS/IVF
    * benchmark reports), computed in-engine so index-parameter sweeps
    * (nProbe, nPlanes, k·cells) can be evaluated on the cluster instead
    * of exporting result sets. Both inputs are (query_id, neighbor_id,
    * rank) relations, i.e. any of the `*TopK` operators' outputs; per
    * query, recall_micro = unit·|approx ∩ exact| div |exact ranks ≤ k|
    * — exact integer arithmetic, so the metric itself oracle-replays.
    *
    * Scale shape: one equi-join on (query_id, neighbor_id) between two
    * query-set-sized relations (≤ |Q|·k rows each — never corpus-sized),
    * then a per-query combine-agg. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
      unit: Long = 1000000L): DataFrame =
    exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .join(approx.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__k_eff"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        expr(s"($unit * n_hit) div __k_eff").as("recall_micro"))

  /** Exact nDCG@k (+ MRR of the true nearest neighbor) of an
    * approximate ranked neighbor list against the exact one — the
    * graded companion of [[recallAtK]] (recall ignores ORDER inside the
    * top-k; nDCG charges every displacement). Relevance is graded by
    * ground-truth rank (rel = k+1 − exact_rank, 0 outside the exact
    * top-k); discounts are the exact fixed-point log2
    * ([[graft.functions.ExactMicroOps.log2Micro]]), each term floored
    * ONCE as (rel·10⁹) div log2_micro(rank+1) — the per-term nano
    * quantization is the metric's pinned definition, making
    * dcg/idcg/ndcg bit-identical across engines.
    *
    * Scale shape: two query-set-sized inputs (≤ |Q|·k rows), one
    * equi-join, per-query combine-aggs — never corpus-sized. */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val ex = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (lit(k + 1L) - col("rank")).as("__rel"), col("rank").as("__exr"))
      .localCheckpoint(false) // feeds dcg, idcg, and the nn-rank probe
    val ap = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .localCheckpoint(false)
    val dcg = ap
      .join(ex.select(col("query_id"), col("neighbor_id"), col("__rel")),
        Seq("query_id", "neighbor_id"), "left")
      .withColumn("__l", lg(col("rank") + lit(1L)))
      .withColumn("__t",
        expr("(coalesce(__rel, 0L) * 1000000000L) div __l"))
      .groupBy(col("query_id")).agg(sum(col("__t")).as("dcg_nano"))
    val idcg = ex
      .withColumn("__l", lg(col("__exr") + lit(1L)))
      .withColumn("__t", expr("(__rel * 1000000000L) div __l"))
      .groupBy(col("query_id")).agg(sum(col("__t")).as("idcg_nano"))
    val nn = ex.filter(col("__exr") === 1L)
      .select(col("query_id"), col("neighbor_id"))
      .join(ap.select(col("query_id"), col("neighbor_id"),
        col("rank").as("__nr")), Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), coalesce(col("__nr"), lit(0L)).as("nn_rank"))
    dcg.join(idcg, Seq("query_id")).join(nn, Seq("query_id"))
      .select(col("query_id"), col("dcg_nano"), col("idcg_nano"),
        expr("(dcg_nano * 1000000L) div idcg_nano").as("ndcg_micro"),
        col("nn_rank"),
        expr("CASE WHEN nn_rank = 0 THEN 0L ELSE 1000000L div nn_rank END")
          .as("mrr_micro"))
  }

  /** Brute-force exact top-k on the BIT-EXACT integer-micro path
    * ([[bruteForceTopK]]'s engine-portable twin): micro-quantized
    * vectors, [[graft.functions.CosMicro]] sims, (sim desc, id) pinned
    * ranks — the ground-truth side of ANN/ranking evaluations whose
    * METRICS must replay exactly. Queries broadcast (bounded panel). */
  def bruteForceTopKMicro(queries: DataFrame, corpus: DataFrame, k: Int,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      microVec(col(vecCol)).as("__qvm")))
    val c = corpus.select(col(cidCol).as("neighbor_id"),
      microVec(col(vecCol)).as("__cvm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_micro", cos_micro(col("__qvm"), col("__cvm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim_micro"),
        col("rank"))
  }

  /** Milli-quantized integer vector — the coarse twin of [[microVec]]
    * (floor(x·10³)). The scale that keeps SIGN-PROJECTED dots inside
    * the double-exact 2⁵³ window: 64 summed ±milli components stay
    * ≤ ~1.3·10⁵ per projected coordinate, so projected norms² ≤ ~10¹²
    * and every oracle list_dot_product over them is exact. */
  def milliVec(v: Column): Column =
    transform(v.cast("array<double>"),
      x => floor(x * lit(1000.0d)).cast("long"))

  /** Brute-force top-k in the `outDim`-dimensional ±1 SIGN-PROJECTED
    * integer space ([[signMatrix]] planes over [[milliVec]] coords,
    * exact Long projection sums, [[graft.functions.CosMicro]] sims) —
    * the cheap JL ranking whose quality [[ndcgAtK]] audits against the
    * full-dimension cosine ground truth. Queries broadcast.
    *
    * The embedding length is CHECKED in-plan against `dim` (ADVICE
    * r13): zip_with null-pads the shorter side, so a mismatched corpus
    * would otherwise yield NULL projection sums and meaningless
    * rankings silently instead of failing loudly. */
  def bruteForceTopKSignProj(queries: DataFrame, corpus: DataFrame,
      k: Int, outDim: Int = 8, dim: Int = 64, seed: Long = 7L,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = signMatrix(outDim, dim, seed).map(_.map(_.toLong))
    def pv(c: Column): Column = {
      val m = when(size(c) === dim, milliVec(c)).otherwise(raise_error(
        concat(lit(s"bruteForceTopKSignProj: embedding length "),
          size(c).cast("string"),
          lit(s" != dim=$dim — zip_with would null-pad the projection"))))
      array(planes.map { row =>
        aggregate(zip_with(m, lit(row), (a, b) => a * b), lit(0L), _ + _)
      }: _*)
    }
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      pv(col(vecCol)).as("__qvm")))
    val c = corpus.select(col(cidCol).as("neighbor_id"),
      pv(col(vecCol)).as("__cvm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_micro", cos_micro(col("__qvm"), col("__cvm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim_micro"),
        col("rank"))
  }

  /** Brute-force top-k by RAW DOT PRODUCT over the same micro vectors —
    * the unnormalized ranking ([[bruteForceTopKMicro]] without the norm
    * division). Exists to audit metric mismatch: nDCG of this ranking
    * against the cosine ground truth quantifies exactly how much
    * skipping normalization costs on a given corpus. */
  def bruteForceTopKDotMicro(queries: DataFrame, corpus: DataFrame, k: Int,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qidCol).as("query_id"),
      microVec(col(vecCol)).as("__qvm")))
    val c = corpus.select(col(cidCol).as("neighbor_id"),
      microVec(col(vecCol)).as("__cvm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_micro").desc, col("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot_micro", expr(
        "aggregate(zip_with(__qvm, __cvm, (a, b) -> a * b), 0L, (s, x) -> s + x)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_micro"),
        col("rank"))
  }

  /** Seeded ±1 sign matrix (outDim × dim) for random projection —
    * deterministic; exposed within graft so oracle SQL embeds the same
    * constants. */
  private[graft] def signMatrix(outDim: Int, dim: Int,
      seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Johnson–Lindenstrauss sign random projection: reduce a dim-float
    * embedding to outDim doubles, out[j] = Σᵢ v[i]·s[j][i] with seeded
    * ±1 entries. Cosine is scale-invariant, so the conventional
    * 1/√outDim factor is omitted and every sum stays an exact
    * fixed-order fold (bit-stable, oracle-checkable). Map-only: the
    * matrix rides the plan as ONE reference object
    * ([[graft.functions.ProjMatrix]]) — plan and codegen are O(1) in
    * outDim × dim. The 100 TB use: project once, run ANN recall
    * experiments or coarse clustering in the reduced space at
    * outDim/dim of the I/O and FLOPs, verify winners with full-dim
    * cosine. */
  def randomProject(emb: DataFrame, outDim: Int, dim: Int,
      seed: Long = 7L, roundTo: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val m = new ProjMatrix(signMatrix(outDim, dim, seed).map(_.clone))
    emb.select(col(idCol),
      transform(vec_project(col(vecCol), m), x => round(x, roundTo))
        .as("proj"))
  }

  /** Deterministic hyperplanes for sign-LSH (seeded, reproducible across
    * runs and plan rebuilds — no RNG at execution time). Exposed within
    * graft so oracle SQL can be generated from the same constants. */
  private[graft] def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit p = sign(v · plane_p). Vectors in the same
    * bucket are cosine-close with high probability. The plane matrix rides
    * as ONE reference object ([[graft.functions.PlaneSet]]), not per-element
    * literals, so plan size is O(1) in nPlanes × dim. */
  def signLshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    sign_lsh_bucket(vec,
      new PlaneSet(planes(nPlanes, dim, seed).map(_.toArray).toArray))

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * (multi-probe: the exact bucket plus all hamming-1 neighbours), then
    * exact cosine re-ranking. The bucket equi-join replaces the cross
    * product — this is the 100 TB shape (shuffle by bucket, ~uniform);
    * probing 1+p of 2^p buckets trades recall for a ~2^p/(p+1) corpus
    * reduction. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 6, dim: Int = 64, multiProbe: Boolean = true,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    val qb = signLshBucket(col(vecCol), nPlanes, dim)
    val probeBuckets =
      if (multiProbe)
        array((qb +: (0 until nPlanes).map(i => qb.bitwiseXOR(lit(1L << i)))): _*)
      else array(qb)
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"), explode(probeBuckets).as("__qb"))
    val c = corpus.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"),
      signLshBucket(col(vecCol), nPlanes, dim).as("__cb"))
    val sim = round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("__qb") === col("__cb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** All-corpus k-nearest-neighbor GRAPH via sign-LSH blocking — the
    * input primitive of graph-based pipelines (SemDeDup-style cluster
    * pruning, kNN-graph community detection, mutual-kNN outlier
    * removal), where the `*TopK` operators answer external queries.
    *
    * Shape: every vector lands in its sign bucket once (map-only); the
    * probe side explodes to the exact bucket plus its hamming-1
    * neighbours (multiProbe, same recall trade as [[lshTopK]]); the
    * bucket EQUI-join replaces the corpus cross product; per-node top-k
    * is a window partitioned by the node — never global. A (q, c) pair
    * can match through at most one probe bucket (c has exactly one
    * bucket), so no dedup pass is needed.
    *
    * `maxBucket` is the hot-bucket guard ([[Dedup.capBuckets]], same
    * soundness argument as the MinHash band cap): a degenerate
    * boilerplate cluster would otherwise emit |bucket|² candidates.
    * 0 = unguarded exact bucket semantics (what the oracle mirrors). */
  def knnGraph(emb: DataFrame, k: Int, nPlanes: Int = 4, dim: Int = 64,
      multiProbe: Boolean = true, maxBucket: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"),
      signLshBucket(col(vecCol), nPlanes, dim).as("__b"))
    val cSide = Dedup.capBuckets(base, Seq("__b"), maxBucket)
    val probes =
      if (multiProbe)
        array((col("__b") +:
          (0 until nPlanes).map(i => col("__b").bitwiseXOR(lit(1L << i)))): _*)
      else array(col("__b"))
    val aSide = base.select(col("id").as("qid"), col("__v").as("__qv"),
      col("__n").as("__qn"), explode(probes).as("__b"))
    val sim = round(dot(col("__qv"), col("__v")) / (col("__qn") * col("__n")),
      roundTo)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    cSide.join(aSide, Seq("__b"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(idCol), col("id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** kNN in-degree outlier detection (ODIN; Hautamäki, Kärkkäinen &
    * Fränti, ICPR 2004): a vector that almost never appears in OTHER
    * vectors' k-nearest lists sits isolated in embedding space — the
    * mislabeled / off-distribution / garbage-encoding signal of an
    * embedding corpus, computed from the [[knnGraph]] relation alone.
    * Every vector gets a row: (id, in_degree, is_outlier ⇔ in_degree ≤
    * maxInDegree). One combine-agg on the graph (|V|·k rows) plus a
    * left back-join to restore zero-in-degree vectors — nothing
    * corpus-quadratic anywhere. */
  def knnInDegreeOutliers(emb: DataFrame, k: Int = 3, maxInDegree: Long = 1,
      nPlanes: Int = 4, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val indeg = knnGraph(emb, k, nPlanes, dim, idCol = idCol, vecCol = vecCol)
      .groupBy(col("neighbor_id").as(idCol))
      .agg(count(lit(1)).as("in_degree"))
    emb.select(col(idCol))
      .join(indeg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("is_outlier", col("in_degree") <= maxInDegree)
  }

  /** IVF coarse quantizer: every `every`-th vector by id, collected to the
    * driver (centroids are driver/broadcast material). Deterministic
    * selection stands in for k-means training; the IVF *plumbing* — tiny
    * centroid table, map-side cell assignment, probe-restricted re-rank —
    * is the part that matters for the scale shape and is identical.
    * Sorted by id for reproducible expression trees.
    *
    * The centroid COUNT is corpus_size / every, i.e. linear in the corpus
    * for a fixed `every` — callers must scale `every` with the data (or
    * k-means-train a fixed k). `maxCentroids` makes the mistake fail
    * loudly instead of silently collecting an unbounded set to the driver
    * and OOMing mid-broadcast. */
  def ivfCentroids(corpus: DataFrame, every: Long,
      cidCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = 1 << 17): Array[(Long, Array[Float])] = {
    val cents = corpus.filter(col(cidCol) % every === 0)
      .select(col(cidCol).cast("long"), col(vecCol))
      .limit(maxCentroids + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.length <= maxCentroids,
      s"ivfCentroids: more than $maxCentroids centroids at every=$every — " +
        "raise `every` in proportion to the corpus (or raise maxCentroids)")
    cents
  }

  /** Distributed Lloyd/k-means training of IVF centroids over an
    * `ArrayType(Float)` column — the production-quality replacement for the
    * [[ivfCentroids]] stride-sampling stand-in.
    *
    * 100 TB shape, per iteration:
    *  - ASSIGN: the same [[graft.functions.NearestCells]] reference-object
    *    pass as [[ivfTopK]] — map-only, the centroid matrix rides in the
    *    task binary, the corpus is scanned once and never shuffled.
    *  - UPDATE: `groupBy(cell)` with one codegen'd `sum` per dimension plus
    *    a count. Partial aggregation collapses each partition to ≤ k rows
    *    before the exchange, so the shuffle carries O(partitions × k × dim)
    *    doubles — never the corpus — and the ≤ k result rows collect to the
    *    driver as the next centroid matrix.
    *
    * Initialization is content-stable (the k lowest `md5(id)` rows), so the
    * same corpus always trains from the same seeds regardless of file order
    * or partitioning. Assignment uses cosine (norm-invariant), making this
    * spherical k-means; empty cells keep their previous centroid.
    *
    * Float-sum caveat: the per-dimension mean is a double sum in partition
    * order, so trained centroids are deterministic for a fixed partitioning
    * but not bit-identical across different partition layouts — train once,
    * persist, and query via [[ivfTopKWith]] when bit-stable results matter.
    */
  def trainIvfCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): Array[(Long, Array[Float])] = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    // The Lloyd loop scans the training input iters+1 times (seeding plus
    // one assignment pass per iteration). Persist the projected input for
    // the loop's lifetime — the standard MLlib-KMeans discipline — so the
    // upstream plan (scan, repartition, or a whole feature pipeline) runs
    // once, not once per iteration. The training input is a bounded
    // sample at scale (k-means training never runs over the full 100 TB
    // corpus), so MEMORY_AND_DISK is safe.
    val work = corpus.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = work
        .select(md5(col(idCol).cast("string")).as("__h"), col(vecCol))
        .orderBy(col("__h"))
        .limit(k)
        .collect()
        .map(_.getSeq[Float](1).toArray)
      require(seeds.nonEmpty, "empty corpus")
      val ids = seeds.indices.map(_.toLong).toArray
      val dim = seeds.head.length
      var cents = seeds
      for (_ <- 1 to iters) {
        val index = new IvfIndex(ids, cents, roundTo)
        val sums = (0 until dim).map(i =>
          sum(element_at(col("__v"), i + 1).cast("double")).as(s"__s$i"))
        val rows = work
          .select(col(vecCol).as("__v"))
          .withColumn("__cell", nearest_cells(col("__v"), index, 1).getItem(0))
          .groupBy(col("__cell"))
          .agg(count(lit(1)).as("__n"), sums: _*)
          .collect()
        val next = cents.map(_.clone())
        rows.foreach { r =>
          val cell = r.getLong(0).toInt
          val n = r.getLong(1).toDouble
          next(cell) = Array.tabulate(dim)(i => (r.getDouble(i + 2) / n).toFloat)
        }
        cents = next
      }
      ids.zip(cents)
    } finally work.unpersist(blocking = false)
  }

  /** [[trainIvfCentroids]] in EXACT integer micro-units — the
    * engine-portable (oracle-checkable) k-means: same spherical Lloyd
    * algorithm, same content-stable seeding, but centroid coordinates
    * are longs (element × 10⁶, floored) and every update is integer
    * arithmetic, so the trained centroids are bit-identical across
    * partitionings, cluster sizes, and engines — the same discipline as
    * [[graft.ops.Components.pageRank]] and [[meanPoolMicro]].
    *
    * Per iteration:
    *  - ASSIGN: rounded-cosine argmax against the micro-unit centroids
    *    (cosine is scale-invariant, so micro coordinates assign exactly
    *    like the micro/10⁶ means they encode) — map-only via the
    *    [[graft.functions.IvfIndex]] reference object, corpus never
    *    shuffled.
    *  - UPDATE: per (cell, dimension), an integer sum of the members'
    *    floor(element·10⁶) with the +10⁹ offset that keeps the dividend
    *    non-negative (truncating and flooring division agree there; the
    *    offset divides out exactly). Partial aggregation collapses each
    *    partition to ≤ k rows before the exchange; the ≤ k result rows
    *    collect to the driver, where the division happens in exact long
    *    arithmetic. Empty cells keep their previous centroid.
    *
    * Envelope: elements must satisfy |x| ≤ 10³ (offset bound) and cells
    * up to ~4.6·10⁹ members (long sum headroom at the offset); no
    * all-zero vectors (NaN cosine ordering is not engine-portable — see
    * [[graft.functions.IvfIndex]]). */
  def trainIvfCentroidsMicro(corpus: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): Array[(Long, Array[Long])] = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val offset = 1000000000L
    val seeds = corpus
      .select(md5(col(idCol).cast("string")).as("__h"), col(vecCol))
      .orderBy(col("__h"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(seeds.nonEmpty, "empty corpus")
    val ids = seeds.indices.map(_.toLong).toArray
    val dim = seeds.head.length
    var cents: Array[Array[Long]] =
      seeds.map(_.map(x => math.floor(x.toDouble * 1000000.0).toLong))
    if (iters == 0) return ids.zip(cents)
    // The Lloyd loop is the MLlib-KMeans shape: cache the raw vectors
    // once, then each iteration is ONE shuffle-free job — per-partition
    // integer partial sums (assignment via the SAME [[IvfIndex]] kernel
    // the SQL expression uses, element quantization via the same
    // floor(x·10⁶) double arithmetic) merged on the driver. Long
    // addition is associative, so the merged totals — and therefore the
    // trained centroids — are bit-identical to the previous partial/
    // final SQL aggregate, partition-layout-independent, and still
    // exactly what the DuckDB oracle replays. The k·dim partial state
    // per partition is the only thing collected (k ≤ ~10⁵ at scale);
    // training inputs are bounded samples, so the cache is safe.
    // toRdd + toFloatArray: primitive copy out of the columnar scan —
    // the external .rdd route materializes each vector as a boxed
    // Seq[Float] first (dim boxed floats per row), which dominated the
    // cache-build job. toFloatArray copies, so persisting the arrays is
    // safe despite the reused InternalRow.
    val vecs = corpus.select(col(vecCol)).queryExecution.toRdd
      .map(_.getArray(0).toFloatArray())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        val index = IvfIndex.fromMicro(ids, cents, roundTo)
        val partials = vecs.mapPartitions { it =>
          val cnt = new Array[Long](k)
          val sums = Array.ofDim[Long](k, dim)
          it.foreach { v =>
            val ad = org.apache.spark.sql.catalyst.expressions
              .UnsafeArrayData.fromPrimitiveArray(v)
            val cell = index.nearestCells(ad, 1).getLong(0).toInt
            cnt(cell) += 1L
            val row = sums(cell)
            var i = 0
            while (i < dim) {
              row(i) += math.floor(v(i).toDouble * 1000000.0).toLong + offset
              i += 1
            }
          }
          Iterator.single((cnt, sums))
        }.collect()
        val cnt = new Array[Long](k)
        val sums = Array.ofDim[Long](k, dim)
        partials.foreach { case (pc, ps) =>
          var c = 0
          while (c < k) {
            cnt(c) += pc(c)
            var i = 0
            while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
            c += 1
          }
        }
        val next = cents.map(_.clone())
        var c = 0
        while (c < k) {
          // empty cells keep their previous centroid; dividend
          // non-negative by the offset -> truncation == floor
          if (cnt(c) > 0L)
            next(c) = Array.tabulate(dim)(i => sums(c)(i) / cnt(c) - offset)
          c += 1
        }
        cents = next
      }
      ids.zip(cents)
    } finally vecs.unpersist(blocking = false)
  }

  /** Mean cosine distance (1 − cos) of every corpus vector to its assigned
    * centroid — the training objective, for convergence monitoring. */
  def ivfInertia(corpus: DataFrame, cents: Array[(Long, Array[Float])],
      vecCol: String = "embedding", roundTo: Int = 6): Double = {
    val index = new IvfIndex(cents.map(_._1), cents.map(_._2), roundTo)
    val centDf = broadcast(
      corpus.sparkSession.createDataFrame(
        cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      ).toDF("__cell", "__cv"))
    corpus
      .select(col(vecCol).as("__v"))
      .withColumn("__cell", nearest_cells(col("__v"), index, 1).getItem(0))
      .join(centDf, "__cell")
      .agg(avg(lit(1.0) - cosine(col("__v"), col("__cv"))))
      .head().getDouble(0)
  }

  /** Approximate top-k via IVF (inverted file index): assign every corpus
    * vector to its nearest centroid cell in a single map-only pass, probe
    * the query's `nProbe` nearest cells, re-rank exactly inside them.
    *
    * 100 TB shape: the centroid set is broadcast (never shuffled), cell
    * assignment is embarrassingly parallel, and the candidate join is a
    * broadcast equi-join on cell id — the corpus is scanned once and only
    * ~nProbe/nCells of it pays the exact re-rank. Complements [[lshTopK]]
    * (data-independent hyperplanes) with a data-dependent partitioner.
    *
    * Cell assignment is [[graft.functions.NearestCells]] over a
    * driver-built [[graft.functions.IvfIndex]]: the centroid matrix is one
    * reference object in the plan (NOT per-element literals), so 100k
    * centroids cost the same plan/codegen size as 10 — the assignment
    * kernel is a tight generated-code loop, O(cells × dim) per row with
    * zero allocation beyond the top-N id array. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int = 3,
      centroidEvery: Long = 50, qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    val cents = ivfCentroids(corpus, centroidEvery, cidCol, vecCol)
    require(cents.nonEmpty, s"no centroids: no $cidCol divisible by $centroidEvery")
    ivfTopKWith(queries, corpus, cents, k, nProbe, qidCol, cidCol, vecCol, roundTo)
  }

  /** [[ivfTopK]] against an explicit centroid set — e.g. one trained with
    * [[trainIvfCentroids]] or loaded from a previous run. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame,
      cents: Array[(Long, Array[Float])], k: Int, nProbe: Int = 3,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame =
    ivfTopKIndexed(queries, corpus,
      new IvfIndex(cents.map(_._1), cents.map(_._2), roundTo),
      k, nProbe, qidCol, cidCol, vecCol, roundTo)

  /** [[ivfTopKWith]] over integer micro-unit centroids
    * ([[trainIvfCentroidsMicro]] /
    * [[graft.sources.Artifacts.loadCentroidsMicro]]) — the fully
    * oracle-exact trained-IVF serve path. */
  def ivfTopKWithMicro(queries: DataFrame, corpus: DataFrame,
      cents: Array[(Long, Array[Long])], k: Int, nProbe: Int = 3,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame =
    ivfTopKIndexed(queries, corpus,
      IvfIndex.fromMicro(cents.map(_._1), cents.map(_._2), roundTo),
      k, nProbe, qidCol, cidCol, vecCol, roundTo)

  private def ivfTopKIndexed(queries: DataFrame, corpus: DataFrame,
      index: IvfIndex, k: Int, nProbe: Int,
      qidCol: String, cidCol: String, vecCol: String,
      roundTo: Int, broadcastQueries: Boolean = true): DataFrame = {
    val c = corpus.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .withColumn("__cell", nearest_cells(col("__cv"), index, 1).getItem(0))
    val q0 = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
      .withColumn("__probe", explode(nearest_cells(col("__qv"), index, nProbe)))
    // Broadcast is right when the query set is a bounded probe catalog;
    // for corpus×corpus workloads (full kNN graphs, bitext mining) the
    // query side is corpus-sized and must SHUFFLE by cell instead —
    // same rows out, the join just rendezvouses on the cell key with
    // both sides partitioned (shuffle-hash hint keeps the planner from
    // attempting a broadcast it would have to spill).
    val q = if (broadcastQueries) broadcast(q0) else q0.hint("shuffle_hash")
    val sim = round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(q,
        col("__probe") === col("__cell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** [[ivfTopKWithMicro]] WITHOUT the query-side broadcast: both sides
    * rendezvous shuffled on the cell key — the corpus×corpus regime
    * (full kNN graphs, symmetric bitext mining) where the query set is
    * itself corpus-sized and a broadcast would not fit. Identical rows
    * to the broadcast form (asserted in SimilaritySpec); only the
    * exchange strategy differs. */
  def ivfTopKShuffledMicro(queries: DataFrame, corpus: DataFrame,
      cents: Array[(Long, Array[Long])], k: Int, nProbe: Int = 3,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame =
    ivfTopKIndexed(queries, corpus,
      IvfIndex.fromMicro(cents.map(_._1), cents.map(_._2), roundTo),
      k, nProbe, qidCol, cidCol, vecCol, roundTo, broadcastQueries = false)

  /** Quantize an ARRAY<FLOAT> embedding column to integer micro units —
    * element mᵢ = floor(xᵢ·10⁶) as BIGINT, the repo-wide quantization a
    * SQL oracle replays with
    * `list_transform(CAST(v AS DOUBLE[]), x -> CAST(floor(x*1000000.0) AS BIGINT))`.
    * The float→double promotion and the double multiply are
    * IEEE-deterministic, so both engines produce identical integers.
    * One map-only pass; everything downstream of it is exact integer
    * arithmetic ([[graft.functions.ExactMicroOps]]). */
  def microVec(v: Column): Column =
    transform(v.cast("array<double>"),
      x => floor(x * lit(1000000.0d)).cast("long"))

  /** Driver-side twin of [[microVec]] for a collected centroid set —
    * the same floor(x·10⁶) arithmetic, element for element. */
  def quantizeMicro(cents: Array[(Long, Array[Float])]): Array[(Long, Array[Long])] =
    cents.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000.0d).toLong))
    }

  /** BIT-EXACT integer-micro IVF top-k — [[ivfTopKWith]] with every float
    * removed from the similarity contract: vectors quantized once by
    * [[microVec]], cell assignment by
    * [[graft.functions.NearestCellsMicro]] (exact-integer argmax, no
    * rounding band), candidate sims by [[graft.functions.CosMicro]]
    * (trunc(dot·10⁶ / isqrt(na·nb)), order-free integer arithmetic).
    * Output sims are `sim_micro` longs a DuckDB oracle replays to the
    * bit on ANY build — the migration target for every query whose
    * round(double, 6) replay sat one accumulation-order ulp away from a
    * half-way boundary (VERDICT r11 item 1).
    *
    * Same 100 TB shape as [[ivfTopKWith]]: broadcast centroids, map-only
    * assignment, one equi-join on the cell key (broadcast query side for
    * probe catalogs, shuffle-hash rendezvous for corpus×corpus — flip
    * `broadcastQueries`). */
  def ivfTopKExact(queries: DataFrame, corpus: DataFrame,
      cents: Array[(Long, Array[Long])], k: Int, nProbe: Int = 3,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", broadcastQueries: Boolean = true): DataFrame =
    ivfTopKIndexedExact(queries, corpus,
      new IvfIndexMicro(cents.map(_._1), cents.map(_._2)),
      k, nProbe, qidCol, cidCol, vecCol, broadcastQueries)

  private def ivfTopKIndexedExact(queries: DataFrame, corpus: DataFrame,
      index: IvfIndexMicro, k: Int, nProbe: Int,
      qidCol: String, cidCol: String, vecCol: String,
      broadcastQueries: Boolean): DataFrame = {
    val c = corpus.select(col(cidCol).as("neighbor_id"),
        microVec(col(vecCol)).as("__cvm"))
      .withColumn("__cell", nearest_cells_micro(col("__cvm"), index, 1).getItem(0))
    val q0 = queries.select(col(qidCol).as("query_id"),
        microVec(col(vecCol)).as("__qvm"))
      .withColumn("__probe", explode(nearest_cells_micro(col("__qvm"), index, nProbe)))
    val q = if (broadcastQueries) broadcast(q0) else q0.hint("shuffle_hash")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    c.join(q,
        col("__probe") === col("__cell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_micro", cos_micro(col("__qvm"), col("__cvm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim_micro"), col("rank"))
  }

  /** Offset that keeps integer-mean dividends non-negative (truncating
    * and flooring division agree there) — the [[trainIvfCentroidsMicro]]
    * convention, shared by the incremental-index state below. */
  private val MeanOffset = 1000000000L

  private def stateWithCentroid(grouped: DataFrame): DataFrame =
    grouped.select(col("cell"), col("dim_idx"), col("n_vecs"),
      col("sum_micro"),
      expr(s"(sum_micro + n_vecs * ${MeanOffset}L) div n_vecs - ${MeanOffset}L")
        .as("centroid_micro"))

  private def stateDelta(emb: DataFrame, index: graft.functions.IvfIndexMicro,
      vecCol: String): DataFrame =
    emb.select(microVec(col(vecCol)).as("__vm"))
      .withColumn("cell",
        nearest_cells_micro(col("__vm"), index, 1).getItem(0))
      .select(col("cell"), posexplode(col("__vm")).as(Seq("dim_idx", "__x")))
      .select(col("cell"), col("dim_idx").cast("long").as("dim_idx"),
        col("__x"))
      .groupBy("cell", "dim_idx")
      .agg(count(lit(1)).as("n_vecs"), sum(col("__x")).as("sum_micro"))

  /** INCREMENTAL IVF index maintenance (VERDICT r11 item 7) — the state
    * relation that lets a served similarity index absorb corpus growth
    * without retraining from scratch.
    *
    * State = one row per (cell, dimension): member count, the EXACT
    * integer sum of the members' floor(x·10⁶) micro elements, and the
    * integer-mean centroid those imply. Everything is integer micro
    * arithmetic on the bit-exact path ([[microVec]] quantization,
    * [[graft.functions.NearestCellsMicro]] assignment), so the state is
    * oracle-replayable, partition-order-independent, and — the point —
    * EXACTLY MERGEABLE: sums and counts are associative, so
    * [[extendIvfIndexState]] over any split of the corpus equals this
    * function over the union, bit for bit (pinned by the
    * sim_ivf_incremental oracle, which replays the one-shot computation
    * against Spark's base+extension composition).
    *
    * 100 TB shape: map-only quantization+assignment against the
    * broadcast [[graft.functions.IvfIndexMicro]] reference object, then
    * ONE aggregate whose partial (map-side) combine collapses each
    * partition to ≤ cells·dim rows before the exchange — the shuffle
    * carries O(partitions · cells · dim) longs, never the corpus.
    * Composes with the fingerprint-ledger incremental pattern
    * ([[Dedup.fingerprintLedger]]): the ledger tells you WHICH rows are
    * new since the last snapshot; this state absorbs exactly those.
    *
    * Cells with no members have no rows (an extension can introduce
    * them); `centroid_micro` is the running integer mean, NOT the
    * training-time centroid — serve assignment keeps using the trained
    * `cents` until [[ivfRetrainAdvice]] says the drift/skew warrants a
    * retrain. */
  def ivfIndexState(emb: DataFrame, cents: Array[(Long, Array[Long])],
      vecCol: String = "embedding"): DataFrame =
    stateWithCentroid(stateDelta(emb,
      new graft.functions.IvfIndexMicro(cents.map(_._1), cents.map(_._2)),
      vecCol))

  /** Absorb new embeddings into an existing [[ivfIndexState]]: assign
    * the new rows against the SAME trained centroid set, then merge by
    * integer addition — exact, associative, idempotent-free (call once
    * per batch of genuinely-new rows; pair with the fingerprint ledger
    * to establish "new"). Equals [[ivfIndexState]] over the unioned
    * corpus bit-for-bit. */
  def extendIvfIndexState(state: DataFrame, newEmb: DataFrame,
      cents: Array[(Long, Array[Long])],
      vecCol: String = "embedding"): DataFrame = {
    val delta = stateDelta(newEmb,
      new graft.functions.IvfIndexMicro(cents.map(_._1), cents.map(_._2)),
      vecCol)
    stateWithCentroid(
      state.select(col("cell"), col("dim_idx"), col("n_vecs"), col("sum_micro"))
        .unionByName(delta)
        .groupBy("cell", "dim_idx")
        .agg(sum(col("n_vecs")).as("n_vecs"),
          sum(col("sum_micro")).as("sum_micro")))
  }

  /** The documented re-train trigger over an [[ivfIndexState]]: per-cell
    * load relative to the mean cell (10⁶ = exactly mean), flagged when a
    * cell exceeds `skewBoundMicro` (default 4× mean — the FAISS-style
    * imbalance bound: a cell holding 4× its share makes its probes 4×
    * as expensive and signals the trained quantizer no longer fits the
    * data distribution). All integer arithmetic — replayable. */
  def ivfRetrainAdvice(state: DataFrame,
      skewBoundMicro: Long = 4000000L): DataFrame = {
    val perCell = state.filter(col("dim_idx") === 0)
      .select(col("cell"), col("n_vecs"))
    val tot = perCell.agg(sum(col("n_vecs")).as("__t"),
      count(lit(1)).as("__c"))
    perCell.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        expr("(n_vecs * __c * 1000000) div greatest(__t, 1)")
          .as("load_micro"))
      .withColumn("needs_retrain", col("load_micro") > skewBoundMicro)
  }

  /** Round-half boundary-margin audit for rounded-double score contracts
    * (VERDICT r11 item 2). For every value x in `scores` (column `x`,
    * DOUBLE), the distance of x·10^roundTo to the nearest half-way
    * rounding point, i.e. |frac(x·10^roundTo) − 0.5| — returned as the
    * MINIMUM over the relation, in units of 10^-roundTo.
    *
    * Why: a `round(x, 6)` replayed by two engines diverges only when
    * their x values straddle a half-way boundary. Left-to-right vs SIMD
    * pairwise accumulation of a 64-term double dot product differs by at
    * most ~dim·ε ≈ 1.4e-14 (1.4e-8 in these units). If the minimum
    * margin of every score a query computes exceeds a budget orders of
    * magnitude above that — the repo bar is 2⁻⁴⁰ ≈ 9.1e-13 cosine units,
    * 9.1e-7 in these units — then no faithful-double engine can flip a
    * rounding, and "passes on this DuckDB build" becomes "passes on
    * every build" FOR THE ACCUMULATION-ORDER DIVERGENCE CLASS. (It does
    * NOT defend against an engine whose round() itself differs at the
    * last ulp of the *rounded* value — the structural fix for that class
    * is the integer-micro path, as migrated for sim_bitext_mine.)
    *
    * Production shape: one narrow map + one min aggregate over however
    * many scores the caller materializes; at 100 TB you audit the same
    * candidate relations the queries build (bounded by top-k joins),
    * never a blind cross product. BoundaryMarginSpec runs it over the
    * full pairwise fixture surface that every registry cosine is drawn
    * from. */
  def roundHalfMarginMin(scores: DataFrame, roundTo: Int = 6): Double = {
    val scale = math.pow(10.0, roundTo)
    scores
      .select((col("x") * scale).as("__s"))
      .select(abs(col("__s") - floor(col("__s")) - lit(0.5)).as("__m"))
      .agg(min(col("__m"))).head().getDouble(0)
  }

  /** All pairwise cosines of a corpus (a < b), as the `x` relation
    * [[roundHalfMarginMin]] audits. Broadcast self-join — an audit over
    * a bounded fixture/sample, documented as such (the registry's own
    * candidate relations are the production audit surface). */
  def pairwiseCosines(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("__ia"), col(vecCol).as("__va"),
      norm(col(vecCol)).as("__na"))
    val b = emb.select(col(idCol).as("__ib"), col(vecCol).as("__vb"),
      norm(col(vecCol)).as("__nb"))
    a.join(broadcast(b), col("__ia") < col("__ib"))
      .select((dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
        .as("x"))
  }

  /** Cosines of every corpus vector against an explicit micro-unit
    * centroid set — the assignment scores a trained-kmeans oracle
    * replays with round(cos, 6); the other audit surface. */
  def centroidCosines(emb: DataFrame, cents: Array[(Long, Array[Long])],
      vecCol: String = "embedding"): DataFrame = {
    val centDf = broadcast(
      emb.sparkSession.createDataFrame(
        cents.toSeq.map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
      ).toDF("__cell", "__cv"))
    emb.select(col(vecCol).as("__v"), norm(col(vecCol)).as("__n"))
      .crossJoin(centDf)
      .select((dot(col("__v"), col("__cv")) /
        (col("__n") * sqrt(dot(col("__cv"), col("__cv"))))).as("x"))
  }

  /** Map-only nearest-centroid cell assignment against an explicit
    * centroid set (e.g. one loaded from [[graft.sources.Artifacts]]) —
    * the serve half of the train-once/reuse-everywhere flow. The
    * centroid matrix rides the plan as one [[graft.functions.IvfIndex]]
    * reference object; the corpus is scanned once, never shuffled. */
  def assignCells(emb: DataFrame, cents: Array[(Long, Array[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame =
    assignCellsIndexed(emb,
      new IvfIndex(cents.map(_._1), cents.map(_._2), roundTo), idCol, vecCol)

  /** [[assignCells]] over integer micro-unit centroids — serve half of
    * the oracle-exact [[trainIvfCentroidsMicro]] flow. */
  def assignCellsMicro(emb: DataFrame, cents: Array[(Long, Array[Long])],
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6): DataFrame =
    assignCellsIndexed(emb,
      IvfIndex.fromMicro(cents.map(_._1), cents.map(_._2), roundTo),
      idCol, vecCol)

  private def assignCellsIndexed(emb: DataFrame, index: IvfIndex,
      idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol),
      nearest_cells(col(vecCol), index, 1).getItem(0).as("cell"))

  /** All pairs with cosine above a threshold (embedding near-dup detection).
    *
    * The DEFAULT is the bucket-blocked form: a sign-LSH equi-join that
    * shuffles by bucket and never materializes the cross product — the
    * only shape that survives a 100 TB corpus. `blockByBucket = false`
    * opts into the exact O(n²) BNLJ baseline, for small slices and for
    * recall measurement only. */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockByBucket: Boolean = true, nPlanes: Int = 4, dim: Int = 64,
      roundTo: Int = 6): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      norm(col(vecCol)).as("__na")).alias("a")
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      norm(col(vecCol)).as("__nb")).alias("b")
    val base =
      if (blockByBucket) {
        val ab = a.withColumn("__ba", signLshBucket(col("__va"), nPlanes, dim))
        val bb = b.withColumn("__bb", signLshBucket(col("__vb"), nPlanes, dim))
        ab.join(bb, col("id_a") < col("id_b") && col("__ba") === col("__bb"))
      } else a.join(b, col("id_a") < col("id_b"))
    base
      .withColumn("sim",
        round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Int8 scalar quantization of float embeddings — the 4× storage cut
    * that makes a 100 TB embedding store a 25 TB one: per vector,
    * scale = max|v|/127 and q[i] = round(v[i]/scale) ∈ [-127, 127].
    * Map-only, per-row arithmetic in fixed order (oracle-exact); the
    * all-zero vector quantizes to scale 0 with zero codes. Reconstruct
    * with [[dequantizeInt8]]; reconstruction error is ≤ scale/2 per
    * element — re-rank survivors with full-precision vectors. */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val amax = array_max(transform(col(vecCol), x => abs(x)))
    emb
      .withColumn("scale",
        when(amax === 0f, lit(0.0)).otherwise(amax / lit(127.0)))
      .select(col(idCol), col("scale"),
        transform(col(vecCol), x =>
          when(col("scale") === 0.0, lit(0))
            .otherwise(round(x / col("scale")).cast("int"))).as("q"))
  }

  /** Inverse of [[quantizeInt8]]: v'[i] = q[i]·scale as float. */
  def dequantizeInt8(q: DataFrame, idCol: String = "vec_id"): DataFrame =
    q.select(col(idCol),
      transform(col("q"), x => (x.cast("double") * col("scale")).cast("float"))
        .as("embedding"))

  /** Chunk→document mean-pooling of embeddings in EXACT micro-units —
    * the aggregation that turns per-chunk vectors into one document
    * vector (retrieval pipelines pool before indexing). Each element is
    * floored to integer micro-units (1e-6 resolution) first, so the
    * cross-row sum is an integer: order-independent, partition-
    * invariant, and engine-exact, where a float sum is none of those.
    * Pooling error < 1e-6 per element — far below embedding noise.
    *
    * Output is the flattened (group, idx, mean_micro, n_vecs) relation —
    * scalar rows hash-compare under the oracle gate, and
    * `transform(..., x / 1e6)` rebuilds a float vector when needed.
    *
    * Floor-division portability: every addend is offset by +10⁹ before
    * the integral division so the dividend is non-negative — there
    * Spark's truncating `div` and DuckDB's flooring `//` agree — and
    * the offset divides out exactly (adds 10⁹ to the quotient,
    * subtracted back).
    *
    * Scale shape: posexplode (dim rows per vector) → ONE combine-agg
    * shuffle keyed by (group, element index). No window, no join. */
  def meanPoolMicro(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame = {
    // offset bound: elements to |v| ≤ 10³ stay non-negative, and
    // n·offset stays inside a long for groups up to ~9·10⁹ vectors
    val offset = 1000000000L
    emb.select(col(groupCol).as("group_id"), posexplode(col(vecCol)))
      .select(col("group_id"), col("pos").as("idx"),
        (floor(col("col").cast("double") * lit(1000000.0)) + lit(offset))
          .as("__m"))
      .groupBy(col("group_id"), col("idx"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__m")).as("__s"))
      .select(col("group_id"), col("idx"),
        (expr("__s div n_vecs") - lit(offset)).as("mean_micro"),
        col("n_vecs"))
  }

  /** Pairwise cosine separation between per-group embedding centroids —
    * the class/source-level geometry diagnostic (are my labels actually
    * separated in embedding space? is one crawl source drifting into
    * another's region?): centroids via [[meanPoolMicro]]'s exact
    * integer means, then cosine between every group pair from exact
    * integer dot/norm sums (one correctly-rounded double division at
    * the end — engine-portable like the brute-force ranker).
    *
    * The group inventory is bounded by definition (labels / sources —
    * the same stratum class as [[graft.ops.Dedup.sourceBottomKSim]]'s
    * catalog); the pair join runs on the P·d centroid relation, never
    * the corpus. */
  def groupCentroidSeparation(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    val cent = meanPoolMicro(emb, groupCol, vecCol)
    val a = cent.select(col("group_id").as("g1"), col("idx"),
      col("mean_micro").as("x1"))
    val b = cent.select(col("group_id").as("g2"), col("idx"),
      col("mean_micro").as("x2"))
    a.join(b, Seq("idx")).filter(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2"))
      .agg(sum(col("x1") * col("x2")).as("__d"),
        sum(col("x1") * col("x1")).as("__na"),
        sum(col("x2") * col("x2")).as("__nb"))
      .select(col("g1"), col("g2"),
        round(col("__d") / (sqrt(greatest(col("__na"), lit(1L)).cast("double")) *
          sqrt(greatest(col("__nb"), lit(1L)).cast("double"))), roundTo)
          .as("cos_centroid"))
  }

  /** Cluster purity of a cell assignment against external labels — the
    * classic external clustering eval (purity per cell = share of its
    * dominant label): did the unsupervised cells recover the labeled
    * structure? Pure integers: per-cell label counts, argmax by
    * (count desc, label asc) via one combine `max(struct)` (never a
    * window), purity = 10⁶·top div n.
    *
    * Scale shape: one equi-join of the assignment and label relations
    * keyed by id, then two combine-aggs ((cell, label) counts → per-cell
    * argmax). Output is cell-count-sized. */
  def clusterPurity(assign: DataFrame, labels: DataFrame,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame =
    assign.join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .groupBy(col("cell"), col(labelCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("cell"))
      .agg(sum(col("__c")).as("n"),
        max(struct(col("__c"),
          (-col(labelCol).cast("long")).as("__nl"))).as("__m"))
      .select(col("cell"), col("n"),
        (-col("__m").getField("__nl")).as("top_label"),
        col("__m").getField("__c").as("top_count"))
      .withColumn("purity_micro", expr("(1000000 * top_count) div n"))

  /** Maximal Marginal Relevance top-k (Carbonell & Goldstein 1998) —
    * diversity-aware retrieval: greedily pick the candidate maximizing
    * λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s), so near-duplicate hits
    * don't crowd the result list (the re-rank stage after ANN in a RAG
    * pipeline).
    *
    * Exact integer scoring: all similarities are round(cos·10⁶) of the
    * fixed-order double cosine (the [[daviesBouldinByCell]] rounding
    * contract), and the MMR score stays the UNdivided long
    * λμ·sim_q − (10⁶−λμ)·max_sel (≤ 10¹² — exact, no precision-losing
    * division), ties by id. The first pick scores max_sel = 0, i.e.
    * pure query similarity.
    *
    * Scale shape: one distributed pass computes query sims and takes
    * the `n` first-stage candidates as a TakeOrderedAndProject; the
    * candidate relation (n rows, driver-bounded by the first stage
    * like [[bruteForceTopK]]'s query set) is checkpointed, and each of
    * the k greedy steps is one candidate-sized job whose selected-set
    * sims ride as ≤k literal vector columns — the corpus is scanned
    * exactly once. */
  def mmrTopK(queryVec: Array[Float], corpus: DataFrame, n: Int, k: Int,
      lambdaMicro: Long = 700000L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(n > 0 && k > 0 && k <= n, "need 0 < k <= n")
    require(lambdaMicro >= 0 && lambdaMicro <= 1000000L, "lambda in [0, 1e6]")
    val spark = corpus.sparkSession
    import spark.implicits._
    def normD(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    def cosMicro(v: Column, other: Array[Double]): Column =
      round(dot(v, lit(other)) / (norm(v) * lit(normD(other)))
        * lit(1000000.0), 0).cast("long")
    val qd = queryVec.map(_.toDouble)
    val cand = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("__sq", cosMicro(col("__v"), qd))
      .orderBy(col("__sq").desc, col("id"))
      .limit(n)
      .localCheckpoint() // n rows; re-read by each greedy step
    var remaining = cand
    var selected = List.empty[Array[Double]]
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Int, Long, Long)]
    var rank = 1
    while (rank <= k) {
      val ms = selected match {
        case Nil => lit(0L)
        case s :: Nil => cosMicro(col("__v"), s) // greatest() needs >= 2 args
        case ss => greatest(ss.map(s => cosMicro(col("__v"), s)): _*)
      }
      val best = remaining
        .withColumn("__ms", ms)
        .withColumn("__score",
          expr(s"$lambdaMicro * __sq - ${1000000L - lambdaMicro} * __ms"))
        .orderBy(col("__score").desc, col("id"))
        .limit(1)
        .select(col("id"), col("__v"), col("__sq"), col("__score"))
        .collect()
      if (best.nonEmpty) {
        val r = best(0)
        out += ((r.getLong(0), rank, r.getLong(2), r.getLong(3)))
        selected ::= r.getSeq[Float](1).toArray.map(_.toDouble)
        remaining = remaining.filter(col("id") =!= r.getLong(0))
      }
      rank += 1
    }
    out.toSeq.toDF(idCol, "rank", "simq_micro", "score")
  }

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    * traversal — the 2-approximation to the k-center objective): pick
    * the corpus vector farthest (max cosine distance) from everything
    * selected so far, k times — the classic diverse-coreset sampler
    * ("give me k maximally-spread exemplars to label/inspect/seed").
    * Deterministic: the seed is the minimum id and every pick breaks
    * ties by id; distances are the micro-unit rounded cosine contract,
    * so the whole traversal replays in SQL.
    *
    * Scale shape: k passes over the corpus, each a map-only min-over-
    * selected distance (≤k literal vector columns — plan width grows
    * with k, which is a coreset size, not a corpus size) into a
    * 1-row TakeOrderedAndProject argmax. Nothing is ever collected
    * except the k picked rows. */
  def kCenterCoreset(corpus: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    def normD(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    def distMicro(v: Column, other: Array[Double]): Column =
      lit(1000000L) - round(dot(v, lit(other)) / (norm(v) * lit(normD(other)))
        * lit(1000000.0), 0).cast("long")
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"))
    val seed = base.orderBy(col("id")).limit(1).collect()
    require(seed.nonEmpty, "empty corpus")
    var selected =
      List(seed(0).getSeq[Float](1).toArray.map(_.toDouble))
    val picked = scala.collection.mutable.Set(seed(0).getLong(0))
    val out = scala.collection.mutable.ListBuffer(
      (seed(0).getLong(0), 1, 0L))
    var rank = 2
    while (rank <= k) {
      val dmin = selected match {
        case s :: Nil => distMicro(col("__v"), s)
        case ss => least(ss.map(s => distMicro(col("__v"), s)): _*)
      }
      val best = base.filter(!col("id").isInCollection(picked.toSeq))
        .withColumn("__d", dmin)
        .orderBy(col("__d").desc, col("id"))
        .limit(1)
        .select(col("id"), col("__v"), col("__d"))
        .collect()
      if (best.nonEmpty) {
        val r = best(0)
        out += ((r.getLong(0), rank, r.getLong(2)))
        selected ::= r.getSeq[Float](1).toArray.map(_.toDouble)
        picked += r.getLong(0)
      }
      rank += 1
    }
    out.toSeq.toDF(idCol, "rank", "dist_micro")
  }

  /** Per-group embedding anisotropy — the representation-geometry
    * diagnostic of Ethayarajh (2019, "How Contextual are Contextualized
    * Word Representations?"): the expected cosine between two random
    * vectors of a group is ≈ ‖μ‖² / E‖v‖² (how much of the space the
    * group actually uses — ≈1 means all vectors point the same way, a
    * collapsed/degenerate embedding source; ≈0 means isotropic spread).
    * Computed exactly in integer micro-units: μ from [[meanPoolMicro]]'s
    * exact integer means, per-vector squared norms from floored micro
    * elements, the corpus sum in DECIMAL(38,0) (a long wraps past
    * ~1.4·10⁵ vectors·64 dims), and one integral division at the end.
    *
    * Scale shape: two corpus passes — the meanPool combine-agg keyed
    * (group, idx) and a map-only per-vector norm into a per-group
    * combine-agg — then group-sized joins. Nothing pairwise: the
    * "expected pairwise cosine" is computed from the identity, never
    * from pairs. */
  def anisotropyByGroup(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame = {
    val mu = meanPoolMicro(emb, groupCol, vecCol)
      .groupBy(col("group_id"))
      .agg(sum(col("mean_micro") * col("mean_micro")).as("mu_sq"))
    val norms = emb
      .select(col(groupCol).as("group_id"), expr(
        s"""aggregate($vecCol, 0L, (acc, x) ->
           | acc + CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
           |     * CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"""
          .stripMargin).as("__nv"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__nv").cast("decimal(38,0)")).as("__s"))
      .select(col("group_id"), col("n_vecs"),
        expr("CAST(__s div n_vecs AS BIGINT)").as("mean_sq_norm"))
    mu.join(norms, Seq("group_id"))
      .select(col("group_id"), col("n_vecs"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * mu_sq)
          | div greatest(mean_sq_norm, 1) AS BIGINT)""".stripMargin)
          .as("aniso_micro"))
  }

  /** Per-cell simplified silhouette of a trained k-means clustering —
    * the cluster-quality eval (is k right? which cells are mush?) in the
    * centroid-based "simplified silhouette" form (Hruschka et al. 2004):
    * per vector, a = cosine distance to its OWN (nearest) centroid and
    * b = distance to the nearest OTHER centroid, s = (b − a) / max(a, b).
    * The classic silhouette needs all intra/inter pairwise distances
    * (O(n²)); the simplified form replaces cluster means of pair
    * distances with distance-to-centroid, making it one corpus pass —
    * the only form that survives 100 TB.
    *
    * Exactness: distances are micro-unit integers (round(cos·10⁶) of the
    * fixed-order double cosine — the same rounded-cosine discipline as
    * [[trainIvfCentroidsMicro]]'s assignment), and s is a non-negative
    * integer ratio (own centroid is the argmin, so b ≥ a and the
    * truncating div equals floor in every engine).
    *
    * Scale shape: the k-row micro-centroid relation broadcasts; the
    * corpus fans out ×k map-side (never a shuffle), then ONE combine-agg
    * keyed by vector id carries k (dist, cell) structs per id into a
    * bounded `array_sort(collect_list)` buffer (≤ k structs — driver-
    * bounded by the centroid count, not the corpus), and the per-cell
    * roll-up is a second k-row-output agg. No window, no self-join. */
  def silhouetteByCell(emb: DataFrame,
      cents: Array[(Long, Array[Long])], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(cents.length >= 2, "silhouette needs at least 2 centroids")
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = broadcast(
      cents.toSeq.map { case (cell, cm) => (cell, cm.toSeq) }
        .toDF("__cell", "__cm"))
    val cmd = transform(col("__cm"), x => x.cast("double"))
    val cos = dot(col(vecCol), cmd) / (norm(col(vecCol)) * sqrt(dot(cmd, cmd)))
    val distMicro = (lit(1000000L) - round(cos * lit(1000000.0), 0).cast("long"))
    val perVec = emb.select(col(idCol).as("__id"), col(vecCol))
      .crossJoin(centDf)
      .select(col("__id"), struct(distMicro.as("d"), col("__cell").as("c")).as("__dc"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(col("__dc"))).as("__l"))
      .select(col("__id"),
        col("__l").getItem(0).getField("c").as("cell"),
        col("__l").getItem(0).getField("d").as("__a"),
        col("__l").getItem(1).getField("d").as("__b"))
      // b ≥ a by the sort, so the dividend is non-negative: div == floor
      .withColumn("__s",
        expr("((__b - __a) * 1000000) div greatest(__b, 1)"))
    perVec.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(col("__a")).as("__sa"), sum(col("__b")).as("__sb"),
        sum(col("__s")).as("__ss"))
      .select(col("cell"), col("n"),
        expr("__sa div n").as("mean_intra_micro"),
        expr("__sb div n").as("mean_inter_micro"),
        expr("__ss div n").as("mean_sil_micro"))
  }

  /** Prototype-based data pruning (Sorscher et al., "Beyond neural
    * scaling laws", NeurIPS'22): rank every vector by its cosine
    * distance to its own cluster centroid and keep only the HARDEST
    * `keepNum/keepDen` fraction per cell — easy, prototype-like
    * examples near a centroid carry the least training signal at scale,
    * and per-cell ranking keeps the kept set diverse (a global cut
    * would empty the tight clusters first).
    *
    * Exactness: own-cell assignment and distance share
    * [[silhouetteByCell]]'s rounded-cosine micro integers (argmin ties
    * to the lowest cell — the assignment contract); the keep rule
    * `rank·keepDen ≤ n·keepNum` is pure integers, ties pinned by id.
    *
    * Scale shape: k-row centroid broadcast, map-side ×k fan-out into a
    * bounded per-id min-struct agg, then ONE per-CELL rank window
    * (cells parallelize; a cell must fit a partition sort — shard past
    * that) — no global window, no self-join. */
  def prototypePruneByCell(emb: DataFrame,
      cents: Array[(Long, Array[Long])], keepNum: Int, keepDen: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "need trained centroids")
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      "keep fraction must be a rational in [0, 1]")
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = broadcast(
      cents.toSeq.map { case (cell, cm) => (cell, cm.toSeq) }
        .toDF("__cell", "__cm"))
    val cmd = transform(col("__cm"), x => x.cast("double"))
    val cos = dot(col(vecCol), cmd) / (norm(col(vecCol)) * sqrt(dot(cmd, cmd)))
    // An all-zero vector makes the cosine 0/0 — engine-divergent
    // undefined behavior (NaN routes differently through Spark casts and
    // DuckDB's double division). Pin it to dist_micro = unit (cos := 0,
    // "maximally hard") so both engines agree by construction — the same
    // guard matryoshkaEval applies at ssq = 0.
    val distMicro = when(norm(col(vecCol)) === lit(0.0), lit(1000000L))
      .otherwise(lit(1000000L) - round(cos * lit(1000000.0), 0).cast("long"))
    val own = emb.select(col(idCol).as("id"), col(vecCol))
      .crossJoin(centDf)
      .select(col("id"),
        struct(distMicro.as("d"), col("__cell").as("c")).as("__dc"))
      .groupBy(col("id")).agg(min(col("__dc")).as("__m"))
      .select(col("id"), col("__m").getField("c").as("cell"),
        col("__m").getField("d").as("dist_micro"))
    val w = Window.partitionBy(col("cell"))
    own
      .withColumn("rank_in_cell", row_number().over(
        w.orderBy(col("dist_micro").desc, col("id"))))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("kept",
        col("rank_in_cell") * keepDen <= col("__n") * keepNum)
      .select(col("id").as(idCol), col("cell"), col("dist_micro"),
        col("rank_in_cell"), col("kept"))
  }

  /** Per-cell Davies–Bouldin index (Davies & Bouldin 1979) — the
    * companion cluster-quality metric to [[silhouetteByCell]], built on
    * the same micro-unit cosine distances: DB_i = max_{j≠i}
    * (S_i + S_j) / M_ij with S = within-cell mean distance to the own
    * centroid and M = centroid–centroid distance. LOWER is better
    * (compact cells, far-apart centroids); cells whose DB is dominated
    * by one close neighbor are merge candidates — the "is k too big?"
    * probe where silhouette answers "is k too small?".
    *
    * Exactness: S_i re-uses [[silhouetteByCell]]'s floored mean intra
    * distance; the k×k centroid-distance matrix is computed driver-side
    * from the micro centroid array with the same fixed-order double
    * cosine and HALF_UP micro rounding the oracle replays; the final
    * ratio is one integral division of longs.
    *
    * Scale shape: everything corpus-sized is [[silhouetteByCell]]'s one
    * combine-agg; the pair matrix is k² driver rows joined broadcast
    * onto the k-row per-cell relation. */
  def daviesBouldinByCell(emb: DataFrame,
      cents: Array[(Long, Array[Long])], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(cents.length >= 2, "Davies-Bouldin needs at least 2 centroids")
    val spark = emb.sparkSession
    import spark.implicits._
    val sil = silhouetteByCell(emb, cents, idCol, vecCol)
      .select(col("cell"), col("n"), col("mean_intra_micro"))
      .localCheckpoint(false) // k rows; consumed by both join sides
    def cosMicroDist(a: Array[Long], b: Array[Long]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // HALF_UP away-from-zero — the rounding DuckDB's round() applies
      1000000L - new java.math.BigDecimal(cos * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val pairRows = for {
      (ci, vi) <- cents.toSeq; (cj, vj) <- cents.toSeq if ci != cj
    } yield (ci, cj, cosMicroDist(vi, vj))
    val pairs = broadcast(pairRows.toDF("__ci", "__cj", "__m"))
    sil.join(pairs, col("cell") === col("__ci"))
      .join(sil.select(col("cell").as("__cj2"),
        col("mean_intra_micro").as("__sj")), col("__cj") === col("__cj2"))
      .groupBy(col("cell"), col("n"), col("mean_intra_micro"))
      .agg(max(expr(
        "((mean_intra_micro + __sj) * 1000000) div greatest(__m, 1)"))
        .as("db_micro"))
  }

  /** Contrastive training-pair mining: for each anchor, its exact
    * nearest neighbour as the positive plus `negatives` deterministic
    * random negatives drawn from a hash panel — the (anchor, positive,
    * negatives...) tuples an embedding-model trainer consumes.
    *
    * Negative sampling never touches an anchor × corpus product: the
    * corpus is bucketed by a 16-bit prefix of its id hash, each
    * bucket's min-hash member survives (one parallel window pass over
    * the corpus), and the survivors are densely indexed into a
    * ≤`nBuckets`-row PANEL. The dense index is derived WITHOUT any
    * global window: survivors (one per occupied bucket) rank within a
    * 256-way bucket-prefix group (partitioned window), and cross-group
    * offsets come from a triangular self-join of the ≤256-row
    * group-count relation — so no stage ever funnels into a single
    * partition. The reduced survivor set is `localCheckpoint`ed (≤
    * `nBuckets` rows) so the offset aggregate and the panel join read
    * it instead of re-scanning the corpus. Each (anchor, draw) pair
    * hashes to `index = h mod panelSize` and takes that panel member:
    * map-only, content-stable, uniform across the panel, and no draw
    * is ever lost to an empty bucket. A draw landing on the anchor
    * itself is dropped; a draw may coincide with the positive — at
    * corpus scale the probability is negligible and determinism
    * matters more than exclusion.
    *
    * Output: (query_id, pair_id, sim, pair_type ∈ positive|negative,
    * draw), sim rounded to `roundTo`. */
  def mineContrastivePairs(anchors: DataFrame, corpus: DataFrame,
      negatives: Int = 3, nBuckets: Int = 1 << 16,
      qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    require(negatives > 0 && nBuckets > 0, "need positive negatives/buckets")
    val pos = bruteForceTopK(anchors, corpus, 1, qidCol, cidCol, vecCol, roundTo)
      .select(col("query_id"), col("neighbor_id").as("pair_id"), col("sim"),
        lit("positive").as("pair_type"), lit(0).as("draw"))
    val ring = corpus.select(col(cidCol).as("pair_id"), col(vecCol).as("__nv"),
        md5(col(cidCol).cast("string")).as("__ch"))
      .withColumn("__bucket",
        pmod(conv(substring(col("__ch"), 1, 4), 16, 10).cast("long"),
          lit(nBuckets.toLong)))
    val wB = Window.partitionBy(col("__bucket")).orderBy(col("__ch"))
    val reduced = ring
      .withColumn("__rn", row_number().over(wB)).filter(col("__rn") === 1)
      .select(col("pair_id"), col("__nv"), col("__bucket"))
      .localCheckpoint()
    // Dense index in __bucket order (survivors are unique per bucket):
    // rank within a 256-way prefix group + cumulative group offsets from
    // a triangular self-join of the tiny group-count relation. No global
    // window anywhere in the plan.
    val grp = (col("__bucket") * lit(256L) / lit(nBuckets.toLong)).cast("long")
    val g = reduced.withColumn("__g", grp)
    val counts = g.groupBy(col("__g")).agg(count(lit(1)).as("__c"))
    val offsets = counts.alias("a")
      .join(counts.alias("b"), col("b.__g") < col("a.__g"), "left")
      .groupBy(col("a.__g").as("__g"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    val wG = Window.partitionBy(col("__g")).orderBy(col("__bucket"))
    val panel = g.join(broadcast(offsets), Seq("__g"))
      .withColumn("__idx",
        col("__off") + row_number().over(wG).cast("long") - 1)
      .select(col("__idx"), col("pair_id"), col("__nv"))
    val panelSize = panel.select(count(lit(1)).as("__n"))
    val draws = anchors
      .select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("draw", explode(array((1 to negatives).map(lit(_)): _*)))
      .crossJoin(broadcast(panelSize))
      .withColumn("__idx",
        pmod(Dedup.hashStr(concat(col("query_id").cast("string"), lit("|"),
          col("draw").cast("string")), 13), col("__n")))
    val neg = draws.join(broadcast(panel), Seq("__idx"))
      .filter(col("query_id") =!= col("pair_id"))
      .select(col("query_id"), col("pair_id"),
        round(cosine(col("__qv"), col("__nv")), roundTo).as("sim"),
        lit("negative").as("pair_type"), col("draw"))
    pos.unionByName(neg)
  }

  /** Margin-scored bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * "ratio" margin; the mining rule behind the CCMatrix parallel-corpus
    * construction, Schwenk et al. 2021): score each candidate pair
    * (x, y) by how much its cosine stands out against BOTH endpoints'
    * k-NN neighborhoods in the shared embedding space,
    *
    *   margin(x,y) = cos(x,y) / (mean cos(x, NNk(x,T))/2
    *                             + mean cos(y, NNk(y,S))/2)
    *
    * computed in exact integer micro units as
    *
    *   margin_micro = (2·unit·kF·kB·sim_micro) div (kB·sumF + kF·sumB)
    *
    * where (sumF, kF) aggregate x's forward top-k sims and (sumB, kB)
    * y's backward top-k sims — actual counts, not the nominal k, so
    * queries near sparse cells stay well-defined. A non-positive
    * denominator (an anti-correlated neighborhood) is pinned to 2·unit
    * ("maximally marginal") so both engines agree by construction;
    * Spark `div` and DuckDB `//` both truncate toward zero, so the
    * division itself is engine-portable even for negative cosines.
    *
    * Inputs are the two top-k relations (query_id, neighbor_id, sim,
    * rank) from any `*TopK` operator — [[bruteForceTopK]] for small
    * slices, [[ivfTopKWith]] over a SHARED index (one centroid set for
    * both languages, the LASER/CCMatrix setup) for the scale path. The
    * candidate set is their union (CCMatrix's "max" strategy scores
    * x→y and y→x candidates alike), deduped by `groupBy(src,tgt)
    * .agg(min(sim_micro))` — with a shared index the two directions
    * produce bit-identical sims (cosine is symmetric) so `min` is a
    * no-op pick, but spelling it as the oracle spells it keeps the
    * gate argument construct-level rather than semantic.
    *
    * Output: one row per candidate pair with is_src_best / is_tgt_best
    * (rank 1 by margin desc, id asc, per endpoint) and
    * mutual = both — the mined corpus is the caller filtering
    * `mutual && margin_micro >= threshold` ([[minedBitext]]). Keeping
    * the flags instead of filtering makes the relation row-stable for
    * audits and threshold sweeps.
    *
    * Scale shape: two combine-aggs over the ≤|S|·k / ≤|T|·k top-k
    * relations, two equi-joins of those (broadcastable — one row per
    * query) back onto the candidates, and two windows partitioned by
    * src/tgt id. Nothing here ever touches the corpus cross product;
    * total cost is bounded by the top-k relations the caller built.
    *
    * Construct parity: the candidate dedup is `groupBy(src,tgt)
    * .agg(min(sim_micro))` and the margin division is magnitude-then-
    * sign — both spelled exactly as the DuckDB oracle spells them, so
    * correctness never leans on a sims-are-symmetric or a matching-
    * truncation-semantics argument (the house discipline from
    * `Valuation`'s magnitude-then-sign convention). */
  def bitextMarginPairs(fwd: DataFrame, bwd: DataFrame,
      unit: Long = 1000000L): DataFrame = {
    val simMicro = round(col("sim") * unit, 0).cast("long")
    bitextMarginPairsMicro(
      fwd.withColumn("sim_micro", simMicro),
      bwd.withColumn("sim_micro", simMicro), unit)
  }

  /** [[bitextMarginPairs]] over top-k relations that already carry exact
    * integer `sim_micro` scores ([[ivfTopKExact]]) — the engine-portable
    * margin kernel: every value from here on is integer arithmetic both
    * engines replay identically. */
  def bitextMarginPairsMicro(fwd: DataFrame, bwd: DataFrame,
      unit: Long = 1000000L): DataFrame = {
    val scored = bitextMarginDetail(fwd, bwd, unit)
    val wF = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_micro").desc, col("tgt_id"))
    val wB = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_micro").desc, col("src_id"))
    scored
      .withColumn("is_src_best", row_number().over(wF) === 1)
      .withColumn("is_tgt_best", row_number().over(wB) === 1)
      .select(col("src_id"), col("tgt_id"), col("sim_micro"),
        col("margin_micro"), col("is_src_best"), col("is_tgt_best"),
        (col("is_src_best") && col("is_tgt_best")).as("mutual"))
  }

  /** The margin-scored candidate relation of [[bitextMarginPairsMicro]]
    * BEFORE the two best-rank windows: one row per deduped candidate
    * pair with its per-endpoint top-k aggregates (`__fsum`/`__fk` over
    * the forward direction, `__bsum`/`__bk` backward) and the integer
    * ratio `margin_micro`. Exposed separately so the driver gate can
    * probe the margin stage in isolation (round-13 bitext bisection);
    * [[bitextMarginPairsMicro]] adds only the rank-1 flags on top. */
  def bitextMarginDetail(fwd: DataFrame, bwd: DataFrame,
      unit: Long = 1000000L): DataFrame = {
    val f = fwd.select(col("query_id").as("src_id"),
      col("neighbor_id").as("tgt_id"), col("sim_micro"))
    val b = bwd.select(col("neighbor_id").as("src_id"),
      col("query_id").as("tgt_id"), col("sim_micro"))
    val fAgg = f.groupBy(col("src_id"))
      .agg(sum(col("sim_micro")).as("__fsum"), count(lit(1)).as("__fk"))
    val bAgg = b.groupBy(col("tgt_id"))
      .agg(sum(col("sim_micro")).as("__bsum"), count(lit(1)).as("__bk"))
    // inner joins BY DESIGN: every candidate endpoint has top-k stats
    // when both sides are full query sets (the mining setup); a pair
    // without a neighborhood has no margin definition.
    f.unionByName(b)
      .groupBy(col("src_id"), col("tgt_id"))
      .agg(min(col("sim_micro")).as("sim_micro"))
      .join(fAgg, Seq("src_id"))
      .join(bAgg, Seq("tgt_id"))
      .withColumn("__den",
        col("__bk") * col("__fsum") + col("__fk") * col("__bsum"))
      .withColumn("__mag",
        lit(2L * unit) * col("__fk") * col("__bk") * abs(col("sim_micro")))
      .withColumn("margin_micro",
        when(col("__den") <= 0L, lit(2L * unit))
          .when(col("sim_micro") >= 0L, expr("__mag div __den"))
          .otherwise(-expr("__mag div __den")))
  }

  /** The mined parallel corpus: mutual-best pairs whose margin clears
    * `thresholdMicro` (CCMatrix mines at margin ≈ 1.06, i.e. 1060000
    * micro). See [[bitextMarginPairs]] for the scoring. */
  def minedBitext(fwd: DataFrame, bwd: DataFrame, thresholdMicro: Long,
      unit: Long = 1000000L): DataFrame =
    bitextMarginPairs(fwd, bwd, unit)
      .filter(col("mutual") && col("margin_micro") >= thresholdMicro)
      .select(col("src_id"), col("tgt_id"), col("sim_micro"),
        col("margin_micro"))

  /** End-to-end margin mining over a shared embedding space with an IVF
    * index for both directions (one centroid set — the multilingual-
    * encoder setup where both languages embed into the same space).
    * Forward probes src→tgt, backward tgt→src, both against the SAME
    * broadcast centroids, then [[bitextMarginPairs]] scores the union.
    * 100 TB: set `broadcastQueries = false` for corpus×corpus mining —
    * both probe directions then rendezvous shuffled on the cell key
    * ([[ivfTopKShuffledMicro]]'s plan shape) instead of broadcasting a
    * corpus-sized query side; rows are identical either way and the
    * margin kernel downstream is unchanged. Size `cents` SUB-linearly
    * in the corpus (the FAISS convention, nlist ≈ √n): an every-Nth
    * stride (the small-fixture convention) grows the cell count — and
    * with it the per-row assignment cost — linearly, which turns the
    * map pass quadratic at corpus scale. */
  def mineBitextIvf(src: DataFrame, tgt: DataFrame,
      cents: Array[(Long, Array[Float])], k: Int = 4, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      unit: Long = 1000000L, roundTo: Int = 6,
      broadcastQueries: Boolean = true): DataFrame = {
    val index = new IvfIndex(cents.map(_._1), cents.map(_._2), roundTo)
    val fwd = ivfTopKIndexed(src, tgt, index, k, nProbe, idCol, idCol,
      vecCol, roundTo, broadcastQueries)
    val bwd = ivfTopKIndexed(tgt, src, index, k, nProbe, idCol, idCol,
      vecCol, roundTo, broadcastQueries)
    bitextMarginPairs(fwd, bwd, unit)
  }

  /** [[mineBitextIvf]] on the BIT-EXACT integer-micro path — the
    * engine-portable form (VERDICT r11 item 1): both probe directions run
    * [[ivfTopKExact]] against one shared [[graft.functions.IvfIndexMicro]]
    * (quantized with [[quantizeMicro]]), so every sim, margin, and
    * best-rank flag is exact integer arithmetic with NO float rounding
    * boundary anywhere in the oracle contract. Plan shape is identical to
    * [[mineBitextIvf]] (broadcast centroids, map-only assignment, cell-key
    * equi-joins, margins bounded by the top-k relations); only the scalar
    * kernel changed. */
  def mineBitextIvfExact(src: DataFrame, tgt: DataFrame,
      cents: Array[(Long, Array[Float])], k: Int = 4, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      unit: Long = 1000000L, broadcastQueries: Boolean = true): DataFrame = {
    val index = {
      val q = quantizeMicro(cents)
      new IvfIndexMicro(q.map(_._1), q.map(_._2))
    }
    val fwd = ivfTopKIndexedExact(src, tgt, index, k, nProbe, idCol, idCol,
      vecCol, broadcastQueries)
    val bwd = ivfTopKIndexedExact(tgt, src, index, k, nProbe, idCol, idCol,
      vecCol, broadcastQueries)
    bitextMarginPairsMicro(fwd, bwd, unit)
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    * k-means cluster — train spherical k-means, compare pairs only
    * WITHIN a cell, connect members whose pairwise cosine reaches
    * `threshold`, and keep exactly one representative per connected
    * duplicate group. Returns the surviving rows.
    *
    * Divergence from the paper, pinned for determinism: the survivor is
    * the group's MINIMUM id (Abbas et al. select by distance to the
    * centroid, which is a float ordering that isn't engine-portable).
    * Group closure uses connected components over the within-cell pair
    * graph — the same keep-one-per-group semantics as
    * [[Dedup.dropNearDuplicatesConnected]] — so a chain a~b~c drops
    * both b and c even when a≁c, and never drops a member merely
    * because a lower-id member that was itself dropped matched it.
    *
    * Versus [[nearDupPairs]]' sign-LSH blocking: the cells are
    * data-dependent, adapting to corpus density (dense regions split
    * across many cells, keeping per-cell pair counts bounded where
    * oblivious hyperplanes would overload one bucket). Scale shape:
    * map-only cell assignment against the [[graft.functions.IvfIndex]]
    * reference object, ONE equi-join shuffle keyed by cell — never a
    * cross product across cells; the component iteration runs on the
    * pair graph, which is orders of magnitude smaller than the corpus.
    *
    * Per-cell cost is O(cellSize²) with E[cellSize] = corpus/k — SIZE k
    * WITH THE CORPUS (k ≈ corpus / targetCellSize, the paper trains
    * 50k–100k cells for billions of points). `maxCellSize` is the
    * explicit guard for when k was sized wrong: cells above the cap are
    * excluded from pair generation (all their members survive — a
    * documented recall sacrifice, exactly the `maxBucket` contract in
    * [[Dedup.lshCandidates]]) instead of silently going quadratic. */
  def semanticDedup(emb: DataFrame, threshold: Double, k: Int = 64,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6,
      maxCellSize: Int = 0): DataFrame =
    semanticDedupWith(emb, trainIvfCentroids(emb, k, iters, idCol, vecCol, roundTo),
      threshold, idCol, vecCol, roundTo, maxCellSize)

  /** [[semanticDedup]] with integer micro-unit k-means training
    * ([[trainIvfCentroidsMicro]]) — identical semantics, but the trained
    * cells (and therefore the whole dedup decision) are bit-exact across
    * engines, so the result is DuckDB-oracle-checkable. */
  def semanticDedupMicro(emb: DataFrame, threshold: Double, k: Int = 64,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6,
      maxCellSize: Int = 0): DataFrame =
    semanticDedupWithMicro(emb,
      trainIvfCentroidsMicro(emb, k, iters, idCol, vecCol, roundTo),
      threshold, idCol, vecCol, roundTo, maxCellSize)

  /** [[semanticDedup]] against an explicit (trained/persisted) centroid
    * set. `maxCellSize > 0` caps the quadratic corner: oversized cells
    * skip pair generation entirely (members all survive). */
  def semanticDedupWith(emb: DataFrame, cents: Array[(Long, Array[Float])],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6,
      maxCellSize: Int = 0): DataFrame =
    semanticDedupIndexed(emb,
      new IvfIndex(cents.map(_._1), cents.map(_._2), roundTo),
      threshold, idCol, vecCol, roundTo, maxCellSize)

  /** [[semanticDedupWith]] over integer micro-unit centroids. */
  def semanticDedupWithMicro(emb: DataFrame, cents: Array[(Long, Array[Long])],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6,
      maxCellSize: Int = 0): DataFrame =
    semanticDedupIndexed(emb,
      IvfIndex.fromMicro(cents.map(_._1), cents.map(_._2), roundTo),
      threshold, idCol, vecCol, roundTo, maxCellSize)

  private def semanticDedupIndexed(emb: DataFrame, index: IvfIndex,
      threshold: Double, idCol: String, vecCol: String, roundTo: Int,
      maxCellSize: Int): DataFrame = {
    // localCheckpoint: the pair join consumes this relation on BOTH
    // sides (and the hot-cell filter adds a third consumer) — without
    // it each side re-evaluates the nearest-centroid assignment over
    // the whole corpus, doubling the most expensive map pass.
    val cell0 = emb.select(col(idCol), col(vecCol))
      .withColumn("__cell", nearest_cells(col(vecCol), index, 1).getItem(0))
      .localCheckpoint()
    val cell =
      if (maxCellSize <= 0) cell0
      else {
        val hot = cell0.groupBy(col("__cell"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > maxCellSize)
          .drop("__c")
        cell0.join(hot, Seq("__cell"), "left_anti")
      }
    val a = cell.select(col("__cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), norm(col(vecCol)).as("__na"))
    val b = cell.select(col("__cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), norm(col(vecCol)).as("__nb"))
    val pairs = a.join(b, Seq("__cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")),
        roundTo) >= threshold)
      .select(col("id_a"), col("id_b"))
    val losers = Components.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("component")) // non-representative members
      .select(col("id").as(idCol))
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** D4 data selection (Tirumala et al., NeurIPS 2023,
    * arXiv:2308.12284): SemDeDup then SSL-prototype pruning — first
    * drop embedding near-duplicate groups down to one representative
    * ([[semanticDedupWithMicro]] at `threshold`), then on the
    * SURVIVORS rank by distance to the own-cluster centroid and keep
    * only the hardest `keepNum/keepDen` per cell
    * ([[prototypePruneByCell]] — prototypical points near a centroid
    * are dropped). The paper's finding is that the two stages remove
    * DIFFERENT mass: dedup kills copies, prototype pruning kills
    * over-represented regions that survive dedup.
    *
    * Output: one row per DEDUP SURVIVOR — (id, cell, dist_micro,
    * rank_in_cell, kept); rows dropped by stage 1 are absent, rows
    * with `kept = false` are stage 2's prune. Divergence from the
    * paper, pinned for determinism: both stages reuse the ONE trained
    * centroid set (`cents`) instead of re-clustering between stages —
    * the practical-pipeline choice (one k-means over 100 TB, not two),
    * and the exact-integer assignment makes the whole selection
    * engine-replayable.
    *
    * Scale shape: the union of its parts — one cell equi-join bounded
    * by `maxCellSize` (stage 1), component iteration on the pair graph
    * only, one k-row broadcast fan-out + per-cell rank window
    * (stage 2). Nothing corpus-quadratic. */
  def d4Select(emb: DataFrame, cents: Array[(Long, Array[Long])],
      threshold: Double, keepNum: Int, keepDen: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundTo: Int = 6, maxCellSize: Int = 0): DataFrame = {
    val survivors = semanticDedupWithMicro(emb, cents, threshold,
      idCol, vecCol, roundTo, maxCellSize)
    prototypePruneByCell(survivors.select(col(idCol), col(vecCol)),
      cents, keepNum, keepDen, idCol, vecCol)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * any number of ranked retrieval lists — THE standard way a hybrid
    * retriever merges its lexical (BM25) and dense (ANN) legs without
    * score calibration: per (query, doc), rrf = Σ_lists 1/(k₀ + rank),
    * here in exact integer micro-units (`unit div (k₀ + rank)`, every
    * operand non-negative) so the fused ranking oracle-replays.
    *
    * Inputs are (query_id, doc_id, rank) relations — any `*TopK`
    * operator output. Ties in the fused score break by doc id, so the
    * LIMIT boundary is engine-stable.
    *
    * Scale shape: every input is already query-set-sized (≤ |Q|·k rows
    * — never corpus-sized); the union + combine-agg shuffles that tiny
    * relation once on (query_id, doc_id), and the final top-k is a
    * per-query window. Adding retrieval legs adds rows to the union,
    * not stages. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10, k0: Int = 60,
      unit: Long = 1000000L, qidCol: String = "query_id",
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val u = lists
      .map(_.select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(rankCol).cast("long").as("rk")))
      .reduce(_ unionByName _)
    val fused = u.groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"$unit div ($k0 + rk)")).as("rrf_micro"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(qidCol), col("id").as(idCol), col("rank"),
        col("n_lists"), col("rrf_micro"))
  }

  /** Ranked-retrieval quality eval — MRR and NDCG@k per query over a
    * ranked candidate pool: the eval loop every retrieval pipeline
    * (BM25, dense, hybrid) closes with. `ranked` carries
    * (qidCol, rankCol, relCol); `nRel` carries (qidCol, n_rel) — the
    * TOTAL corpus-wide relevant count per query, so the ideal DCG is
    * the true ideal, not pool-limited.
    *
    * Exact integers: rank discounts d_r = round(unit / log₂(r+1)) are
    * computed ONCE here (driver-side, k literals) and ride as a
    * broadcast relation — the oracle interpolates the SAME literals, so
    * no runtime float crosses engines. rr = unit div first-relevant
    * rank; ndcg = unit·DCG div IDCG with IDCG the discount prefix sum
    * at min(k, n_rel). Queries with nothing relevant score 0.
    *
    * Scale shape: pool is query-set-sized by construction; one
    * combine-agg per query + two broadcast joins (k-row discounts,
    * |Q|-row n_rel). */
  def retrievalEval(ranked: DataFrame, nRel: DataFrame, k: Int = 10,
      unit: Long = 1000000L, qidCol: String = "query_id",
      rankCol: String = "rk", relCol: String = "rel"): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = ranked.sparkSession
    import spark.implicits._
    val ds = discountTable(k, unit)
    val discounts = broadcast(ds.toDF("r", "d", "pd"))
    val perQ = ranked
      .join(discounts.select(col("r").as(rankCol), col("d")),
        Seq(rankCol), "left")
      .groupBy(col(qidCol))
      .agg(min(when(col(relCol), col(rankCol))).as("__fr"),
        sum(when(col(relCol) && col(rankCol) <= k, col("d"))
          .otherwise(0L)).as("dcg_micro"))
    // LEFT join + coalesce: a query present in the ranked pool but
    // missing from nRel must surface with n_rel = 0 and zero scores,
    // not silently vanish from the eval output (an inner join hid
    // exactly the queries whose relevance labels are missing — the ones
    // an eval should be flagging).
    perQ.join(nRel, Seq(qidCol), "left_outer")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .join(discounts.select(col("r").as("__ir"), col("pd")),
        expr(s"__ir = least($k, CAST(n_rel AS INT))"), "left")
      .select(col(qidCol), col("n_rel"),
        coalesce(expr(s"$unit div __fr"), lit(0L)).as("rr_micro"),
        col("dcg_micro"),
        coalesce(col("pd"), lit(0L)).as("idcg_micro"),
        expr(s"""CASE WHEN coalesce(pd, CAST(0 AS BIGINT)) = 0
          | THEN CAST(0 AS BIGINT)
          | ELSE ($unit * dcg_micro) div pd END""".stripMargin)
          .as("ndcg_micro"))
  }

  /** The (rank, discount, discount-prefix-sum) table retrievalEval and
    * its oracle share: d_r = round(unit / log₂(r+1)). */
  def discountTable(k: Int, unit: Long = 1000000L): Seq[(Int, Long, Long)] = {
    val d = (1 to k).map(r =>
      math.round(unit / (math.log(r + 1) / math.log(2.0))))
    val prefix = d.scanLeft(0L)(_ + _).tail
    (1 to k).map(r => (r, d(r - 1), prefix(r - 1)))
  }

  /** Per-dimension embedding mean shift between two corpus snapshots —
    * the embedding-space drift monitor: a re-crawl or an encoder bump
    * that moves the population mean moves retrieval and clustering with
    * it, and the per-dimension table names WHICH directions moved.
    * Components micro-ize to milli integers (floor(e·1000), the PCA
    * convention); means are sign-split exact divisions; shift_milli is
    * the absolute mean difference per dimension.
    *
    * Scale shape: one posexplode + (idx)-keyed combine-agg per side
    * (dim-sized relations), one dim-keyed join — nothing corpus-pairwise.
    * Dimensions missing from a side (shorter vectors) are omitted. */
  def meanShiftByDim(a: DataFrame, b: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    def stats(df: DataFrame, sumName: String, nName: String): DataFrame =
      df.select(posexplode(col(vecCol)).as(Seq("idx", "e")))
        .withColumn("x",
          expr("CAST(floor(CAST(e AS DOUBLE) * 1000) AS BIGINT)"))
        .groupBy(col("idx"))
        .agg(sum(col("x")).as(sumName), count(lit(1)).as(nName))
    def meanExpr(s: String, n: String) =
      expr(s"""CASE WHEN $s < 0 THEN -((-$s) div $n)
        | ELSE $s div $n END""".stripMargin)
    stats(a, "__sa", "__na").join(stats(b, "__sb", "__nb"), Seq("idx"))
      .select(col("idx"),
        meanExpr("__sa", "__na").as("mean_a_milli"),
        meanExpr("__sb", "__nb").as("mean_b_milli"))
      .withColumn("shift_milli", abs(col("mean_a_milli") - col("mean_b_milli")))
  }

  /** Matryoshka (MRL) truncation audit: how much of each embedding's
    * direction survives keeping only the first `r` dimensions? For a
    * prefix u of v, cos(v, u) = |u|/|v| = √(ssq_r/ssq) — so the whole
    * audit needs only per-vector prefix sums of squares. Per prefix
    * length, reports the vector count, the mean and the worst cosine in
    * micro units — the table that decides how far a serving index can
    * truncate MRL-trained embeddings before recall collapses.
    *
    * Determinism: components are micro-ized to integers first
    * (floor(e·1000), the PCA-replay convention), the sums of squares
    * are exact longs, and only the final √ratio runs in IEEE double +
    * round — the same cross-engine-stable shape as the cosine kernels.
    * Zero vectors report cos = unit (a zero vector loses nothing).
    *
    * Scale shape: one posexplode pass, one combine-agg per vector, a
    * |prefixes|-way stack, one |prefixes|-row output agg. Nothing
    * quadratic, no window. */
  def matryoshkaEval(emb: DataFrame, prefixes: Seq[Int] = Seq(8, 16, 32),
      unit: Long = 1000000L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(prefixes.nonEmpty && prefixes.forall(_ >= 1), "bad prefixes")
    val xs = emb
      .select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("idx", "e")))
      .withColumn("x", expr("CAST(floor(CAST(e AS DOUBLE) * 1000) AS BIGINT)"))
    val prefixAggs = prefixes.map(r =>
      sum(when(col("idx") < r, col("x") * col("x")).otherwise(0L))
        .as(s"ssq_$r"))
    val aggs = sum(col("x") * col("x")).as("ssq") +: prefixAggs
    val agg = xs.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val stacked = agg.selectExpr("id", "ssq",
      s"stack(${prefixes.size}, " +
        prefixes.map(r => s"$r, ssq_$r").mkString(", ") + ") AS (r, ssq_r)")
    stacked
      .withColumn("cosm", expr(
        s"""CASE WHEN ssq = 0 THEN ${unit}L
           | ELSE CAST(round(sqrt(CAST(ssq_r AS DOUBLE) / CAST(ssq AS DOUBLE))
           |        * $unit, 0) AS BIGINT)
           | END""".stripMargin))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(cosm) div count(1)").as("mean_cos_micro"),
        min(col("cosm")).as("min_cos_micro"))
  }
}
