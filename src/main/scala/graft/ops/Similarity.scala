package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.vec_dot

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

  /** Deterministic hyperplanes for sign-LSH (seeded, reproducible across
    * runs and plan rebuilds — no RNG at execution time). */
  private[ops] def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit p = sign(v · plane_p). Vectors in the same
    * bucket are cosine-close with high probability. */
  def signLshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    planes(nPlanes, dim, seed).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

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

  /** Per-centroid cosine scores as an array of (sim, -centroid_id) structs:
    * `array_max` picks the best cell (highest sim, then lowest id — struct
    * ordering is field-by-field, and max of -id is min id). All codegen'd:
    * one VecDot per centroid, no shuffle, no HOF lambda in the corpus path. */
  private def centroidScores(vec: Column, nrm: Column,
      centroids: Array[(Long, Array[Float])], roundTo: Int): Column =
    array(centroids.map { case (cid, cv) =>
      val cl = array(cv.map(x => lit(x.toDouble)): _*)
      struct(
        round(vec_dot(vec, cl) / (nrm * sqrt(vec_dot(cl, cl))), roundTo).as("s"),
        lit(-cid).as("nc"))
    }: _*)

  /** Approximate top-k via IVF (inverted file index): assign every corpus
    * vector to its nearest centroid cell in a single map-only pass, probe
    * the query's `nProbe` nearest cells, re-rank exactly inside them.
    *
    * 100 TB shape: the centroid set is broadcast (never shuffled), cell
    * assignment is embarrassingly parallel, and the candidate join is a
    * broadcast equi-join on cell id — the corpus is scanned once and only
    * ~nProbe/nCells of it pays the exact re-rank. Complements [[lshTopK]]
    * (data-independent hyperplanes) with a data-dependent partitioner.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int = 3,
      centroidEvery: Long = 50, qidCol: String = "vec_id", cidCol: String = "vec_id",
      vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    val cents = ivfCentroids(corpus, centroidEvery, cidCol, vecCol)
    require(cents.nonEmpty, s"no centroids: no $cidCol divisible by $centroidEvery")
    val c = corpus.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .withColumn("__cell",
        -array_max(centroidScores(col("__cv"), col("__cn"), cents, roundTo)).getField("nc"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
      .withColumn("__probe", explode(transform(
        slice(reverse(array_sort(centroidScores(col("__qv"), col("__qn"), cents, roundTo))),
          1, nProbe),
        s => -s.getField("nc"))))
    val sim = round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("__probe") === col("__cell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** All pairs with cosine above a threshold (embedding near-dup detection).
    * Exact O(n²) form — callers at scale should pre-block with
    * [[signLshBucket]] (pass `blockByBucket = true`). */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockByBucket: Boolean = false, nPlanes: Int = 4, dim: Int = 64,
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
}
