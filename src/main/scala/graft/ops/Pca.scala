package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed principal-component estimation via power iteration, in
  * exact integer milli-units — the dimensionality-reduction primitive of
  * embedding pipelines (whitening before ANN indexing, drift monitoring
  * of an embedding corpus, 1-D curriculum ordering by leading-component
  * score).
  *
  * Power iteration (von Mises & Pollaczek-Geiringer 1929) never forms
  * the d×d covariance/Gram matrix: each iteration is two corpus passes,
  *   y = X·v   (map-only per-row dot against the broadcast direction)
  *   u = Xᵀ·y  (posexplode + dim-keyed combine aggregate, d rows out)
  * which is exactly the shape that survives 100 TB — the only shuffle
  * per iteration carries d=64 rows, and the driver round-trip is the
  * dim-bounded u vector (same bounded-collect discipline as
  * [[QualityModel]]'s gradient and [[Similarity.trainIvfCentroidsMicro]]'s
  * centroid rows; SCALING.md inventory).
  *
  * Exactness: embeddings quantize to floor(x·1000) longs; the direction
  * renormalizes each iteration to |v|∞ = 1000 via sign·((|u|·1000) div
  * max|u|) — division only ever sees non-negative operands, so Spark's
  * truncating `div`, Java's `/`, and DuckDB's flooring `//` agree, and
  * the whole training trajectory replays bit-exactly in SQL (the oracle
  * unrolls the iterations). No eigenvalue normalization or convergence
  * test — fixed iteration count, like [[Components.pageRank]].
  *
  * Overflow envelope (longs): |y| ≤ d·xmax·1000 and |u| ≤ N·xmax·|y|,
  * and the renormalization multiplies |u| by 1000 before dividing —
  * with d=64 and |x| ≤ 1 that bounds N at ~10⁵–10⁶ vectors per long.
  * Production therefore trains the direction on a bounded deterministic
  * sample (the callers pass `vec_id < 2000`, the same train-bounded /
  * serve-everywhere split as IVF k-means) and serves the projection
  * corpus-wide as a pure map — the serve pass has no N-dependent
  * arithmetic at all.
  */
object Pca {

  /** Milli-unit quantization of a float-array embedding column. */
  def toMilli(embCol: Column): Column =
    transform(embCol, x => floor(x.cast("double") * 1000).cast("long"))

  /** Train the leading-component direction by `iters` power iterations
    * over the (bounded) training slice. Returns the direction as d
    * milli-unit longs, |v|∞ = 1000, starting from the all-ones vector. */
  def powerDirection(emb: DataFrame, dim: Int = 64, iters: Int = 3,
      embCol: String = "embedding"): Array[Long] = {
    // one materialization feeds every iteration's two passes
    val xm = emb.select(toMilli(col(embCol)).as("xm")).localCheckpoint()
    powerLoop(xm, dim, iters)
  }

  /** The shared power-iteration loop over a pre-quantized `xm`
    * (array<long>) relation. */
  private def powerLoop(xm: DataFrame, dim: Int, iters: Int): Array[Long] = {
    var v = Array.fill(dim)(1000L)
    for (_ <- 1 to iters) {
      val vLit = array(v.map(lit(_)): _*)
      val y = aggregate(zip_with(col("xm"), vLit, (a, b) => a * b),
        lit(0L), (acc, p) => acc + p)
      val u = xm.withColumn("__y", y)
        .select(col("__y"), posexplode(col("xm")).as(Seq("idx", "x")))
        .groupBy(col("idx")).agg(sum(col("x") * col("__y")).as("u"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val uArr = Array.tabulate(dim)(i => u.getOrElse(i, 0L))
      val m = math.max(uArr.map(math.abs).max, 1L)
      v = uArr.map(uj =>
        (if (uj < 0) -1L else 1L) * ((math.abs(uj) * 1000L) / m))
    }
    v
  }

  /** Top-`r` principal directions by power iteration with Hotelling-style
    * data deflation, all in exact integer arithmetic.
    *
    * After each direction v, the training slice is deflated by removing
    * the v-component of every row:  x' = (x·(v·v) − v·(x·v)) div (v·v) —
    * the exact-integer form of x − v (x·v)/(v·v), rescaled back to milli
    * range by the truncating division. The division is sign-split
    * (sign · (abs div vv)) so Spark's truncate-toward-zero `div` and
    * DuckDB's flooring `//` agree on negatives and the oracle replays the
    * whole trajectory bit-exactly.
    *
    * Deflation rounding bleeds ≤1 unit per entry per component — power
    * iteration is self-correcting, so later directions stay accurate;
    * they are near-orthogonal, not exactly so, same class of statement as
    * the fixed-iteration (no-convergence-test) training loop itself.
    *
    * Overflow envelope: v·v ≤ d·10⁶ and |x·v| ≤ d·|x|∞·10³, so the
    * deflation numerator is ≤ 2·d²·|x|∞·10⁹ ≈ 2⁵³ for d=64 even after a
    * couple of deflations (|x'|∞ ≤ |x|∞ + 10³·|x·v|/(v·v) ≤ 65·10³); the
    * power-iteration passes then bound N by ~3·10⁴ rows — which is why
    * training runs on the same bounded slice as [[powerDirection]], with
    * serving corpus-wide as a pure map. */
  def powerDirections(emb: DataFrame, dim: Int = 64, r: Int = 2,
      iters: Int = 3, embCol: String = "embedding"): Seq[Array[Long]] =
    powerDirectionsFromXm(
      emb.select(toMilli(col(embCol)).as("xm")).localCheckpoint(),
      dim, r, iters)

  /** [[powerDirections]] over a pre-quantized `xm` (array<long>)
    * relation — the entry point for callers that center or otherwise
    * transform the training slice first ([[abttStats]]). */
  private[ops] def powerDirectionsFromXm(xm0: DataFrame, dim: Int,
      r: Int, iters: Int): Seq[Array[Long]] = {
    require(r >= 1 && r <= dim, s"powerDirections: r=$r out of [1, $dim]")
    var xm = xm0
    val dirs = Seq.newBuilder[Array[Long]]
    for (c <- 1 to r) {
      val v = powerLoop(xm, dim, iters)
      dirs += v
      if (c < r) {
        val vv = v.map(x => x * x).sum max 1L
        val vArr = v.mkString("array(", "L, ", "L)")
        // x' = sign(num) * (abs(num) div vv), num = x*vv - v_j*(x·v):
        // outer lambda reference (__xv) + integral `div` need the SQL form
        xm = xm
          .withColumn("__xv", aggregate(
            zip_with(col("xm"), array(v.map(lit(_)): _*), (a, b) => a * b),
            lit(0L), (acc, p) => acc + p))
          .selectExpr(
            s"""zip_with(xm, $vArr, (x, vj) -> CASE
               |  WHEN x * ${vv}L - vj * __xv < 0
               |  THEN -((-(x * ${vv}L - vj * __xv)) div ${vv}L)
               |  ELSE (x * ${vv}L - vj * __xv) div ${vv}L END) AS xm"""
              .stripMargin)
          .localCheckpoint()
      }
    }
    dirs.result()
  }

  /** Trained diagonal-whitening statistics: per dimension, the exact
    * integer triple (n, Σx, isqrt(n·Σx² − (Σx)²)) over the (bounded)
    * training slice, with x the milli-quantized coordinate. The scaled
    * standard deviation sd = isqrt(n·Σx² − (Σx)²) is chosen so the
    * serve-side z-score needs NO division by n:
    *   z = (x − Σx/n) / (sd/n) = (n·x − Σx) / sd.
    * isqrt is the EXACT integer square root (`BigInteger.sqrtAndRemainder`)
    * — `floor(sqrt(double))` can round across an integer boundary near
    * perfect squares, so the oracle re-derives exactness with a ±1
    * correction on the double result.
    *
    * Whitening before ANN indexing / semantic dedup is the standard fix
    * for anisotropic embedding spaces (the [[graft.ops.Similarity]]
    * `anisotropyByGroup` probe measures the disease; this is the cure's
    * first-order, per-dimension form — full ZCA needs the rotation
    * [[powerDirections]] provides).
    *
    * Scale shape: one pass over the training slice (posexplode +
    * dim-keyed combine agg), a dim-bounded (d-row) driver collect —
    * the same bounded-collect discipline as [[powerDirection]]. Long
    * envelope: n·Σx² ≤ n²·x²max means n ≲ 3·10⁹ rows at |x| ≤ 10³
    * milli before the variance product wraps, far above any sensible
    * training slice. */
  def whitenStats(emb: DataFrame, dim: Int = 64,
      embCol: String = "embedding"): (Long, Array[Long], Array[Long]) = {
    val st = emb
      .select(posexplode(toMilli(col(embCol))).as(Seq("idx", "x")))
      .groupBy(col("idx"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    require(st.nonEmpty, "whitenStats: empty training slice")
    val n = st.values.head._1
    val s1 = Array.tabulate(dim)(i => st.get(i).map(_._2).getOrElse(0L))
    val sd = Array.tabulate(dim) { i =>
      val (nn, a, b) = st.getOrElse(i, (n, 0L, 0L))
      val v = java.math.BigInteger.valueOf(nn)
        .multiply(java.math.BigInteger.valueOf(b))
        .subtract(java.math.BigInteger.valueOf(a)
          .multiply(java.math.BigInteger.valueOf(a)))
      v.sqrt().longValueExact()
    }
    (n, s1, sd)
  }

  /** Serve trained whitening corpus-wide — a pure map emitting sparse
    * (id, idx, z_micro) rows: z_micro = unit·(n·x − Σx) div sd with the
    * division sign-split (truncating div == flooring // on the
    * non-negative operands both engines then see). A constant dimension
    * (sd = 0) whitens to exactly 0 — its numerator is 0 for every
    * in-distribution row — via the greatest(sd, 1) clamp. */
  def whitenMicro(emb: DataFrame, n: Long, s1: Array[Long],
      sd: Array[Long], unit: Long = 1000000L, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val s1Lit = array(s1.map(lit(_)): _*)
    val sdLit = array(sd.map(x => lit(math.max(x, 1L))): _*)
    emb
      .select(col(idCol), posexplode(toMilli(col(embCol))).as(Seq("idx", "x")))
      .withColumn("__s1", element_at(s1Lit, col("idx") + 1))
      .withColumn("__sd", element_at(sdLit, col("idx") + 1))
      .withColumn("z_micro", expr(
        s"""CASE WHEN $n * x - __s1 < 0
           |  THEN -(($unit * -($n * x - __s1)) div __sd)
           |  ELSE ($unit * ($n * x - __s1)) div __sd END""".stripMargin))
      .select(col(idCol), col("idx"), col("z_micro"))
  }

  /** Diagonal-Mahalanobis outlier scoring from trained whitening stats:
    * per vector, the mean squared whitened coordinate
    * m2 = (Σ_d z_d²) div dim (micro² units — in-distribution vectors
    * sit near unit² = 10¹²), flagged when m2 exceeds `tau` × unit² —
    * the embedding-space novelty/garbage gate that [[whitenMicro]]'s
    * stats buy for free (full Mahalanobis needs the covariance
    * rotation; the diagonal form catches per-coordinate excursions,
    * which is what corrupt embeddings look like). Pure map over the
    * serve pass + one per-vector combine-agg. Long envelope:
    * Σz² wraps at |z| ≈ 100σ across all 64 dims — far beyond any
    * meaningful outlier. */
  def whitenOutliers(emb: DataFrame, n: Long, s1: Array[Long],
      sd: Array[Long], dim: Int = 64, tau: Long = 2L,
      unit: Long = 1000000L, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    whitenMicro(emb, n, s1, sd, unit, idCol, embCol)
      .groupBy(col(idCol))
      .agg(expr(s"sum(z_micro * z_micro) div $dim").as("m2_microsq"))
      .withColumn("is_outlier",
        expr(s"CAST(m2_microsq > $tau * ${unit}L * ${unit}L AS BIGINT)"))

  /** Project every embedding onto a trained milli-unit direction — the
    * corpus-wide serve pass, a pure map (micro-unit scores: milli·milli). */
  def projectMicro(emb: DataFrame, v: Array[Long], idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val vLit = array(v.map(lit(_)): _*)
    emb.select(col(idCol),
      aggregate(zip_with(toMilli(col(embCol)), vLit, (a, b) => a * b),
        lit(0L), (acc, p) => acc + p).as("proj_micro"))
  }

  /** Corpus-wide serve for a trained direction list — one `pc<i>_micro`
    * score column per direction, still a single pure-map pass (the
    * directions ride along as literals; nothing N-dependent). */
  def projectMicroTopR(emb: DataFrame, dirs: Seq[Array[Long]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val xm = toMilli(col(embCol))
    emb.select(col(idCol) +: dirs.zipWithIndex.map { case (v, i) =>
      aggregate(zip_with(xm, array(v.map(lit(_)): _*), (a, b) => a * b),
        lit(0L), (acc, p) => acc + p).as(s"pc${i + 1}_micro")
    }: _*)
  }

  /** All-but-the-top trained statistics (Mu & Viswanath, "All-but-the-
    * Top: Simple and Effective Postprocessing for Word Representations",
    * ICLR 2018): the floored milli mean of the (bounded) training slice
    * (sign-split division, ≤1 milli rounding per coordinate — the
    * quantization IS the contract) plus the top-`r` deflated power
    * directions trained on the CENTERED slice — the two artifacts the
    * serve-side [[abttTransform]] map consumes. The paper's fix for
    * anisotropic embedding spaces ([[graft.ops.Similarity]]
    * `anisotropyByGroup` measures the disease; [[whitenStats]] is the
    * diagonal cure, this is the common-direction one).
    *
    * Scale shape: one posexplode combine-agg to the d-row mean relation
    * (dim-bounded collect), then [[powerDirections]]' trajectory over
    * the centered slice — train-bounded, serve corpus-wide. */
  def abttStats(train: DataFrame, dim: Int = 64, r: Int = 2,
      iters: Int = 3, embCol: String = "embedding")
      : (Array[Long], Seq[Array[Long]]) = {
    val xm0 = train.select(toMilli(col(embCol)).as("xm")).localCheckpoint()
    val agg = xm0.select(posexplode(col("xm")).as(Seq("idx", "x")))
      .groupBy(col("idx"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(row => row.getInt(0) -> ((row.getLong(1), row.getLong(2))))
      .toMap
    val mu = Array.tabulate(dim) { i =>
      val (s, n) = agg.getOrElse(i, (0L, 1L))
      val m = math.abs(s) / math.max(n, 1L)
      if (s < 0) -m else m
    }
    val cent = xm0.select(zip_with(col("xm"),
        array(mu.map(lit(_)): _*), (a, b) => a - b).as("xm"))
      .localCheckpoint()
    (mu, powerDirectionsFromXm(cent, dim, r, iters))
  }

  /** Serve-side all-but-the-top map: x' = deflate_r(…deflate_1(x − μ))
    * with the EXACT sign-split deflation arithmetic of
    * [[powerDirections]] (x'' = (x'·(v·v) − v·(x'·v)) div (v·v),
    * magnitude-then-sign), applied per trained direction in order.
    * Output is the flattened (id, idx, value) relation (the
    * emb_sign_project hash-comparable convention).
    *
    * Shape: the same ARRAY-form deflation as
    * [[powerDirectionsFromXm]]'s training loop — per direction one
    * map-only projection (x·v via `aggregate`, then a `zip_with`
    * update), with a per-direction lazy checkpoint to stop the
    * exponential expression-tree nesting (each step references the
    * previous array twice; without the projection hard-stop, Catalyst
    * inlines the previous 64-element expression into every element of
    * the next — measured 460 s of pure driver planning on 300 vectors).
    * The serve pass is therefore a pure narrow map chain: NO per-id
    * combine-agg, NO equi-join back, no exchange at all until the
    * caller's ordering. (The r15 form was relational — one groupBy +
    * join per direction = 2 shuffles of the corpus-coordinate relation
    * per direction; r16 optimization, identical values.) */
  def abttTransform(emb: DataFrame, mu: Array[Long],
      dirs: Seq[Array[Long]], idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val muLit = array(mu.map(lit(_)): _*)
    var rel = emb.select(col(idCol).as("__id"),
        zip_with(toMilli(col(embCol)), muLit, (a, b) => a - b).as("xm"))
      .localCheckpoint(false)
    for (v <- dirs) {
      val vv = math.max(v.map(x => x * x).sum, 1L)
      val vArr = v.mkString("array(", "L, ", "L)")
      rel = rel
        .withColumn("__xv", aggregate(
          zip_with(col("xm"), array(v.map(lit(_)): _*), (a, b) => a * b),
          lit(0L), (acc, p) => acc + p))
        .selectExpr("__id",
          s"""zip_with(xm, $vArr, (x, vj) -> CASE
             |  WHEN x * ${vv}L - vj * __xv < 0
             |  THEN -((-(x * ${vv}L - vj * __xv)) div ${vv}L)
             |  ELSE (x * ${vv}L - vj * __xv) div ${vv}L END) AS xm"""
            .stripMargin)
        .localCheckpoint(false)
    }
    rel.select(col("__id").as(idCol),
      posexplode(col("xm")).as(Seq("idx", "value")))
  }
}
