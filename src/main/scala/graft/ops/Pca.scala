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

  /** Project every embedding onto a trained milli-unit direction — the
    * corpus-wide serve pass, a pure map (micro-unit scores: milli·milli). */
  def projectMicro(emb: DataFrame, v: Array[Long], idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val vLit = array(v.map(lit(_)): _*)
    emb.select(col(idCol),
      aggregate(zip_with(toMilli(col(embCol)), vLit, (a, b) => a * b),
        lit(0L), (acc, p) => acc + p).as("proj_micro"))
  }
}
