package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity._

/** VERDICT r11 item 2: boundary-distance audit for every registry query
  * whose DuckDB oracle replays a round(double, 6) score. The r11 driver
  * gate proved the class is live (sim_bitext_mine flipped on a foreign
  * DuckDB build); bitext was migrated to the integer-micro path, and this
  * spec turns the REMAINING family's "passes on this build by luck" into
  * "passes on any faithful-double build by measured margin".
  *
  * Coverage argument — every rounded-double cosine any registry query
  * computes is drawn from one of these surfaces over the shared
  * embeddings fixture (500 vectors, identical at every SF):
  *
  *  1. CORPUS×CORPUS pairwise cosines: sim_ivf_topk, sim_knn_graph,
  *     sim_rrf_hybrid, rag_chunk_retrieve, emb_* brute/LSH top-k,
  *     near-dup verifies, SemDeDup within-cell pairs — all candidate
  *     relations are SUBSETS of the all-pairs relation (stride centroids
  *     are corpus vectors, so vector×stride-centroid scores are pairs
  *     too).
  *  2. CORPUS×TRAINED-CENTROID cosines, per training iteration: every
  *     KmeansSql.trainCtes consumer replays round(cos, 6) argmax
  *     assignments against c0..c_{iters} — the distinct registry
  *     configs are (k=10, iters=3), (k=16, iters=3), (k=8, iters=2)
  *     (the vid<500/2000/500000 train predicates all resolve to the
  *     full 500-row fixture).
  *  3. SIGN boundaries: lshBucketSql compares dot >= 0 (planes(4)), and
  *     emb_sign_project rounds dot-with-±1-matrix projections to 6.
  *
  * Budget: min margin > 2⁻⁴⁰ ≈ 9.1e-13 score units (9.1e-7 in the
  * 10⁻⁶-grid units roundHalfMarginMin reports) — ~10⁵ × the worst
  * accumulation-order divergence of a 64-term double dot (~1.4e-14).
  * Empirical floor on this corpus: 1.6e-6 grid units (all-pairs).
  */
class BoundaryMarginSpec extends SparkSpec {

  /** 2⁻⁴⁰ score units expressed on the 10⁻⁶ rounding grid. */
  private val BudgetGrid = 9.1e-7

  private lazy val emb = graft.T.t(spark, "/root/testdata/sf0.01", "embeddings")

  test("all pairwise corpus cosines clear the 2^-40 round-half budget") {
    val m = roundHalfMarginMin(pairwiseCosines(emb))
    info(f"all-pairs min margin: $m%.3e grid units (budget $BudgetGrid%.1e)")
    assert(m > BudgetGrid,
      f"pairwise cosine sits $m%.3e from a round-half boundary — the " +
        "rounded-double oracle family is NOT engine-portable on this " +
        "corpus; migrate the affected queries to the integer-micro path")
  }

  test("trained-centroid assignment cosines clear the budget at every iteration") {
    // every iteration's assignment (against c0..c_{iters-1}) and the
    // final serve assignment (against c_iters) replay round(cos, 6)
    for ((k, iters) <- Seq((10, 3), (16, 3), (8, 2))) {
      for (it <- 0 to iters) {
        val cents = trainIvfCentroidsMicro(emb, k = k, iters = it)
        val m = roundHalfMarginMin(centroidCosines(emb, cents))
        info(f"k=$k iter=$it min margin: $m%.3e grid units")
        assert(m > BudgetGrid,
          f"k=$k iteration $it assignment margin $m%.3e under budget")
      }
    }
  }

  test("sign-LSH dots and sign-projection roundings clear their budgets") {
    // lshBucketSql: bucket bit = (dot >= 0) — the boundary is zero, so
    // the margin is min |dot|; budget in raw dot units
    val planes = Similarity.planes(4, 64)
    val pl = spark.createDataFrame(
      planes.zipWithIndex.map { case (p, i) => (i, p.toSeq) }.toSeq)
      .toDF("__p", "__pv")
    val signMin = emb.select(col("embedding").as("__v"))
      .crossJoin(broadcast(pl))
      .select(abs(dot(col("__v"), col("__pv"))).as("__m"))
      .agg(min("__m")).head().getDouble(0)
    info(f"sign-LSH min |dot|: $signMin%.3e")
    assert(signMin > 9.1e-13, f"sign-LSH dot $signMin%.3e too close to 0")
    // emb_sign_project: round(dot-with-±1-row, 6)
    val sm = Similarity.signMatrix(8, 64)
    val smDf = spark.createDataFrame(
      sm.zipWithIndex.map { case (p, i) => (i, p.map(_.toDouble).toSeq) }.toSeq)
      .toDF("__p", "__pv")
    val projScores = emb.select(col("embedding").as("__v"))
      .crossJoin(broadcast(smDf))
      .select(dot(col("__v"), col("__pv")).as("x"))
    val m = roundHalfMarginMin(projScores)
    info(f"sign-projection min round-half margin: $m%.3e grid units")
    assert(m > BudgetGrid)
  }
}
