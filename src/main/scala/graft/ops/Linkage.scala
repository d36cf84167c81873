package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Probabilistic record linkage (Fellegi & Sunter, JASA 64, 1969) —
  * entity resolution over structured metadata: given candidate pairs
  * (produced by any blocking scheme) with per-field agreement flags,
  * score each pair by the likelihood ratio
  *
  *   R = Π_f  m_f / u_f        (field f agrees)
  *          · (1−m_f) / (1−u_f) (field f disagrees)
  *
  * where m_f = P(agree | match) and u_f = P(agree | non-match). Pairs
  * with R above a threshold link; the ratio orders the review queue in
  * between. The m/u parameters here are SUPERVISED estimates from a
  * labeled column (the production shape when a labeled dev set exists
  * — dedup of author records, affiliation disambiguation; the
  * unsupervised EM alternative of the original paper trades exactness
  * for label-freeness and is intentionally out of scope: its fixpoint
  * is float-iterative and not engine-replayable).
  *
  * Exact arithmetic: counts ride one combine-aggregate; every per-field
  * probability is Laplace-smoothed to the exact rational (c+1)/(N+2)
  * (no zero division when a field never disagrees), and the ratio is
  * ONE floor division of cross-multiplied DECIMAL(38,0) products —
  * engine-portable. Envelope: with F fields, Π num ≤ (N²)^F · 10⁶ must
  * stay under 10³⁸ — F = 3 holds through N ≈ 2·10⁵ candidates, and the
  * kernel now ENFORCES it (static F ≤ 3 require + a runtime
  * raise_error past N = 10^(16/F) − 2) instead of letting non-ANSI
  * decimal overflow null the score silently; wider regimes or more
  * fields score in summed per-field integer log-odds
  * ([[fellegiSunterLogOdds]]), which has no ceiling.
  *
  * Scale shape: one map-side-combined aggregate over the candidate
  * relation to a ONE-ROW parameter relation, broadcast-crossed back —
  * the candidates are touched twice, never shuffled by the scoring.
  * Blocking (the caller's job) is what keeps candidates ≪ corpus²;
  * this kernel is linear in whatever the blocker emits. */
object Linkage {

  /** Score candidate pairs: input columns = any pair identifiers +
    * boolean agreement columns `agreeCols` + boolean `labelCol`.
    * Output: input columns + `ratio_micro` (⌊10⁶·R⌋). */
  def fellegiSunterScores(cands: DataFrame, agreeCols: Seq[String],
      labelCol: String, unit: Long = 1000000L): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    require(agreeCols.size <= 3,
      s"fellegiSunterScores: ${agreeCols.size} agreement fields exceed the " +
        "DECIMAL(38,0) product envelope (max 3) — score with " +
        "fellegiSunterLogOdds, which sums per-field integer log-odds and " +
        "has no field-count ceiling")
    // Runtime envelope guard (VERDICT r12 item 3): num ≤ (N+2)^(2F)·10⁶
    // must stay under 10³⁸ or Spark's non-ANSI decimal overflow silently
    // NULLs ratio_micro. Past N = 10^(16/F) − 2 candidates the CASE
    // raises instead of degrading quietly (the maxCentroids discipline).
    val maxN = math.pow(10.0, 16.0 / agreeCols.size).toLong - 2
    val aggs =
      Seq(sum(col(labelCol).cast("long")).as("__m"),
        sum((!col(labelCol)).cast("long")).as("__u")) ++
        agreeCols.flatMap { f =>
          Seq(sum((col(labelCol) && col(f)).cast("long")).as(s"__ma_$f"),
            sum((!col(labelCol) && col(f)).cast("long")).as(s"__ua_$f"))
        }
    val params = cands.agg(aggs.head, aggs.tail: _*)
    val dec = "DECIMAL(38,0)"
    val num = agreeCols.map { f =>
      s"CAST(CASE WHEN $f THEN (__ma_$f + 1) ELSE (__m - __ma_$f + 1) END" +
        s" AS $dec)"
    }.mkString(" * ") + s" * CAST(__u + 2 AS $dec)" * agreeCols.size
    val den = agreeCols.map { f =>
      s"CAST(CASE WHEN $f THEN (__ua_$f + 1) ELSE (__u - __ua_$f + 1) END" +
        s" AS $dec)"
    }.mkString(" * ") + s" * CAST(__m + 2 AS $dec)" * agreeCols.size
    cands.crossJoin(broadcast(params))
      .withColumn("ratio_micro",
        expr(s"""CAST(CASE WHEN __m + __u > ${maxN}L THEN raise_error(
          |  'fellegiSunterScores: candidate count exceeds the DECIMAL(38,0)
          | envelope for F=${agreeCols.size} fields (max $maxN) — use
          | fellegiSunterLogOdds')
          |ELSE ($num * $unit) div ($den) END AS BIGINT)""".stripMargin
          .replace("\n", "")))
      .drop("__m" +: "__u" +: agreeCols.flatMap(f =>
        Seq(s"__ma_$f", s"__ua_$f")): _*)
  }

  /** Exact micro-units log2 of a positive integer — the deterministic
    * fixed-point kernel both engines replay bit-for-bit:
    *
    *   e    = ⌊log2 n⌋                      (exact bit length)
    *   x₀   = ⌊n·2³² / 2ᵉ⌋ ∈ [2³², 2³³)     (32 fractional bits)
    *   16×:  x ← ⌊x²/2³²⌋; bit = [x ≥ 2³³]; if bit then x ← ⌊x/2⌋
    *   L(n) = ⌊(e·2¹⁶ + frac)·10⁶ / 2¹⁶⌋    (frac = the 16 bits)
    *
    * Every step is integer arithmetic on non-negative operands (one
    * 66-bit square — BigInt here, HUGEINT in a SQL replay), so the
    * value is a pure function of n: the SQL oracle unrolls the same 16
    * steps and matches exactly. Accuracy is 2⁻¹⁶ of a bit ≈ 15.3 micro
    * plus the quantization drift of the truncating squares — more than
    * enough for a scoring weight; DETERMINISM, not last-bit accuracy,
    * is the contract (the two engines agree on every bit by
    * construction). Envelope: 1 ≤ n < 2⁶² (shift headroom). */
  def log2Micro(n: Long): Long = {
    require(n >= 1L && n < (1L << 62), s"log2Micro: $n out of [1, 2^62)")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val x0 = if (e <= 32) n << (32 - e) else n >> (e - 32)
    var x = BigInt(x0)
    var frac = 0L
    val two33 = BigInt(1) << 33
    for (_ <- 1 to 16) {
      x = (x * x) >> 32
      if (x >= two33) { x >>= 1; frac = frac * 2 + 1 }
      else frac = frac * 2
    }
    ((e * 65536L + frac) * 1000000L) / 65536L
  }

  /** [[fellegiSunterScores]] in summed per-field integer log-odds — the
    * documented trade (class doc) that removes the DECIMAL(38,0) product
    * ceiling entirely: instead of one cross-multiplied likelihood-ratio
    * product, each field contributes
    *
    *   w_agree(f)    = L(ma_f+1) + L(u+2) − L(ua_f+1) − L(m+2)
    *   w_disagree(f) = L(m−ma_f+1) + L(u+2) − L(u−ua_f+1) − L(m+2)
    *
    * with L = [[log2Micro]] of the Laplace-smoothed counts, and the pair
    * score is the plain long sum Σ_f w_f — log₂ of the smoothed ratio R
    * in micro units (log base only rescales; the link decision
    * `score > 0` ⇔ `R > 1` is base-free). Any number of fields, any
    * candidate count up to 2⁶² — no overflow path exists.
    *
    * Scale shape: the same ONE map-side-combined aggregate as the ratio
    * form, collapsed to a single driver row (2+2F longs — the bounded
    *-collect discipline of [[Similarity.trainIvfCentroidsMicro]]); the
    * 4F log2Micro calls run on the driver and ride into the plan as
    * literals, so scoring is a map-only pass over the candidates —
    * they are never shuffled. */
  def fellegiSunterLogOdds(cands: DataFrame, agreeCols: Seq[String],
      labelCol: String): DataFrame = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    val aggs =
      Seq(sum(col(labelCol).cast("long")).as("__m"),
        sum((!col(labelCol)).cast("long")).as("__u")) ++
        agreeCols.flatMap { f =>
          Seq(sum((col(labelCol) && col(f)).cast("long")).as(s"__ma_$f"),
            sum((!col(labelCol) && col(f)).cast("long")).as(s"__ua_$f"))
        }
    // ONE row of 2+2F longs — bounded, loud (head() fails on empty input)
    val p: Row = cands.agg(aggs.head, aggs.tail: _*).head()
    val m = p.getLong(0)
    val u = p.getLong(1)
    val lu2 = log2Micro(u + 2)
    val lm2 = log2Micro(m + 2)
    val score = agreeCols.zipWithIndex.map { case (f, i) =>
      val ma = p.getLong(2 + 2 * i)
      val ua = p.getLong(3 + 2 * i)
      val wAgree = log2Micro(ma + 1) + lu2 - log2Micro(ua + 1) - lm2
      val wDis = log2Micro(m - ma + 1) + lu2 - log2Micro(u - ua + 1) - lm2
      s"(CASE WHEN $f THEN ${wAgree}L ELSE ${wDis}L END)"
    }.mkString(" + ")
    cands.withColumn("score_micro", expr(score))
  }
}
