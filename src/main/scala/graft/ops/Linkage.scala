package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * stay under 10³⁸ — F = 3 holds through N ≈ 10⁵ candidates; wider
  * regimes or more fields should score in per-field integer log-odds
  * lookup tables instead (documented trade, not implemented).
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
        expr(s"CAST(($num * $unit) div ($den) AS BIGINT)"))
      .drop("__m" +: "__u" +: agreeCols.flatMap(f =>
        Seq(s"__ma_$f", s"__ua_$f")): _*)
  }
}
