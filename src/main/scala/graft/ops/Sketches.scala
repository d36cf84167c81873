package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates for corpus-scale profiling: HLL++
  * cardinality and quantile summaries, plus mergeable sketch buffers for
  * incremental / cross-partition rollups.
  *
  * Why sketches at 100 TB: exact COUNT(DISTINCT) needs a shuffle of every
  * distinct value and exact percentiles need a sort (or a full collect of
  * group values); both are unbounded-memory aggregations. The sketch forms
  * are fixed-size, one-pass, map-side-combinable — the only shuffle payload
  * is a few-KB buffer per group, independent of data volume.
  *
  * Determinism note: the estimates are deterministic for a given input
  * *set* (HLL++ and GK summaries are order-insensitive for the merge
  * parameters Spark uses), but not reproducible across engines — so these
  * register as rows-only driver checks; exactness bounds are asserted in
  * SketchesSpec against exact aggregates (rsd / quantile-rank error).
  */
object Sketches {

  /** HLL++ distinct-count per group: fixed-size sketch, map-side merged. */
  def cardinality(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Cardinality alongside the exact count (for accuracy dashboards /
    * tests; the exact side is what the sketch avoids at scale). */
  def cardinalityWithExact(df: DataFrame, groupCols: Seq[String],
      valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        countDistinct(col(valueCol)).as("exact_distinct"))

  /** Approximate quantiles per group (Greenwald-Khanna style summary):
    * one pass, mergeable, bounded error in *rank* (not value). */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsArr = probs.map(_.toString).mkString("array(", ",", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $probsArr, $accuracy)")
        .as("approx_quantiles"))
  }

  /** Frequent items (heavy hitters) per column with minimum support —
    * Karp et al. counting, one pass, no shuffle of raw values. */
  def heavyHitters(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
