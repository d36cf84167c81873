package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the temporal/range primitive for "which
  * sessions/outages/spans overlapped" questions that a raw
  * `a.start <= b.end AND b.start <= a.end` join plans as a nested-loop
  * cross product.
  *
  * Scale shape: each interval explodes to the fixed-width buckets it
  * spans, candidates meet on bucket EQUALITY (a shuffle-partitionable
  * hash join), and every overlapping pair is counted exactly once by
  * keeping only its FIRST shared bucket — the filter
  * `bucket == greatest(startBucket_a, startBucket_b)` — so no
  * `distinct` is needed and input multiplicities are preserved
  * (duplicate input rows produce duplicate output pairs, exactly like
  * the naive join). The exact overlap predicate re-verifies every
  * candidate, so bucketization never changes the result, only the plan.
  *
  * `maxBucketsPerInterval` bounds the explode fan-out: one pathological
  * interval spanning the whole timeline would otherwise replicate into
  * every bucket (the same failure mode RangeJoinRewrite guards with
  * maxBucketsPerRange). The check is in-plan (`raise_error`), failing
  * the job loudly instead of silently exploding.
  */
object Intervals {

  /** Join rows of `a` and `b` whose [start, end] intervals overlap
    * (closed intervals, `longs`; overlap iff aStart <= bEnd and
    * bStart <= aEnd). Output: all columns of `a` then all of `b` —
    * prefix/rename collisions are the caller's to resolve, as with any
    * join.
    *
    * "Inverted" rows (start > end) participate exactly as they would in
    * the raw-predicate join this replaces (and in the
    * [[graft.plans.OverlapJoinRewrite]] auto-rewrite of that predicate):
    * bucketization runs over the NORMALIZED bounds
    * [least(s,e), greatest(s,e)] — the raw predicate holds iff the
    * normalized intervals intersect — and the exact predicate then
    * re-verifies every candidate, so the three overlap paths agree on
    * every input.
    *
    * Both frames' column names must be disjoint (rename before joining,
    * as with any self-join) and the four bound columns integral (cast
    * timestamps to epoch seconds first).
    *
    * @param bucketWidth bucket size in the interval unit; pick it near
    *                    the TYPICAL interval length so most intervals
    *                    explode to 1-2 buckets */
  def overlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: String, e: String, bkCol: String): DataFrame = {
      val lo = s"least($s, $e)"
      val hi = s"greatest($s, $e)"
      val span = expr(s"($hi div $bucketWidth) - ($lo div $bucketWidth) + 1")
      // NULL bounds: span is NULL -> NULL sequence start -> the non-outer
      // explode drops the row, matching the raw join (NULL matches nothing)
      df.withColumn(bkCol, explode(sequence(
        when(span.isNull, lit(null).cast("long"))
          .when(span <= maxBucketsPerInterval,
            expr(s"$lo div $bucketWidth"))
          .otherwise(raise_error(concat(
            lit(s"overlapJoin: interval spans more than " +
              s"$maxBucketsPerInterval buckets at width $bucketWidth — " +
              "raise bucketWidth or maxBucketsPerInterval ("),
            expr(lo).cast("string"), lit(".."), expr(hi).cast("string"),
            lit(")")))),
        expr(s"$hi div $bucketWidth"))))
    }
    val ae = buckets(a, aStart, aEnd, "__bka")
    val be = buckets(b, bStart, bEnd, "__bkb")
    val firstShared = greatest(
      expr(s"least($aStart, $aEnd) div $bucketWidth"),
      expr(s"least($bStart, $bEnd) div $bucketWidth"))
    ae.join(be,
        col("__bka") === col("__bkb") &&
          col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
          col("__bka") === firstShared)
      .drop("__bka", "__bkb")
  }

  /** Merge overlapping-or-touching [start, end] intervals per key into
    * maximal disjoint intervals — the interval-union primitive (coalesce
    * activity windows, outage spans, retention leases; the flatten step
    * before any "total covered time" accounting). Classic island
    * detection, all window expressions: an interval starts a new island
    * iff its start exceeds the running max end of everything before it
    * (per key, ordered by (start, end)); island id = running count of
    * starts; one combine-agg per island emits (min start, max end,
    * member count). Closed-interval semantics: touching endpoints
    * (`start == prev max end`) merge.
    *
    * Scale shape: one shuffle on the key, two frames over one window
    * sort, one combine-agg — the [[graft.ops.Sessions]] posture (a key
    * must fit a partition sort). */
  def mergeOverlaps(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val wPrev = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__maxe", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        (col("__maxe").isNull || col(startCol) > col("__maxe")).cast("long"))
      .withColumn("__island", sum(col("__new")).over(wCum))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }
}
