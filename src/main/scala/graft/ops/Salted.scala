package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations (SURVEY §4 / 100 TB design): a hot key
  * funnels its entire group through one reducer; salting splits each key
  * into `buckets` sub-keys for the wide partial aggregate, then a second
  * (tiny) aggregate over at most `buckets` rows per key merges the partials.
  *
  * Results are bit-identical to the unsalted `groupBy` for the supported
  * merges (counts and exact integer sums are associative), so the DuckDB
  * oracle is simply the plain GROUP BY. Spark's own map-side partial
  * aggregation covers mild skew; explicit salting is for the pathological
  * case where even post-combine per-key volume swamps one task — the
  * tradeoff is one extra (small) shuffle.
  *
  * The salt is a deterministic hash of stable columns — not rand() — so
  * retried tasks recompute identical partials (a rand() salt breaks
  * exactly-once under task retry).
  */
object Salted {

  /** count + long-sum aggregation, salted.
    *
    * @param saltFrom a stable column to derive the salt from (e.g. a
    *                 unique id); hashed mod `buckets`
    * @param sums     (inputCol -> outputName) exact long sums to compute */
  def countAndSums(df: DataFrame, key: Seq[String], saltFrom: Column,
      buckets: Int, sums: Seq[(Column, String)] = Nil,
      countName: String = "n"): DataFrame = {
    val keyCols = key.map(col)
    val partial = df
      .withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__pn"),
        sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__ps$i") }: _*)
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__pn")).as(countName),
        sums.zipWithIndex.map { case ((_, name), i) => sum(col(s"__ps$i")).as(name) }: _*)
  }

  /** Skew-proof equi-join: salt the big side deterministically and
    * replicate the small side once per salt bucket, so a hot join key
    * spreads over `buckets` tasks instead of funneling through one.
    * Results are identical to `big.join(small, key)` — every (big row,
    * small row) key match meets in exactly one salt bucket.
    *
    * This is the manual form of what AQE's skew-join handles for sort-merge
    * joins at runtime; it composes with any join the planner picks and also
    * covers aggregate-after-join patterns AQE can't split. Cost: the small
    * side is shuffled `buckets`-fold (keep it the dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: Seq[String],
      saltFrom: Column, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, key :+ "__salt").drop("__salt")
  }
}
