package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Intervals, Salted}

/** Deliberately-skewed variants of the heaviest shuffle shapes — planted
  * hot keys/buckets at bench scale, so the bench measures the GUARDED
  * path (hot-bucket caps, bucketized overlap joins, salted aggregation)
  * rather than a conveniently uniform corpus. A 100 TB corpus always has
  * the boilerplate cluster / the hour everyone logged in / the one
  * pathological event type; these scenarios are that hour.
  *
  * Run by [[Bench]] after the registry queries (reported in the same
  * per-query map) and asserted in SkewGuardSpec: the guards must change
  * the outcome (quadratic pair listing suppressed, skewed bucket joined
  * with bounded output), not just survive it.
  */
object BenchSkew {

  /** Clones of one document stacked on the bounded corpus slice: every
    * clone shares every MinHash band key, so ONE degenerate bucket holds
    * the clone set and unguarded banding would emit ~clones²/2 candidate
    * pairs from it alone. `maxBucket` drops the hot bucket (the
    * documented recall sacrifice — [[Dedup.lshCandidates]]), keeping the
    * pair stage linear in the corpus. */
  def minhashHotBucket(spark: SparkSession, dir: String,
      clones: Int = 1500, maxBucket: Int = 64): DataFrame = {
    val docs = T.t(spark, dir, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    val hot = docs.filter(col("doc_id") === 0)
      .select(explode(sequence(lit(1000001L), lit(1000000L + clones.toLong)))
        .as("doc_id"), col("text"))
    Dedup.minHashLshPairs(docs.unionByName(hot), threshold = 0.5,
      maxBucket = maxBucket)
  }

  /** One hot hour: thousands of intervals co-located in a single time
    * bucket on the big side, a handful on the small side — the
    * AQE-skew-join shape for [[Intervals.overlapJoin]]. Output stays
    * bounded (hot-a × small-b); the skew lives in the join INPUT
    * distribution, which AQE splits at runtime. */
  def overlapHotBucket(spark: SparkSession, dir: String,
      hotRows: Int = 4000): DataFrame = {
    val base = 3600L * 1000000L // an arbitrary epoch hour
    val ev = T.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))
    val aNormal = ev.select(col("event_id").as("a_id"),
      col("t").as("a_start"), (col("t") + 120L).as("a_end"))
    val aHot = ev.filter(col("event_id") < hotRows)
      .select((col("event_id") + 10000000L).as("a_id"),
        (lit(base) + pmod(col("event_id"), lit(1800L))).as("a_start"))
      .withColumn("a_end", col("a_start") + 120L)
    val bNormal = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("b_id"),
        col("t").as("b_start"), (col("t") + 300L).as("b_end"))
    val bHot = ev.filter(col("event_id") < 5)
      .select((col("event_id") + 20000000L).as("b_id"),
        lit(base).as("b_start"), lit(base + 3000L).as("b_end"))
    Intervals.overlapJoin(
        aNormal.unionByName(aHot), bNormal.unionByName(bHot),
        "a_start", "a_end", "b_start", "b_end", bucketWidth = 3600)
      .select(col("a_id"), col("b_id"))
  }

  /** Planted hot key through the salted two-stage aggregation: half of a
    * doubled event log shares ONE event_type, and the salt must spread it
    * across reducers (the plain groupBy would funnel it into one task). */
  def saltedPlantedHotKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = T.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val hot = ev
      .withColumn("event_type", lit("planted_hot_key"))
      .withColumn("event_id", col("event_id") + 100000000L)
    Salted.countAndSums(ev.unionByName(hot), key = Seq("event_type"),
      saltFrom = col("event_id"), buckets = 32,
      sums = Seq(T.cents(col("value")) -> "value_cents"))
  }

  /** Scenario registry (benched by [[Bench]]; not part of the correctness
    * gate — semantics are spec-asserted in SkewGuardSpec). */
  val scenarios: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_minhash_hot_bucket" -> ((s, d) => minhashHotBucket(s, d)),
    "skew_overlap_hot_bucket" -> ((s, d) => overlapHotBucket(s, d)),
    "skew_salted_hot_key" -> ((s, d) => saltedPlantedHotKey(s, d)))
}
