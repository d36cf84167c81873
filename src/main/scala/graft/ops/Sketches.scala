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
  * Determinism note: the built-in sketches below (approx_count_distinct,
  * approx_percentile, freqItems) are deterministic for a given input
  * *set* but not reproducible across engines; their accuracy bounds are
  * asserted in SketchesSpec against exact aggregates. The engine-portable
  * HLL and Count-Min sections further down trade the built-ins' tuned
  * buffers for md5 + pure-integer arithmetic, making the estimates
  * themselves bit-identical across engines — those power the
  * DuckDB-oracle-checked registry queries.
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

  // ---------------------------------------------------------------------
  // Engine-portable HLL (Flajolet et al. 2007 HyperLogLog): unlike the
  // built-in approx_count_distinct above (whose HLL++ buffers are a Spark
  // implementation detail), every step here is md5 + integer arithmetic,
  // so registers AND estimate replay bit-identically in any SQL engine —
  // this is what upgraded the sketch query from rows-only to a full
  // DuckDB-oracle hash check.
  // ---------------------------------------------------------------------

  /** Register width: 2^b registers; the 60-bit md5 hash splits into a
    * b-bit bucket and a (60-b)-bit tail whose leading-zero rank feeds the
    * register. b=8 → rsd ≈ 1.04/√256 ≈ 6.5%. */
  val HllB = 8

  private val HllSeed = 77

  /** Per-group HLL registers: (group..., bucket, max_rank). THIS relation
    * is the sketch — fixed size (≤ 2^b rows/group), one pass, and
    * mergeable by `max` per bucket (associative/commutative/idempotent),
    * so partial sketches from shards/snapshots union+re-max into the
    * sketch of the union corpus without touching raw values. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = HllB): DataFrame = {
    val wBits = 60 - b
    val wDiv = 1L << wBits
    val rankMax = wBits + 1
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        Dedup.hashStr(col(valueCol).cast("string"), HllSeed).as("__h"): _*)
      .withColumn("__bucket", expr(s"__h div $wDiv"))
      .withColumn("__w", pmod(col("__h"), lit(wDiv)))
      // rank = leading zeros of the wBits-wide tail + 1 = rankMax − bitlen;
      // bin() has no leading zeros in Spark OR DuckDB, so bitlen is its
      // length (w=0 → rank = rankMax, the all-zeros tail)
      .withColumn("__rank", when(col("__w") === 0, lit(rankMax))
        .otherwise(lit(rankMax) - length(bin(col("__w")))))
      .groupBy(groupCols.map(col) :+ col("__bucket").as("bucket"): _*)
      .agg(max(col("__rank")).as("max_rank"))
  }

  /** HLL estimate from the registers, in EXACT integer micro-units: the
    * raw harmonic-mean estimator α·m²/Z with Z scaled by 2^rankMax so
    * every 2^−M_j term is an exact integer, α as the exact rational
    * 7213·m/(10·(1000m+1079)) (the standard α_m constant for m ≥ 128),
    * and ONE integral division at the end — floor semantics agree across
    * engines on the non-negative operands. No logs, no floats: the
    * estimate itself hash-matches the oracle.
    *
    * This is the RAW estimator: below ~2.5m true distinct it biases high
    * (the regime classical HLL patches with linear counting, which needs
    * a log — not integer-exact); the spec pins the error envelope in the
    * sketch's working range instead. */
  def hllCardinality(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = HllB): DataFrame =
    hllCardinalityFromRegisters(hllRegisters(df, groupCols, valueCol, b),
      groupCols, b)

  /** Merge two register relations (e.g. a persisted ledger + the new
    * snapshot's registers): per-bucket max — associative, commutative,
    * idempotent, so ledger updates need only the NEW batch's raw values;
    * history stays a ≤2^b-rows-per-group parquet. */
  def mergeHllRegisters(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("max_rank")).as("max_rank"))

  /** The integer-exact estimate from an existing register relation —
    * the serve side of the ledger flow ([[mergeHllRegisters]]). */
  def hllCardinalityFromRegisters(regs: DataFrame, groupCols: Seq[String],
      b: Int = HllB): DataFrame = {
    val m = 1 << b
    val rankMax = 60 - b + 1
    // est_micro = floor(10⁶·αNum·m²·2^rankMax / (αDen·Zs)),
    // Zs = Σ_buckets 2^(rankMax − M_j)  (empty buckets: M_j = 0)
    val alphaNum = BigInt(7213) * m
    val alphaDen = BigInt(10) * (BigInt(1000) * m + 1079)
    val numerator = BigInt(10).pow(6) * alphaNum * m * m * (BigInt(1) << rankMax)
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $rankMax - max_rank) " +
          "AS DECIMAL(38,0))")).as("__znon"),
        count(lit(1)).as("__nreg"))
      .withColumn("__zs", col("__znon") +
        (lit(m) - col("__nreg")).cast("decimal(38,0)") *
          lit((BigInt(1) << rankMax).toLong).cast("decimal(38,0)"))
      .withColumn("approx_distinct_micro",
        expr(s"CAST($numerator AS DECIMAL(38,0)) div " +
          s"(CAST($alphaDen AS DECIMAL(38,0)) * __zs)"))
      .drop("__znon", "__nreg", "__zs")
  }

  /** Rolling-window distinct users from mergeable weekly HLL sketches —
    * the WAU/MAU stickiness metric every engagement dashboard carries,
    * computed WITHOUT ever re-reading raw history: one pass builds the
    * per-week register ledger; each week's trailing `windowBuckets`-week
    * distinct comes from merging those fixed-size sketches (per-bucket
    * max — the [[mergeHllRegisters]] law), so a year of history costs
    * 52·2^b register rows, not 52 corpus scans. stickiness_micro =
    * unit·WAU div MAU (both raw-estimator micro counts; the ratio
    * inherits the estimator's ±6.5% envelope per side).
    *
    * Scale shape: the ledger is (weeks × 2^b) rows; the rolling merge
    * joins the week spine to it on a range of week ids (tiny × tiny);
    * estimates are per-week combine-aggs. Nothing downstream of the
    * first pass touches raw events. */
  def rollingHllStickiness(df: DataFrame, tsCol: String, valueCol: String,
      windowBuckets: Int = 4, b: Int = HllB,
      unit: Long = 1000000L): DataFrame = {
    require(windowBuckets >= 1, "windowBuckets must be >= 1")
    val weekly = hllRegisters(
      df.withColumn("__wk", expr(s"CAST($tsCol AS LONG) div 604800")),
      Seq("__wk"), valueCol, b)
      .localCheckpoint(false) // the ledger: feeds WAU + the rolling merge
    val wau = hllCardinalityFromRegisters(weekly, Seq("__wk"), b)
      .select(col("__wk").as("week"),
        col("approx_distinct_micro").cast("long").as("wau_micro"))
    val weeks = weekly.select(col("__wk").as("__wt")).distinct()
    val rolled = weekly.join(broadcast(weeks),
        col("__wk") <= col("__wt") &&
          col("__wk") > col("__wt") - windowBuckets)
      .groupBy(col("__wt"), col("bucket"))
      .agg(max(col("max_rank")).as("max_rank"))
    val mau = hllCardinalityFromRegisters(rolled, Seq("__wt"), b)
      .select(col("__wt").as("week"),
        col("approx_distinct_micro").cast("long").as("mau_micro"))
    wau.join(mau, Seq("week"))
      .withColumn("stickiness_micro", expr(
        s"""CAST((CAST($unit AS DECIMAL(38,0)) * wau_micro) div
           |  greatest(mau_micro, 1) AS BIGINT)""".stripMargin))
  }

  /** [[hllCardinality]] alongside the exact distinct count (accuracy
    * dashboards; the exact side is what the sketch avoids at scale). */
  def hllCardinalityWithExact(df: DataFrame, groupCols: Seq[String],
      valueCol: String, b: Int = HllB): DataFrame =
    hllCardinality(df, groupCols, valueCol, b)
      .join(df.groupBy(groupCols.map(col): _*)
        .agg(countDistinct(col(valueCol)).as("exact_distinct")),
        groupCols)

  /** DuckDB mirror of [[hllCardinalityWithExact]] (kept adjacent so the
    * two dialects share constants): `groupCol` and `valueExpr` over
    * `table`, same seed/b/α rationals, same single integral division. */
  def hllCardinalitySql(table: String, groupCol: String, valueExpr: String,
      b: Int = HllB): String = {
    val m = 1 << b
    val wDiv = 1L << (60 - b)
    val rankMax = 60 - b + 1
    val alphaNum = BigInt(7213) * m
    val alphaDen = BigInt(10) * (BigInt(1000) * m + 1079)
    val numerator = BigInt(10).pow(6) * alphaNum * m * m * (BigInt(1) << rankMax)
    s"""WITH hsrc AS (SELECT $groupCol AS g,
       |    CAST('0x' || substring(md5('$HllSeed|' || CAST($valueExpr AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS h
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |regs AS (SELECT g, h // $wDiv AS bucket,
       |    max(CASE WHEN h % $wDiv = 0 THEN $rankMax
       |        ELSE $rankMax - length(bin(h % $wDiv)) END) AS max_rank
       |  FROM hsrc GROUP BY 1, 2),
       |zs AS (SELECT g,
       |    sum(CAST((CAST(1 AS BIGINT) << ($rankMax - max_rank)) AS HUGEINT)) +
       |    ($m - count(*)) * CAST((CAST(1 AS BIGINT) << $rankMax) AS HUGEINT) AS zs
       |  FROM regs GROUP BY 1),
       |ex AS (SELECT $groupCol AS g, count(DISTINCT $valueExpr) AS exact_distinct
       |  FROM $table WHERE $valueExpr IS NOT NULL GROUP BY 1)
       |SELECT z.g AS $groupCol,
       |  CAST($numerator // ($alphaDen * z.zs) AS BIGINT) AS approx_distinct_micro,
       |  ex.exact_distinct
       |FROM zs z JOIN ex ON ex.g = z.g
       |ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Engine-portable Count-Min sketch (Cormode & Muthukrishnan 2005):
  // d md5-hash rows × 2^wBits integer counters. Like the portable HLL
  // above, every step is md5 + integer arithmetic, so the counter
  // relation AND the point estimates replay bit-identically in any SQL
  // engine. The counter relation is the sketch: ≤ d·2^wBits rows no
  // matter the input size, built in one pass with map-side combine, and
  // mergeable across shards/snapshots by per-cell SUM (the estimate of a
  // union corpus = estimates from summed counters).
  // ---------------------------------------------------------------------

  /** Hash rows (d): estimate = min over d independent hashings; error
    * probability decays as (1/2)^d for the standard ε=e/w bound. */
  val CmsD = 4

  /** Counter-array width: 2^wBits counters per hash row. Overcount of a
    * probe is ≤ e·N/2^wBits with prob 1−(1/e)^d (N = input rows). */
  val CmsWBits = 10

  private val CmsSeed = 91

  /** Per-cell counters: (hash_row, bucket, cnt). One explode to d cells
    * per input row, one groupBy — the only shuffle payload is the
    * fixed-size cell key space, independent of input volume. */
  def cmsCounters(df: DataFrame, valueCol: String,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    val w = 1L << wBits
    val cells = (0 until d).map { i =>
      struct(lit(i).as("r"),
        pmod(Dedup.hashStr(col(valueCol).cast("string"), CmsSeed + i), lit(w)).as("b"))
    }
    df.filter(col(valueCol).isNotNull)
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.r").as("hash_row"), col("c.b").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the distinct values of `probes(valueCol)`:
    * min over the d counters each value hashes to (missing cell → 0).
    * The counter side is fixed-size, so it broadcasts — probing is a
    * map-only pass over arbitrarily many probe values. Estimates are
    * deterministic one-sided overcounts: cms_estimate ≥ true count. */
  def cmsEstimates(counters: DataFrame, probes: DataFrame, valueCol: String,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    val w = 1L << wBits
    val cells = (0 until d).map { i =>
      struct(lit(i).as("r"),
        pmod(Dedup.hashStr(col(valueCol).cast("string"), CmsSeed + i), lit(w)).as("b"))
    }
    probes.select(col(valueCol)).distinct()
      .select(col(valueCol), explode(array(cells: _*)).as("c"))
      .join(broadcast(counters),
        col("c.r") === col("hash_row") && col("c.b") === col("bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** Equi-join SIZE estimate from two CMS sketches over the join key
    * (Alon–Gibbons–Matias–Szegedy inner-product estimation): with both
    * sides sketched under the SAME hash rows, row r's bucket-wise dot
    * product Σ_b cntA(r,b)·cntB(r,b) over-estimates \|A ⋈ B\| (collisions
    * only add), so the min over the d rows is a one-sided estimate:
    * est ≥ true always, within e·N_A·N_B/2^wBits w.h.p.
    *
    * The planner primitive: decide whether a join needs the salted/AQE
    * skew path — or is worth running at all — from two fixed-size
    * (d·2^wBits-cell) sketches instead of executing the join. Each side
    * is one map-side-combined pass; the dot product joins two
    * sketch-sized relations — cost independent of data volume. */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame, valueCol: String,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    val ca = cmsCounters(a, valueCol, d, wBits)
    val cb = cmsCounters(b, valueCol, d, wBits)
      .withColumnRenamed("cnt", "cnt_b")
    val dots = ca.join(cb, Seq("hash_row", "bucket"))
      .groupBy(col("hash_row"))
      .agg(sum(col("cnt") * col("cnt_b")).as("dot"))
    // spine over all d rows: a hash row whose buckets never collide has
    // dot 0 and MUST participate in the min (disjoint sides estimate 0,
    // not the smallest nonzero row's dot)
    a.sparkSession.range(d).toDF("hash_row")
      .join(dots, Seq("hash_row"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_size"))
  }

  /** Heavy hitters by sketch, WITH the exact count alongside — the
    * error-bound DEMONSTRATION form (the accuracy contract: estimate ≥
    * exact, overcount bounded in SketchesSpec). The exact_cnt column is
    * demonstrative only: it is computed by the very `groupBy(value)
    * .count()` aggregation the sketch exists to avoid, so this entry
    * point costs MORE than the exact query. For production serving use
    * [[cmsTopK]] (sketch-only); at real scale the exact witness makes
    * sense only on a sampled slice or in a one-off calibration run. */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    val src = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as(valueCol))
    val counters = cmsCounters(src, valueCol, d, wBits)
    cmsEstimates(counters, src, valueCol, d, wBits)
      .join(src.groupBy(col(valueCol)).agg(count(lit(1)).as("exact_cnt")), valueCol)
      .orderBy(col("cms_estimate").desc, col(valueCol))
      .limit(k)
  }

  /** Production heavy-hitters serve: top `k` values by CMS estimate
    * ONLY — no exact-count join anywhere in the plan. The counter
    * relation is fixed-size (d·2^wBits cells) and broadcasts; the probe
    * side pays one distinct pass over the values and a map-side
    * broadcast lookup per (value, hash row); the top-k is a
    * TakeOrderedAndProject heap on (estimate desc, value). This is the
    * entry point to use at scale — [[cmsHeavyHitters]] keeps the exact
    * column as its accuracy demonstration. */
  def cmsTopK(df: DataFrame, valueCol: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    val src = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as(valueCol))
    val counters = cmsCounters(src, valueCol, d, wBits)
    cmsEstimates(counters, src, valueCol, d, wBits)
      .orderBy(col("cms_estimate").desc, col(valueCol))
      .limit(k)
  }

  /** DuckDB mirror of [[cmsTopK]] (shared constants, same md5 cells,
    * same min-over-rows estimate, no exact side). */
  def cmsTopKSql(table: String, valueExpr: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): String = {
    val w = 1L << wBits
    s"""WITH src AS (SELECT CAST($valueExpr AS VARCHAR) AS v
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT
       |    r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM src CROSS JOIN range($d) r(i)),
       |counters AS (SELECT hash_row, bucket, count(*) AS cnt
       |  FROM cells GROUP BY 1, 2),
       |probes AS (SELECT DISTINCT v FROM src),
       |pcells AS (SELECT v, r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM probes CROSS JOIN range($d) r(i)),
       |est AS (SELECT v, min(coalesce(c.cnt, 0)) AS cms_estimate
       |  FROM pcells p LEFT JOIN counters c USING (hash_row, bucket)
       |  GROUP BY 1)
       |SELECT v AS $valueExpr, cms_estimate
       |FROM est
       |ORDER BY cms_estimate DESC, v
       |LIMIT $k""".stripMargin
  }

  /** Per-group heavy hitters by the same CMS construction: one counter
    * array PER GROUP — cells keyed (group…, hash_row, bucket), still
    * ≤ d·2^wBits rows per group and mergeable by sum — then the
    * min-over-rows estimate per (group, value) and a per-group top-k
    * window (group-partitioned, never global). The scale form of exact
    * per-group top-k: the shuffle payload is the fixed-size cell space
    * per group, not the raw value space. */
  def cmsHeavyHittersByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = 1L << wBits
    val cells = (0 until d).map { i =>
      struct(lit(i).as("r"),
        pmod(Dedup.hashStr(col(valueCol).cast("string"), CmsSeed + i), lit(w)).as("b"))
    }
    val src = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("string").as(valueCol): _*)
    // counter-side group columns renamed __cg_* — the probe side joins
    // back to the same lineage, so shared names would be ambiguous
    val counters = src
      .select(groupCols.map(col) :+ explode(array(cells: _*)).as("c"): _*)
      .groupBy(groupCols.map(g => col(g).as(s"__cg_$g")) :+
        col("c.r").as("hash_row") :+ col("c.b").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
    val est = src.dropDuplicates(groupCols :+ valueCol)
      .select(groupCols.map(col) :+ col(valueCol) :+
        explode(array(cells: _*)).as("c"): _*)
      .join(counters,
        groupCols.map(g => col(g) <=> col(s"__cg_$g"))
          .reduce(_ && _) && col("c.r") === col("hash_row") &&
          col("c.b") === col("bucket"), "left")
      .select(groupCols.map(col) :+ col(valueCol) :+
        coalesce(col("cnt"), lit(0L)).as("cnt"): _*)
      .groupBy(groupCols.map(col) :+ col(valueCol): _*)
      .agg(min(col("cnt")).as("cms_estimate"))
    val rank = row_number().over(Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("cms_estimate").desc, col(valueCol)))
    est.withColumn("__rk", rank).filter(col("__rk") <= k).drop("__rk")
  }

  /** DuckDB mirror of [[cmsHeavyHittersByGroup]]. */
  def cmsHeavyHittersByGroupSql(table: String, groupCol: String,
      valueExpr: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): String = {
    val w = 1L << wBits
    s"""WITH src AS (SELECT $groupCol AS g, CAST($valueExpr AS VARCHAR) AS v
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT g, r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM src CROSS JOIN range($d) r(i)),
       |counters AS (SELECT g, hash_row, bucket, count(*) AS cnt
       |  FROM cells GROUP BY 1, 2, 3),
       |probes AS (SELECT DISTINCT g, v FROM src),
       |pcells AS (SELECT g, v, r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM probes CROSS JOIN range($d) r(i)),
       |est AS (SELECT p.g, p.v, min(coalesce(c.cnt, 0)) AS cms_estimate
       |  FROM pcells p LEFT JOIN counters c
       |    ON p.g IS NOT DISTINCT FROM c.g
       |   AND p.hash_row = c.hash_row AND p.bucket = c.bucket
       |  GROUP BY 1, 2),
       |rk AS (SELECT g, v, cms_estimate,
       |    row_number() OVER (PARTITION BY g
       |      ORDER BY cms_estimate DESC, v) AS r
       |  FROM est)
       |SELECT g AS $groupCol, v AS $valueExpr, cms_estimate
       |FROM rk WHERE r <= $k
       |ORDER BY 1, cms_estimate DESC, 2""".stripMargin
  }

  /** DuckDB mirror of [[cmsHeavyHitters]] (adjacent so both dialects
    * share the d/w/seed constants and the min-over-rows estimator). */
  def cmsHeavyHittersSql(table: String, valueExpr: String, k: Int,
      d: Int = CmsD, wBits: Int = CmsWBits): String = {
    val w = 1L << wBits
    s"""WITH src AS (SELECT CAST($valueExpr AS VARCHAR) AS v
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT
       |    r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM src CROSS JOIN range($d) r(i)),
       |counters AS (SELECT hash_row, bucket, count(*) AS cnt
       |  FROM cells GROUP BY 1, 2),
       |probes AS (SELECT DISTINCT v FROM src),
       |pcells AS (SELECT v, r.i AS hash_row,
       |    CAST('0x' || substring(md5(($CmsSeed + r.i) || '|' || v), 1, 15)
       |      AS BIGINT) % $w AS bucket
       |  FROM probes CROSS JOIN range($d) r(i)),
       |est AS (SELECT v, min(coalesce(c.cnt, 0)) AS cms_estimate
       |  FROM pcells p LEFT JOIN counters c USING (hash_row, bucket)
       |  GROUP BY 1),
       |ex AS (SELECT v, count(*) AS exact_cnt FROM src GROUP BY 1)
       |SELECT est.v AS $valueExpr, est.cms_estimate, ex.exact_cnt
       |FROM est JOIN ex USING (v)
       |ORDER BY est.cms_estimate DESC, est.v
       |LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Engine-portable quantile sketch: a log-binned histogram in the style
  // of HdrHistogram (Gil Tene) / DDSketch (Masson, Lee & Pham, VLDB'19) —
  // each power-of-two octave of the micro-unit value axis splits into 16
  // linear sub-bins, so any positive value lands in a bin whose width is
  // ≤ 1/16 of its magnitude (≤ 6.25% relative error) while the whole
  // 63-bit range needs ≤ 16·63 ≈ 1000 bins. Completes the portable-sketch
  // triad (HLL cardinality, CMS frequency, histogram quantiles): bin
  // assignment is bit arithmetic on integers, the histogram merges by
  // per-bin SUM, and quantile extraction is integer rank comparison — so
  // estimates replay bit-identically in any SQL engine.
  // ---------------------------------------------------------------------

  /** Sub-bins per octave (16): bin width ≤ 2^(blen−5) for a blen-bit
    * value, i.e. ≤ 1/16 of the bin's lower bound. */
  val QSubBins = 16

  /** Log-binned histogram of `floor(valueCol·10⁶)` per group:
    * (group…, bin, cnt). Values < 16 micro-units get exact unit bins
    * (ids 1..15); non-positive values pool in bin 0; a blen-bit value
    * (blen ≥ 5) maps to bin 16·blen + top-4-bits-after-the-leading-one.
    * Bin ids increase with value, so rank order is preserved. One pass,
    * map-side combinable, ≤ ~1000 bins per group at any data volume. */
  def histRegisters(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        floor(col(valueCol).cast("double") * lit(1000000.0)).cast("long").as("__x"): _*)
      .withColumn("__blen", length(bin(col("__x"))))
      .withColumn("bin",
        when(col("__x") <= 0, lit(0L))
          .when(col("__x") < 16, col("__x"))
          .otherwise(lit(QSubBins.toLong) * col("__blen") +
            expr("shiftright(__x, __blen - 5)") - 16L))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Lower bound of a histogram bin in micro units — the quantile
    * estimate reported for any rank landing in the bin (one-sided
    * underestimate, ≥ value/(1+1/16)). */
  private def binLo(bin: Column): Column =
    // `div`, not `/`+CAST: float division CASTs truncate in Spark but
    // round in DuckDB — integer division agrees everywhere
    when(bin < 16, bin)
      .otherwise(expr(s"shiftleft(16 + bin % $QSubBins, CAST(bin div $QSubBins AS INT) - 5)")
        .cast("long"))

  /** p50/p90/p99 per group from the log-binned histogram, in exact
    * integer arithmetic: rank target ceil(p·n) compared as
    * cum·den ≥ num·n, first qualifying bin's lower bound reported.
    * The cumulative count is a per-group window (never global). */
  def histQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    histRegisters(df, groupCols, valueCol)
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("__cum") * 2 >= col("__n"), binLo(col("bin")))).as("p50_micro"),
        min(when(col("__cum") * 10 >= col("__n") * 9, binLo(col("bin")))).as("p90_micro"),
        min(when(col("__cum") * 100 >= col("__n") * 99, binLo(col("bin")))).as("p99_micro"),
        sum(col("cnt")).as("n"))
  }

  /** Two-sample Kolmogorov–Smirnov drift between two slices of a numeric
    * column, over the SHARED [[histRegisters]] log-bin space — the
    * distribution-shift companion to [[TextAnalysis.corpusDriftChisq]] (χ² sees
    * reweighted categories; KS sees a shifted/stretched numeric
    * distribution, e.g. document length drifting between crawl
    * snapshots). Exact integer arithmetic on the binned ECDFs:
    *   KS_scaled = max over bins of |cumA·nB − cumB·nA|,
    *   ks_micro  = unit·KS_scaled div (nA·nB),
    * plus the location of the gap (min bin attaining the max, and its
    * [[binLo]] lower bound in micro units) — the "where did it move"
    * diagnostic. Cross-multiplied cumulative products run in
    * DECIMAL(38,0) (HUGEINT in the oracle): cum·n wraps a long at
    * ~3·10⁹ rows per side, far below a 100 TB corpus.
    *
    * Scale shape: ONE corpus pass (the map-side-combined histogram);
    * everything after operates on the ≤ ~1000-row bin relation — the
    * cumulative sums come from a triangular self-join of that tiny
    * relation (never a global window), and the totals ride along as a
    * one-row broadcast. The binning caps KS resolution at the bin width
    * (≤ 1/16 relative) — the standard sketch trade, same as
    * [[histQuantiles]]. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, unit: Long = 1000000L): DataFrame = {
    val h = histRegisters(
      df.filter(col(groupCol).isin(groupA, groupB)), Seq(groupCol), valueCol)
    ksFromCounts(h
      .groupBy(col("bin"))
      .agg(
        sum(when(col(groupCol) === groupA, col("cnt")).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, col("cnt")).otherwise(0L)).as("cb")),
      unit)
  }

  /** KS from PRE-BINNED counts — the mergeable-sketch form of
    * [[ksDrift]]: `bins` is a (bin, ca, cb) relation in the
    * [[histRegisters]] bin space. Because histograms merge by summing,
    * the two sides can come from different jobs, different days, or a
    * persisted reference artifact — which is exactly what
    * [[ksAgainstReference]] and the streaming monitor exploit. */
  def ksFromCounts(binsIn: DataFrame, unit: Long = 1000000L): DataFrame = {
    val bins = binsIn
      .localCheckpoint(false) // ≤ ~1000 rows; feeds both triangular sides + totals
    val cums = bins.as("x")
      .join(bins.select(col("bin").as("__b2"), col("ca").as("__ca2"),
        col("cb").as("__cb2")), col("__b2") <= col("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("__ca2")).as("cuma"), sum(col("__cb2")).as("cumb"))
    val tot = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val d = cums.crossJoin(broadcast(tot))
      .withColumn("__d", expr(
        "abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na)"))
      .localCheckpoint(false) // consumed by the max agg AND the argmax join
    val m = d.groupBy(col("na"), col("nb"))
      .agg(max(col("__d")).as("__dm"))
    m.join(d.select(col("bin"), col("__d").as("__d2")),
        col("__d2") === col("__dm"))
      .groupBy(col("na"), col("nb"), col("__dm"))
      .agg(min(col("bin")).as("ks_bin"))
      .withColumn("ks_micro", expr(
        s"""CAST(($unit * __dm) div
           |  (CAST(greatest(na, 1) AS DECIMAL(38,0)) * greatest(nb, 1))
           |  AS BIGINT)""".stripMargin))
      // binLo's arithmetic inlined against ks_bin (the helper's expr is
      // bound to a column literally named `bin`)
      .withColumn("ks_at_micro", expr(
        s"""CAST(CASE WHEN ks_bin < 16 THEN ks_bin
           |  ELSE shiftleft(16 + ks_bin % $QSubBins,
           |    CAST(ks_bin div $QSubBins AS INT) - 5)
           |END AS BIGINT)""".stripMargin))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("ks_micro"),
        col("ks_bin"), col("ks_at_micro"))
  }

  /** Population Stability Index over the shared log-bin histogram
    * space — the industry model-monitoring drift scalar (the banking
    * convention: <0.1 stable, 0.1–0.25 moderate, >0.25 major shift),
    * here in BITS via the exact fixed-point log2 kernel (the usual
    * natural-log form differs by the constant ln 2; thresholds scale
    * by 1/ln2 ≈ 1.443):
    *
    *   psi = Σ_b (p_b − q_b) · log2(p_b / q_b)
    *
    * Quantization contract, both engines: add-one smoothing per
    * OBSERVED bin (zero counts would blow the log; bins absent from
    * BOTH sides contribute nothing by construction), fractions floored
    * once to micro with a ≥1 clamp (a one-count bin at ≥10⁶ samples
    * floors to 0 micro otherwise — the clamp keeps the log defined and
    * costs ≤1 micro of mass), per-bin terms floored once (both factors
    * share a sign because log2Micro is monotone, so the product is
    * non-negative and truncation = floor in both engines).
    *
    * Output: the per-bin term relation plus the repeated psi total —
    * row-stable for threshold sweeps, and the per-bin terms name WHICH
    * value region drifted (the readout KS's single max-gap bin lacks).
    *
    * Scale: the bin relation is ≤ ~1000 rows at any volume (the
    * [[histRegisters]] guarantee), so everything after the one
    * histogram pass is bounded arithmetic with one-row broadcasts. */
  def psiFromCounts(binsIn: DataFrame, unit: Long = 1000000L): DataFrame = {
    val lg = graft.functions.VectorFunctions.log2_micro _
    // the "observed bin" precondition the smoothing relies on, enforced
    // here rather than assumed of the caller (ADVICE r14): a bin with
    // ca = cb = 0 (e.g. from an outer-joined bin relation) would count
    // toward __nbins and receive add-one mass, skewing every fraction
    val bins = binsIn.filter(col("ca") + col("cb") > 0L)
      .localCheckpoint(false) // ≤ ~1000 rows; totals + terms
    val tot = bins.agg(sum(col("ca")).as("__na"), sum(col("cb")).as("__nb"),
      count(lit(1)).as("__nbins"))
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("p_micro", expr(
        s"greatest(($unit * (ca + 1)) div (__na + __nbins), 1L)"))
      .withColumn("q_micro", expr(
        s"greatest(($unit * (cb + 1)) div (__nb + __nbins), 1L)"))
      .withColumn("__dl", lg(col("p_micro")) - lg(col("q_micro")))
      .withColumn("term_micro",
        expr(s"((p_micro - q_micro) * __dl) div $unit"))
      .localCheckpoint(false) // per-bin relation + the total
    val psi = terms.agg(sum(col("term_micro")).as("psi_micro"))
    terms.crossJoin(broadcast(psi))
      .select(col("bin"), col("ca"), col("cb"), col("p_micro"),
        col("q_micro"), col("term_micro"), col("psi_micro"))
  }

  /** PSI between two slices of one table over the [[histRegisters]]
    * bin space — the [[ksDrift]] companion readout. */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, unit: Long = 1000000L): DataFrame = {
    val h = histRegisters(
      df.filter(col(groupCol).isin(groupA, groupB)), Seq(groupCol), valueCol)
    psiFromCounts(h
      .groupBy(col("bin"))
      .agg(
        sum(when(col(groupCol) === groupA, col("cnt")).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, col("cnt")).otherwise(0L)).as("cb")),
      unit)
  }

  /** DuckDB replay of [[psiDrift]]: the [[ksDriftSql]] binning CTEs,
    * add-one smoothed clamped micro fractions, the caller-supplied
    * value-keyed log2 chain (must consume `vals(v)` and produce
    * `lg(v, l)`), floored per-bin terms, repeated total. */
  def psiDriftSql(table: String, groupCol: String, valueExpr: String,
      groupA: String, groupB: String, log2Ctes: String): String =
    s"""WITH src AS (SELECT $groupCol AS g,
       |    CAST(floor(CAST($valueExpr AS DOUBLE) * 1000000.0) AS BIGINT) AS x
       |  FROM $table WHERE $valueExpr IS NOT NULL
       |    AND $groupCol IN ('$groupA', '$groupB')),
       |binned AS (SELECT g,
       |    CASE WHEN x <= 0 THEN 0
       |         WHEN x < 16 THEN x
       |         ELSE $QSubBins * length(bin(x)) + (x >> (length(bin(x)) - 5)) - 16
       |    END AS bin
       |  FROM src),
       |hist AS (SELECT bin,
       |    CAST(sum(CASE WHEN g = '$groupA' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN g = '$groupB' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM binned GROUP BY bin),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(cb) AS BIGINT) AS nb,
       |    CAST(count(*) AS BIGINT) AS nbins FROM hist),
       |pq AS (SELECT bin, ca, cb,
       |    greatest((1000000 * (ca + 1)) // (na + nbins), 1) AS p_micro,
       |    greatest((1000000 * (cb + 1)) // (nb + nbins), 1) AS q_micro
       |  FROM hist CROSS JOIN tot),
       |vals AS (SELECT p_micro AS v FROM pq
       |  UNION SELECT q_micro FROM pq),
       |$log2Ctes,
       |t AS (SELECT bin, ca, cb, p_micro, q_micro,
       |    ((p_micro - q_micro) * (lp.l - lq.l)) // 1000000 AS term_micro
       |  FROM pq
       |  JOIN lg lp ON lp.v = pq.p_micro
       |  JOIN lg lq ON lq.v = pq.q_micro),
       |ps AS (SELECT CAST(coalesce(sum(term_micro), 0) AS BIGINT)
       |    AS psi_micro FROM t)
       |SELECT bin, ca, cb, p_micro, q_micro,
       |  CAST(term_micro AS BIGINT) AS term_micro, psi_micro
       |FROM t CROSS JOIN ps ORDER BY bin""".stripMargin

  /** KS of a batch against a persisted reference histogram — the
    * monitoring form: `ref` is a (bin, cnt) [[histRegisters]] relation
    * (typically written once by the reference job and read back as a
    * small parquet artifact); the batch is histogrammed in one pass and
    * compared bin-for-bin. */
  def ksAgainstReference(df: DataFrame, ref: DataFrame, valueCol: String,
      unit: Long = 1000000L): DataFrame = {
    val cur = histRegisters(df.withColumn("__g", lit("cur")), Seq("__g"),
      valueCol).select(col("bin"), col("cnt").as("ca"))
    val r = ref.select(col("bin").as("__rb"), col("cnt").as("cb"))
    ksFromCounts(
      cur.join(r, col("bin") === col("__rb"), "full_outer")
        .select(coalesce(col("bin"), col("__rb")).as("bin"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")),
      unit)
  }

  /** Grouped [[ksAgainstReference]]: one KS row PER GROUP against the
    * same reference histogram, in ONE pass — the batch-replay form of
    * the streaming [[driftMonitor]] (each group = one micro-batch of
    * the monitored feed), which is what lets the streaming kernel's
    * arithmetic be ORACLE-CHECKED rather than spec-trusted: replaying
    * the batch partition of a day's events through this produces
    * exactly the rows the monitor would have appended.
    *
    * Scale shape: one map-side-combined histogram pass over the feed;
    * the reference (≤ ~1000 bins) is crossed with the bounded group
    * inventory (monitoring cadence — days/batches, not data volume) so
    * every group sees every reference bin; cumulative sums come from a
    * per-group triangular join of the tiny bin relation (never a
    * global window), per-group max/argmax after. */
  def ksAgainstReferenceByGroup(df: DataFrame, ref: DataFrame,
      groupCol: String, valueCol: String,
      unit: Long = 1000000L): DataFrame = {
    val cur = histRegisters(df, Seq(groupCol), valueCol)
      .select(col(groupCol).as("__g"), col("bin"), col("cnt").as("__ca"))
    val refBinsPerGroup = cur.select(col("__g")).distinct()
      .crossJoin(broadcast(
        ref.select(col("bin"), col("cnt").as("__cb"))))
    val bins = refBinsPerGroup
      .join(cur, Seq("__g", "bin"), "full_outer")
      .select(col("__g"), col("bin"),
        coalesce(col("__ca"), lit(0L)).as("ca"),
        coalesce(col("__cb"), lit(0L)).as("cb"))
      .localCheckpoint(false) // ≤ groups × ~1000 rows; 3 consumers below
    val cums = bins
      .join(bins.select(col("__g").as("__g2"), col("bin").as("__b2"),
          col("ca").as("__ca2"), col("cb").as("__cb2")),
        col("__g2") === col("__g") && col("__b2") <= col("bin"))
      .groupBy(col("__g"), col("bin"))
      .agg(sum(col("__ca2")).as("cuma"), sum(col("__cb2")).as("cumb"))
    val tot = bins.groupBy(col("__g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val d = cums.join(broadcast(tot), Seq("__g"))
      .withColumn("__d", expr(
        "abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na)"))
      .localCheckpoint(false) // consumed by the max agg AND the argmax join
    val m = d.groupBy(col("__g"), col("na"), col("nb"))
      .agg(max(col("__d")).as("__dm"))
    m.join(d.select(col("__g").as("__g3"), col("bin"), col("__d").as("__d2")),
        col("__g3") === col("__g") && col("__d2") === col("__dm"))
      .groupBy(col("__g"), col("na"), col("nb"), col("__dm"))
      .agg(min(col("bin")).as("ks_bin"))
      .withColumn("ks_micro", expr(
        s"""CAST(($unit * __dm) div
           |  (CAST(greatest(na, 1) AS DECIMAL(38,0)) * greatest(nb, 1))
           |  AS BIGINT)""".stripMargin))
      .withColumn("ks_at_micro", expr(
        s"""CAST(CASE WHEN ks_bin < 16 THEN ks_bin
           |  ELSE shiftleft(16 + ks_bin % $QSubBins,
           |    CAST(ks_bin div $QSubBins AS INT) - 5)
           |END AS BIGINT)""".stripMargin))
      .select(col("__g").as(groupCol), col("na").as("n_a"),
        col("nb").as("n_b"), col("ks_micro"), col("ks_bin"),
        col("ks_at_micro"))
  }

  /** Streaming drift monitor: score every micro-batch's `valueCol`
    * distribution against the reference histogram, appending one
    * (batch_id, n_a, n_b, ks_micro, ks_bin, ks_at_micro) row per batch
    * to `outPath` — the alarm feed a data-intake pipeline tails to
    * catch a source going sideways BEFORE the corpus absorbs it. The
    * reference relation is batch-sized (≤ ~1000 bins) and reused every
    * batch; exactly-once via the checkpointed foreachBatch sink, like
    * [[graft.streaming.ReportJob]]. Arithmetic oracle-checked through
    * the batch replay [[ksAgainstReferenceByGroup]]
    * (`streaming_drift_replay`). */
  def driftMonitor(stream: DataFrame, ref: DataFrame, valueCol: String,
      outPath: String, checkpoint: String,
      unit: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ksAgainstReference(batch, ref, valueCol, unit)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** DuckDB mirror of [[ksDrift]] (adjacent so both dialects share the
    * binning and the cross-multiplied ECDF arithmetic). */
  def ksDriftSql(table: String, groupCol: String, valueExpr: String,
      groupA: String, groupB: String): String =
    s"""WITH src AS (SELECT $groupCol AS g,
       |    CAST(floor(CAST($valueExpr AS DOUBLE) * 1000000.0) AS BIGINT) AS x
       |  FROM $table WHERE $valueExpr IS NOT NULL
       |    AND $groupCol IN ('$groupA', '$groupB')),
       |binned AS (SELECT g,
       |    CASE WHEN x <= 0 THEN 0
       |         WHEN x < 16 THEN x
       |         ELSE $QSubBins * length(bin(x)) + (x >> (length(bin(x)) - 5)) - 16
       |    END AS bin
       |  FROM src),
       |hist AS (SELECT bin,
       |    CAST(sum(CASE WHEN g = '$groupA' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN g = '$groupB' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM binned GROUP BY bin),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |          CAST(sum(cb) AS BIGINT) AS nb FROM hist),
       |cums AS (SELECT bin,
       |    CAST(sum(ca) OVER (ORDER BY bin) AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY bin) AS BIGINT) AS cumb
       |  FROM hist),
       |d AS (SELECT bin,
       |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dd
       |  FROM cums CROSS JOIN tot),
       |m AS (SELECT max(dd) AS dm FROM d),
       |am AS (SELECT min(bin) AS ks_bin FROM d, m WHERE d.dd = m.dm)
       |SELECT tot.na AS n_a, tot.nb AS n_b,
       |  CAST((1000000 * m.dm) //
       |    (CAST(greatest(tot.na, 1) AS HUGEINT) * greatest(tot.nb, 1))
       |    AS BIGINT) AS ks_micro,
       |  am.ks_bin,
       |  CAST(CASE WHEN am.ks_bin < 16 THEN am.ks_bin
       |    ELSE (16 + am.ks_bin % $QSubBins) << ((am.ks_bin // $QSubBins) - 5)
       |  END AS BIGINT) AS ks_at_micro
       |FROM tot, m, am""".stripMargin

  /** DuckDB mirror of [[histQuantiles]] (adjacent so both dialects share
    * the binning and rank arithmetic). */
  def histQuantilesSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH src AS (SELECT $groupCol AS g,
       |    CAST(floor(CAST($valueExpr AS DOUBLE) * 1000000.0) AS BIGINT) AS x
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |binned AS (SELECT g,
       |    CASE WHEN x <= 0 THEN 0
       |         WHEN x < 16 THEN x
       |         ELSE $QSubBins * length(bin(x)) + (x >> (length(bin(x)) - 5)) - 16
       |    END AS bin
       |  FROM src),
       |hist AS (SELECT g, bin, count(*) AS cnt FROM binned GROUP BY 1, 2),
       |cums AS (SELECT g, bin, cnt,
       |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY g) AS n
       |  FROM hist),
       |los AS (SELECT g, cum, n,
       |    CASE WHEN bin < 16 THEN bin
       |         ELSE (16 + bin % $QSubBins) << ((bin // $QSubBins) - 5)
       |    END AS lo
       |  FROM cums)
       |SELECT g AS $groupCol,
       |  min(CASE WHEN cum * 2 >= n THEN lo END) AS p50_micro,
       |  min(CASE WHEN cum * 10 >= n * 9 THEN lo END) AS p90_micro,
       |  min(CASE WHEN cum * 100 >= n * 99 THEN lo END) AS p99_micro,
       |  CAST(max(n) AS BIGINT) AS n
       |FROM los GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** One-sided CUSUM changepoint detection (Page 1954) per group over an
    * ordered integer series — the classic sequential drift alarm for a
    * monitored feed (ingest volume, score mass, token counts): alarm as
    * soon as cumulated excess over the reference level `k` passes the
    * decision threshold `h`.
    *
    * The textbook recurrence s_i = max(0, s_{i-1} + x_i − k) is
    * sequential, which would force a per-group sort-and-scan UDF. It
    * has an exact window form: with prefix sums P_i = Σ_{j≤i}(x_j − k),
    *   s_i = P_i − min(0, min_{j≤i} P_j)
    * (the max-with-zero resets are exactly "subtract the lowest prefix
    * seen so far, floored at the empty prefix 0"). Two stacked running
    * windows per group — running sum, then running min — both
    * partition-local after one hash partition by group, no self-joins,
    * all integer arithmetic so the trajectory replays bit-identically.
    *
    * 100 TB shape: the window is per-GROUP (a monitored metric's series;
    * thousands of rows), never a global window; groups parallelize
    * across the cluster. Output: one row per input point with the
    * statistic and the alarm flag.
    *
    * `kCol`/`hCol` are Column expressions so the reference level and
    * decision threshold can come from a per-group baseline join (the
    * usual deployment: k from last month's mean) or be literals. */
  def cusumByGroup(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, kCol: Column, hCol: Column): DataFrame = {
    val byG = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df
      .withColumn("x", col(valueCol).cast("long"))
      .withColumn("__p", sum(col("x") - kCol).over(byG))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(byG)))
      .select(col(groupCol), col(orderCol), col("x"),
        col("cusum"), (col("cusum") > hCol).as("alarm"))
  }

  // ---------------------------------------------------------------------
  // Engine-portable KMV / theta sketch (Bar-Yossef et al. RANDOM'02;
  // Dasgupta et al., "Theta Sketch Framework", 2016): the k MINIMUM
  // distinct 60-bit hash values of a set. Unlike HLL (union-only), KMV
  // supports SET OPERATIONS — intersection / difference cardinality
  // estimates between sketches — which is what answers "how many users
  // do these two event streams share?" without a corpus-sized join.
  // Same portability discipline as the HLL/CMS above: md5 + integer
  // arithmetic only, so registers AND estimates hash-replay in any SQL
  // engine.
  // ---------------------------------------------------------------------

  private val KmvSeed = 83

  /** 2^60 — the hash-space size of [[graft.ops.Dedup.hashStr]]. */
  private val KmvSpace = 1L << 60

  /** Per-group KMV registers: the k smallest DISTINCT hashes of
    * `valueCol` (fewer if the group has < k distinct values). THIS
    * relation is the sketch: ≤ k rows per group, built with one
    * distinct-aggregation + one k-bounded per-group rank, and mergeable
    * (union two register relations, re-take the k smallest — the
    * k-min of a union is a function of the two k-mins). The per-group
    * top-k window is partitioned (never global) and plans as
    * WindowGroupLimit, so only k rows per group survive the shuffle. */
  def kmvRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("h"))
    df.filter(col(valueCol).isNotNull)
      .select(gs :+ Dedup.hashStr(col(valueCol).cast("string"), KmvSeed)
        .as("h"): _*)
      .groupBy(gs :+ col("h"): _*).agg(count(lit(1)).as("__c"))
      .drop("__c")
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .withColumn("rank", col("__r").cast("long")).drop("__r")
  }

  /** Theta-sketch set operations between every PAIR of groups, from the
    * registers alone (the corpora never meet): for groups A, B with
    * k-min sketches, θ = the k-th smallest hash of the union of the two
    * sketches (2^60 when the union carries fewer than k — then the
    * counts are exact, not estimates). Every surviving hash < θ is a
    * uniform sample of A ∪ B at rate θ/2^60, so
    *
    *   est(A ∩ B) = ⌊|{h < θ in both}| · 2^60 / θ⌋
    *   est(A ∪ B) = ⌊|{h < θ}| · 2^60 / θ⌋
    *   est(A \ B) = ⌊|{h < θ in A only}| · 2^60 / θ⌋
    *
    * — exact integer arithmetic (counts ≤ k, θ ≤ 2^60: the product
    * needs DECIMAL(38,0), mirrored HUGEINT in the oracle), one integral
    * division per estimate, floor-consistent across engines.
    *
    * Scale shape: the input is the REGISTER relation (≤ k rows/group).
    * Pairing is a self-equi-join on the hash value to find common
    * hashes plus a per-pair θ from a (groups² × k)-bounded union — all
    * sketch-sized, independent of corpus volume; the group inventory is
    * assumed bounded (event types, sources — the monitoring regime).
    * Output: one row per ordered pair (ga < gb). */
  def kmvSetOps(regs: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = regs.select(col(groupCol).as("ga"), col("h"))
    val b = regs.select(col(groupCol).as("gb"), col("h").as("hb"))
    // union sketch per pair: all hashes of either side, deduped (a hash
    // in both sides appears once), ranked ascending → θ = k-th, or
    // 2^60 if the union is smaller than k
    val pairs = a.select(col("ga")).distinct()
      .join(b.select(col("gb")).distinct(), col("ga") < col("gb"))
    val unioned = pairs.join(a, Seq("ga"))
      .select(col("ga"), col("gb"), col("h"))
      .union(pairs.join(b.select(col("gb"), col("hb").as("h")), Seq("gb"))
        .select(col("ga"), col("gb"), col("h")))
      .distinct()
    val wPair = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val theta = unioned
      .withColumn("__r", row_number().over(wPair))
      .groupBy(col("ga"), col("gb"))
      .agg(max(when(col("__r") === k, col("h"))).as("__thk"),
        count(lit(1)).as("__nu"))
      .withColumn("theta", coalesce(col("__thk"), lit(KmvSpace)))
      .select(col("ga"), col("gb"), col("theta"))
    // membership flags per surviving hash below θ
    val inA = a.withColumn("__ia", lit(1L))
    val inB = b.select(col("gb"), col("hb").as("h"))
      .withColumn("__ib", lit(1L))
    val flags = unioned
      .join(theta, Seq("ga", "gb"))
      .filter(col("h") < col("theta"))
      .join(inA, Seq("ga", "h"), "left")
      .join(inB, Seq("gb", "h"), "left")
      .select(col("ga"), col("gb"), col("theta"),
        coalesce(col("__ia"), lit(0L)).as("ia"),
        coalesce(col("__ib"), lit(0L)).as("ib"))
    val dec = "DECIMAL(38,0)"
    flags.groupBy(col("ga"), col("gb"), col("theta"))
      .agg(sum(col("ia") * col("ib")).as("n_common"),
        count(lit(1)).as("n_union"),
        sum(col("ia") * (lit(1L) - col("ib"))).as("n_only_a"))
      .withColumn("est_inter", expr(
        s"CAST(CAST(n_common AS $dec) * $KmvSpace div theta AS BIGINT)"))
      .withColumn("est_union", expr(
        s"CAST(CAST(n_union AS $dec) * $KmvSpace div theta AS BIGINT)"))
      .withColumn("est_diff_a", expr(
        s"CAST(CAST(n_only_a AS $dec) * $KmvSpace div theta AS BIGINT)"))
  }

  /** DuckDB replay of [[kmvRegisters]] + [[kmvSetOps]] over a table
    * (kept adjacent per the T.sql convention). */
  def kmvSetOpsSql(table: String, groupCol: String, valueExpr: String,
      k: Int): String =
    s"""WITH hsrc AS (SELECT DISTINCT $groupCol AS g,
       |    CAST('0x' || substring(md5('$KmvSeed|' || CAST($valueExpr AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS h
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |regs AS (SELECT g, h FROM (SELECT g, h,
       |    row_number() OVER (PARTITION BY g ORDER BY h) AS r FROM hsrc)
       |  WHERE r <= $k),
       |pairs AS (SELECT DISTINCT a.g AS ga, b.g AS gb
       |  FROM regs a, regs b WHERE a.g < b.g),
       |unioned AS (
       |  SELECT DISTINCT ga, gb, h FROM (
       |    SELECT p.ga, p.gb, r.h FROM pairs p JOIN regs r ON r.g = p.ga
       |    UNION ALL
       |    SELECT p.ga, p.gb, r.h FROM pairs p JOIN regs r ON r.g = p.gb)),
       |theta AS (SELECT ga, gb,
       |    coalesce(max(CASE WHEN r = $k THEN h END), ${KmvSpace}) AS theta
       |  FROM (SELECT ga, gb, h,
       |      row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
       |    FROM unioned) GROUP BY ga, gb),
       |flags AS (SELECT u.ga, u.gb, t.theta,
       |    CASE WHEN ra.h IS NULL THEN 0 ELSE 1 END AS ia,
       |    CASE WHEN rb.h IS NULL THEN 0 ELSE 1 END AS ib
       |  FROM unioned u JOIN theta t ON t.ga = u.ga AND t.gb = u.gb
       |  LEFT JOIN regs ra ON ra.g = u.ga AND ra.h = u.h
       |  LEFT JOIN regs rb ON rb.g = u.gb AND rb.h = u.h
       |  WHERE u.h < t.theta)
       |SELECT ga, gb, theta,
       |  CAST(sum(ia * ib) AS BIGINT) AS n_common,
       |  CAST(count(*) AS BIGINT) AS n_union,
       |  CAST(sum(ia * (1 - ib)) AS BIGINT) AS n_only_a,
       |  CAST(CAST(sum(ia * ib) AS HUGEINT) * $KmvSpace // theta AS BIGINT)
       |    AS est_inter,
       |  CAST(CAST(count(*) AS HUGEINT) * $KmvSpace // theta AS BIGINT)
       |    AS est_union,
       |  CAST(CAST(sum(ia * (1 - ib)) AS HUGEINT) * $KmvSpace // theta AS BIGINT)
       |    AS est_diff_a
       |FROM flags GROUP BY ga, gb, theta
       |ORDER BY ga, gb""".stripMargin
}
