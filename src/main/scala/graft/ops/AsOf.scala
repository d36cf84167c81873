package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key (the classic "state at event
  * time" lookup; not in the reference, part of the engine's beyond-parity
  * surface, SURVEY §2.10).
  *
  * Spark has no native as-of join; rather than a BroadcastNestedLoopJoin
  * over a range predicate (quadratic) this uses the union-and-window
  * formulation: tag both inputs, union, and take `last(value, ignoreNulls)`
  * over a (key)-partitioned running window. Cost is one shuffle + sort on
  * the key — the same physical shape as a sort-merge join, so it scales
  * linearly and handles any key cardinality. Right rows sort before left
  * rows at equal ts, giving inclusive (`<=`) semantics.
  *
  * All carried right-side columns travel as ONE struct through ONE window
  * function — so the matched columns always come from the same right row —
  * and the struct itself is the final window sort key, so ties on
  * (key, ts) among right rows resolve deterministically (backward takes the
  * greatest payload struct, forward the least) regardless of partitioning
  * or physical row order. Carried columns must therefore be of orderable
  * types (no maps).
  *
  * Skew note (100 TB): a pathologically hot key serializes into one
  * partition's sort; pre-salting by time-bucket with boundary replay is the
  * standard mitigation and composes with this operator.
  */
object AsOf {

  /** Tag right rows with a `__asof` payload struct (carried cols + right
    * ts), left rows with a typed NULL struct, matching column sets. */
  private def tagged(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightCols: Seq[String], rightSide: Int): (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq
    val payload = F.struct(
      (rightCols.map(c => F.col(c).as("asof_" + c)) :+
        F.col(ts).as(s"asof_$ts")): _*)
    val rTagged = right.select(
      (Seq(F.col(key), F.col(ts), F.lit(rightSide).as("__side"),
        payload.as("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => F.lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (Seq(F.col(key), F.col(ts), F.lit(1 - rightSide).as("__side"),
        F.lit(null).cast(rTagged.schema("__asof").dataType).as("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts).map(F.col)): _*)
    (rTagged, lTagged)
  }

  /** @param rightCols right-side payload columns to carry; they appear in
    *                   the output as `asof_<name>`, NULL when no right row
    *                   precedes the left row.
    * @param toleranceSeconds if set, matches older than `ts - tolerance`
    *                   are nulled out (bounded-staleness as-of). */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.map("asof_" + _) :+ s"asof_$ts"
    val (rTagged, lTagged) = tagged(left, right, key, ts, rightCols, rightSide = 0)
    val w = Window.partitionBy(F.col(key))
      .orderBy(F.col(ts), F.col("__side"), F.col("__asof"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("__asof", F.last(F.col("__asof"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
    val unpacked = carried.foldLeft(matched) { (df, c) =>
      df.withColumn(c, F.col("__asof").getField(c))
    }.drop("__side", "__asof")
    val bounded = toleranceSeconds.fold(unpacked) { tol =>
      // exact microsecond bound — a seconds-truncated cast would widen
      // the window by the left row's fractional second (diverging from
      // the SQL `ts - INTERVAL` definition on sub-second data)
      val stale = F.unix_micros(F.col(s"asof_$ts")) <
        F.unix_micros(F.col(ts)) - tol * 1000000L
      carried.foldLeft(unpacked) { (df, c) =>
        df.withColumn(c, F.when(stale, F.lit(null)).otherwise(F.col(c)))
      }
    }
    bounded.select((leftCols ++ carried).map(F.col): _*)
  }

  /** Forward as-of join — for each left row, the *earliest* right row with
    * `right.ts >= left.ts` within the same key (the "next event after"
    * lookup). Mirror of [[backward]]: same union-and-window shape, with a
    * [current, +inf) frame and `first(ignoreNulls)`. Left rows sort before
    * right rows at equal ts, giving inclusive (`>=`) semantics; ties among
    * right rows resolve to the least payload struct.
    *
    * @param toleranceSeconds if set, matches later than `ts + tolerance`
    *                   are nulled out (bounded look-ahead). */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.map("asof_" + _) :+ s"asof_$ts"
    val (rTagged, lTagged) = tagged(left, right, key, ts, rightCols, rightSide = 1)
    val w = Window.partitionBy(F.col(key))
      .orderBy(F.col(ts), F.col("__side"), F.col("__asof"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("__asof", F.first(F.col("__asof"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 0)
    val unpacked = carried.foldLeft(matched) { (df, c) =>
      df.withColumn(c, F.col("__asof").getField(c))
    }.drop("__side", "__asof")
    val bounded = toleranceSeconds.fold(unpacked) { tol =>
      // exact microsecond bound (see backward)
      val far = F.unix_micros(F.col(s"asof_$ts")) >
        F.unix_micros(F.col(ts)) + tol * 1000000L
      carried.foldLeft(unpacked) { (df, c) =>
        df.withColumn(c, F.when(far, F.lit(null)).otherwise(F.col(c)))
      }
    }
    bounded.select((leftCols ++ carried).map(F.col): _*)
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): for
    * each left row, the right row minimizing |Δts| within the same key
    * and tolerance, ties between the backward and forward candidate
    * resolved BACKWARD (the pandas convention). Composed from one
    * [[backward]] and one [[forward]] pass recombined on a UNIQUE left
    * id — two key-shuffles plus one id equi-join, still no range join
    * anywhere. Per-side ties inherit each pass's deterministic struct
    * resolution (backward greatest, forward least).
    *
    * @param leftIdCol a unique left key for the recombine join. */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], leftIdCol: String,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val carried = rightCols.map("asof_" + _) :+ s"asof_$ts"
    val b = backward(left, right, key, ts, rightCols, toleranceSeconds)
    val f = forward(left, right, key, ts, rightCols, toleranceSeconds)
    val fSide = carried.foldLeft(
        f.select((Seq(leftIdCol) ++ carried).map(F.col): _*)) { (df, c) =>
      df.withColumnRenamed(c, "f_" + c)
    }
    val joined = b.join(fSide, Seq(leftIdCol))
    // exact microsecond deltas — a seconds-truncated compare would
    // misorder sub-second near-ties between the two sides
    val db = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(s"asof_$ts"))
    val dfw = F.unix_micros(F.col(s"f_asof_$ts")) - F.unix_micros(F.col(ts))
    val useBackward = F.col(s"asof_$ts").isNotNull &&
      (F.col(s"f_asof_$ts").isNull || db <= dfw)
    carried.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        F.when(useBackward, F.col(c)).otherwise(F.col("f_" + c)))
    }.drop(carried.map("f_" + _): _*)
  }
}
