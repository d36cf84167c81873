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
      val stale = F.col(s"asof_$ts") <
        (F.col(ts).cast("long") - tol).cast("timestamp")
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
      val far = F.col(s"asof_$ts") >
        (F.col(ts).cast("long") + tol).cast("timestamp")
      carried.foldLeft(unpacked) { (df, c) =>
        df.withColumn(c, F.when(far, F.lit(null)).otherwise(F.col(c)))
      }
    }
    bounded.select((leftCols ++ carried).map(F.col): _*)
  }
}
