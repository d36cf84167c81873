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
  * over a (key)-partitioned (ts, side)-ordered running window. Cost is one
  * shuffle + sort on the key — the same physical shape as a sort-merge join,
  * so it scales linearly and handles any key cardinality. Right rows sort
  * before left rows at equal ts, giving inclusive (`<=`) semantics.
  *
  * Skew note (100 TB): a pathologically hot key serializes into one
  * partition's sort; pre-salting by time-bucket with boundary replay is the
  * standard mitigation and composes with this operator.
  */
object AsOf {

  /** @param rightCols right-side payload columns to carry; they appear in
    *                   the output as `asof_<name>`, NULL when no right row
    *                   precedes the left row.
    * @param toleranceSeconds if set, matches older than `ts - tolerance`
    *                   are nulled out (bounded-staleness as-of). */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.map("asof_" + _) :+ s"asof_$ts"
    val rTagged = right.select(
      (Seq(F.col(key), F.col(ts), F.lit(0).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => F.lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => F.col(c).as("asof_" + c)) :+
        F.col(ts).as(s"asof_$ts")): _*)
    val lTagged = left.select(
      (Seq(F.col(key), F.col(ts), F.lit(1).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(F.col) ++
        rightCols.map(c =>
          F.lit(null).cast(right.schema(c).dataType).as("asof_" + c)) :+
        F.lit(null).cast(right.schema(ts).dataType).as(s"asof_$ts")): _*)
    val w = Window.partitionBy(F.col(key))
      .orderBy(F.col(ts), F.col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = carried.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
        df.withColumn(c, F.last(F.col(c), ignoreNulls = true).over(w))
      }
      .filter(F.col("__side") === 1)
      .drop("__side")
    val bounded = toleranceSeconds.fold(matched) { tol =>
      val stale = F.col(s"asof_$ts") <
        (F.col(ts).cast("long") - tol).cast("timestamp")
      carried.foldLeft(matched) { (df, c) =>
        df.withColumn(c, F.when(stale, F.lit(null)).otherwise(F.col(c)))
      }
    }
    bounded.select((leftCols ++ carried).map(F.col): _*)
  }

  /** Forward as-of join — for each left row, the *earliest* right row with
    * `right.ts >= left.ts` within the same key (the "next event after"
    * lookup). Mirror of [[backward]]: same union-and-window shape, with a
    * [current, +inf) frame and `first(ignoreNulls)`. Left rows sort before
    * right rows at equal ts, giving inclusive (`>=`) semantics.
    *
    * @param toleranceSeconds if set, matches later than `ts + tolerance`
    *                   are nulled out (bounded look-ahead). */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.map("asof_" + _) :+ s"asof_$ts"
    val rTagged = right.select(
      (Seq(F.col(key), F.col(ts), F.lit(1).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => F.lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => F.col(c).as("asof_" + c)) :+
        F.col(ts).as(s"asof_$ts")): _*)
    val lTagged = left.select(
      (Seq(F.col(key), F.col(ts), F.lit(0).as("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(F.col) ++
        rightCols.map(c =>
          F.lit(null).cast(right.schema(c).dataType).as("asof_" + c)) :+
        F.lit(null).cast(right.schema(ts).dataType).as(s"asof_$ts")): _*)
    val w = Window.partitionBy(F.col(key))
      .orderBy(F.col(ts), F.col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = carried.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
        df.withColumn(c, F.first(F.col(c), ignoreNulls = true).over(w))
      }
      .filter(F.col("__side") === 0)
      .drop("__side")
    val bounded = toleranceSeconds.fold(matched) { tol =>
      val far = F.col(s"asof_$ts") >
        (F.col(ts).cast("long") + tol).cast("timestamp")
      carried.foldLeft(matched) { (df, c) =>
        df.withColumn(c, F.when(far, F.lit(null)).otherwise(F.col(c)))
      }
    }
    bounded.select((leftCols ++ carried).map(F.col): _*)
  }
}
