package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ / Great-Expectations
  * stage every ingestion pipeline runs before anything downstream trusts
  * a table): a set of named constraints is evaluated in ONE aggregate
  * pass and emitted as a constraint-report relation —
  * (constraint, metric_micro, min_required_micro, passed).
  *
  * Every metric is an exact integer micro fraction (null-safe, ties to
  * the repo's no-float-agg oracle discipline). All constraint metrics
  * ride a single `agg(...)` over the table, so the scan happens once and
  * everything except `uniqueness` combines map-side; `uniqueness` is an
  * exact distinct count (Spark plans the shared scan with expand — still
  * one pass over the data, the standard exact-distinct cost).
  *
  * Scale notes (100 TB): one scan, one aggregation to a SINGLE row, then
  * a constant-size stack to |constraints| rows — nothing else moves. The
  * report relation is constraints-sized; thresholds ride the plan as
  * literals.
  */
object Validation {

  /** One named constraint: the metric is the exact micro fraction
    * `num/den` of the two aggregate expressions, passing iff it reaches
    * `minRequiredMicro`. */
  final case class Constraint(name: String, num: Column, den: Column,
      minRequiredMicro: Long)

  private def rows: Column = count(lit(1))

  /** Fraction of rows with `c` non-null. */
  def completeness(name: String, c: Column, thr: Long): Constraint =
    Constraint(name, count(c), rows, thr)

  /** Exact distinct-to-total ratio of `c` (1e6 = fully unique; nulls
    * count toward the denominator, like Deequ's uniqueness-by-rows). */
  def uniqueness(name: String, c: Column, thr: Long): Constraint =
    Constraint(name, countDistinct(c), rows, thr)

  /** Fraction of rows with lo ≤ c ≤ hi (nulls fail). */
  def rangeCompliance(name: String, c: Column, lo: Long, hi: Long,
      thr: Long): Constraint =
    Constraint(name,
      sum(when(c.between(lo, hi), 1L).otherwise(0L)), rows, thr)

  /** Fraction of rows whose `c` is one of `allowed` (nulls fail). */
  def membership(name: String, c: Column, allowed: Seq[String],
      thr: Long): Constraint =
    Constraint(name,
      sum(when(c.isin(allowed: _*), 1L).otherwise(0L)), rows, thr)

  /** Fraction of rows matching a full-string regex (nulls fail). */
  def patternCompliance(name: String, c: Column, pattern: String,
      thr: Long): Constraint =
    Constraint(name,
      sum(when(c.rlike(pattern), 1L).otherwise(0L)), rows, thr)

  /** Fraction of rows satisfying a boolean predicate (nulls fail) —
    * cross-field consistency checks. */
  def predicateCompliance(name: String, p: Column, thr: Long): Constraint =
    Constraint(name, sum(when(p, 1L).otherwise(0L)), rows, thr)

  /** Evaluate all constraints in one aggregate pass; one report row per
    * constraint, ordered by constraint name. */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "constraint names must be unique")
    val aggs = constraints.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.num.cast("long").as(s"__n$i"), c.den.cast("long").as(s"__d$i"))
    }
    val metrics = constraints.indices.map { i =>
      expr(s"(1000000 * __n$i) div greatest(__d$i, 1)").as(s"__m$i")
    }
    // names are unconstrained API input spliced into SQL text — escape
    // single quotes (ADVICE r11: a quote in a name made the stack()
    // expression fail to parse, or worse, alter it)
    val stackArgs = constraints.zipWithIndex.map { case (c, i) =>
      s"'${c.name.replace("'", "''")}', __m$i, ${c.minRequiredMicro}L"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(metrics: _*)
      .select(expr(s"stack(${constraints.size}, $stackArgs)")
        .as(Seq("check_name", "metric_micro", "min_required_micro")))
      .withColumn("passed", col("metric_micro") >= col("min_required_micro"))
      .orderBy(col("check_name"))
  }
}
