package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data tests for the declarative validation report: each metric
  * family on a 4-row frame with known nulls, duplicates, and
  * out-of-range/unknown values.
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._
  import Validation._

  private lazy val df = Seq(
    (Option(1L), Option("en"), 10L),
    (Option(1L), Option("zz"), -5L), // dup id, unknown lang, below range
    (Option.empty[Long], Option("de"), 20L),
    (Option(3L), Option.empty[String], 30L),
  ).toDF("id", "lang", "n")

  test("report computes exact micro metrics and verdicts in one pass") {
    val r = report(df, Seq(
      completeness("id_complete", col("id"), 1000000L),
      uniqueness("id_unique", col("id"), 1000000L),
      membership("lang_known", col("lang"), Seq("en", "de"), 400000L),
      rangeCompliance("n_range", col("n"), 0L, 100L, 700000L),
      predicateCompliance("n_positive", col("n") > 0, 800000L)))
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getBoolean(3))).toMap
    assert(r("id_complete") === ((750000L, 1000000L, false)))
    // countDistinct ignores nulls: {1, 3} of 4 rows
    assert(r("id_unique") === ((500000L, 1000000L, false)))
    // zz and null both fail membership
    assert(r("lang_known") === ((500000L, 400000L, true)))
    assert(r("n_range") === ((750000L, 700000L, true)))
    assert(r("n_positive") === ((750000L, 800000L, false)))
  }

  test("duplicate constraint names are rejected") {
    intercept[IllegalArgumentException] {
      report(df, Seq(
        completeness("x", col("id"), 1L),
        completeness("x", col("lang"), 1L)))
    }
  }

  test("constraint names containing quotes survive verbatim (ADVICE r11)") {
    // a single quote used to break (or alter) the stack() SQL splice
    val name = "id's completeness, 100%'; --"
    val r = report(df, Seq(completeness(name, col("id"), 1L))).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === name)
  }
}
