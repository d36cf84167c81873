package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** [[NormalizeText]] must be indistinguishable from the two-regex
  * formulation it replaced — checked on adversarial hand cases plus
  * seeded random unicode strings, via the SQL engine itself. */
class NormalizeSpec extends SparkSpec {

  private def regexForm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  test("normalize_text equals the regex formulation") {
    import spark.implicits._
    val hand = Seq(
      "", " ", "   ", "a", "A", "Hello, World!", "  a  b  ",
      "ABC123xyz", "tabs\tand\nnewlines", "éàü ÉÀÜ", "ß Straße",
      "punct!!!???...", "mixed É1a _-=+", "中文 text", "emoji 🎉 end",
      "İstanbul I ı", "a" * 500, ("x y " * 100) + "!")
    val gen = Gen.listOfN(400, Gen.chooseNum(0, 0x2FFF).map(_.toChar))
      .map(_.mkString)
    val fuzz = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = (hand ++ fuzz).toDF("s")
    val mismatches = df
      .select(col("s"), TextFunctions.normalize_text(col("s")).as("fast"),
        regexForm(col("s")).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(mismatches == 0)
  }

  test("null passes through") {
    import spark.implicits._
    val r = Seq[String](null).toDF("s")
      .select(TextFunctions.normalize_text(col("s"))).head()
    assert(r.isNullAt(0))
  }
}
