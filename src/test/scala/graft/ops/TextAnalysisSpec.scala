package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().get(0)
  }

  test("token counting: whitespace and subword") {
    assert(one("hello world  foo", TextAnalysis.tokenCount(col("text"))) == 3)
    // "don't stop!" -> don, ', t, stop, ! = 5 subword tokens
    assert(one("don't stop!", TextAnalysis.subwordTokenCount(col("text"))) == 5)
  }

  test("punct and stopword ratios") {
    assert(one("no punct here", TextAnalysis.punctRatio(col("text"))) == 0.0)
    val p = one("a,b.c!", TextAnalysis.punctRatio(col("text"))).asInstanceOf[Double]
    assert(p == 3.0 / 6.0)
    val s = one("the cat is on a mat", TextAnalysis.stopwordRatio(col("text"))).asInstanceOf[Double]
    assert(s == 3.0 / 6.0) // the, is, a
  }

  test("language guess by marker voting") {
    assert(one("the quick fox is in the barn", TextAnalysis.langGuess(col("text"))) == "en")
    assert(one("der hund und die katze ist", TextAnalysis.langGuess(col("text"))) == "de")
    assert(one("el perro y la casa es bonita", TextAnalysis.langGuess(col("text"))) == "es")
    assert(one("le chien et les chats est", TextAnalysis.langGuess(col("text"))) == "fr")
    assert(one("xyzzy qwerty", TextAnalysis.langGuess(col("text"))) == "unknown")
  }

  test("fingerprints are normalization-invariant") {
    val a = one("Hello,  World!", TextAnalysis.fingerprint(col("text")))
    val b = one("hello world", TextAnalysis.fingerprint(col("text")))
    assert(a == b)
  }

  test("robust fingerprint survives a small local edit") {
    // min-of-window-hashes: an edit near the end usually leaves the global
    // min window untouched
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and AGAIN")
    import spark.implicits._
    val fps = texts.toDF("text")
      .select(TextAnalysis.robustFingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    // ...but a completely different text changes it
    val other = one("entirely unrelated content here", TextAnalysis.robustFingerprint(col("text")))
    assert(other != fps(0))
  }

  test("quality score bounds and monotony") {
    val good = one("the quick brown fox is seen in a glen and it runs to the den",
      TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val bad = one("!!! ??? ,,, ...", TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(good > bad)
    assert(good <= 1.0 && bad >= 0.0)
  }

  test("profile emits one row per doc with all features") {
    val df = TextAnalysis.profile(graft.T.t(spark, "/root/testdata/sf0.001", "documents"))
    assert(df.columns.length == 10)
    assert(df.count() == 500)
  }
}
