package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  test("fellegiSunterScores: hand-computed smoothed likelihood ratios") {
    import spark.implicits._
    // M=1, U=2; ma1=1 ua1=0; ma2=1 ua2=1 (Laplace: (c+1)/(N+2))
    val cands = Seq(
      (1L, 101L, true, true, true),    // num 2·2·4·4=64,  den 1·2·3·3=18
      (2L, 102L, false, true, false),  // num 1·2·16=32,   den 3·2·9=54
      (3L, 103L, false, false, false)) // num 1·1·16=16,   den 3·2·9=54
      .toDF("key_a", "key_b", "a1", "a2", "is_match")
    val got = Linkage.fellegiSunterScores(cands, Seq("a1", "a2"), "is_match")
      .collect().map(r => r.getAs[Long]("key_a") ->
        r.getAs[Long]("ratio_micro")).toMap
    assert(got == Map(1L -> 64000000L / 18L, 2L -> 32000000L / 54L,
      3L -> 16000000L / 54L), got.toString)
  }

  test("fellegiSunterScores: envelope is enforced loudly, not nulled silently") {
    import spark.implicits._
    // static ceiling: a 4th agreement field exceeds the DECIMAL(38,0)
    // product envelope and must fail at call time
    val tiny = Seq((1L, 2L, true, true, true, true, true))
      .toDF("key_a", "key_b", "a1", "a2", "a3", "a4", "is_match")
    val e1 = intercept[IllegalArgumentException] {
      Linkage.fellegiSunterScores(tiny, Seq("a1", "a2", "a3", "a4"), "is_match")
    }
    assert(e1.getMessage.contains("fellegiSunterLogOdds"), e1.getMessage)
    // runtime ceiling: F=3 caps N at 10^(16/3)-2 ≈ 215441 candidates;
    // past it the score column raises instead of overflowing to NULL
    val big = spark.range(220000L)
      .select(col("id").as("key_a"), (col("id") + 1000000L).as("key_b"),
        (col("id") % 2 === 0).as("a1"), (col("id") % 3 === 0).as("a2"),
        (col("id") % 5 === 0).as("a3"), (col("id") % 7 === 0).as("is_match"))
    val e2 = intercept[Exception] {
      Linkage.fellegiSunterScores(big, Seq("a1", "a2", "a3"), "is_match")
        .agg(org.apache.spark.sql.functions.count(col("ratio_micro"))).collect()
    }
    assert(e2.getMessage.contains("envelope") ||
      Option(e2.getCause).exists(_.getMessage.contains("envelope")),
      s"expected a loud envelope failure, got: ${e2.getMessage}")
    // under the ceiling nothing is nulled
    val ok = Linkage.fellegiSunterScores(big.limit(1000),
      Seq("a1", "a2", "a3"), "is_match")
    assert(ok.filter(col("ratio_micro").isNull).count() == 0)
  }

  test("log2Micro: exact on powers of two, monotone, within 16 micro-bits") {
    assert(Linkage.log2Micro(1L) == 0L)
    for (k <- 1 to 40)
      assert(Linkage.log2Micro(1L << k) == k * 1000000L, s"k=$k")
    // log2(3) = 1.5849625..., grid error < 2^-16 of a bit plus
    // truncation drift — assert a tight band, not the exact float
    val l3 = Linkage.log2Micro(3L)
    assert(math.abs(l3 - 1584962L) <= 32L, l3.toString)
    // strictly monotone over a range (squaring-chain determinism check)
    val vals = (1L to 4096L).map(Linkage.log2Micro)
    assert(vals == vals.sorted, "log2Micro must be monotone")
    assert(vals.distinct.size > 4000, "log2Micro must separate magnitudes")
  }

  test("fellegiSunterLogOdds: sign and ranking agree with the ratio form") {
    import spark.implicits._
    val cands = Seq(
      (1L, 101L, true, true, true),
      (2L, 102L, false, true, false),
      (3L, 103L, false, false, false))
      .toDF("key_a", "key_b", "a1", "a2", "is_match")
    val ratio = Linkage.fellegiSunterScores(cands, Seq("a1", "a2"), "is_match")
      .collect().map(r => r.getAs[Long]("key_a") ->
        r.getAs[Long]("ratio_micro")).toMap
    val lo = Linkage.fellegiSunterLogOdds(cands, Seq("a1", "a2"), "is_match")
      .collect().map(r => r.getAs[Long]("key_a") ->
        r.getAs[Long]("score_micro")).toMap
    // log is monotone: the two scorings must rank identically and agree
    // on which side of the R = 1 / score = 0 link threshold each pair is
    for (Seq(x, y) <- Seq(1L, 2L, 3L).combinations(2).map(_.toSeq))
      assert((ratio(x) > ratio(y)) == (lo(x) > lo(y)), s"$x vs $y")
    for (k <- Seq(1L, 2L, 3L))
      assert((ratio(k) > 1000000L) == (lo(k) > 0L), s"sign at $k")
    // hand check one weight path: all-agree score is the sum of the
    // per-field agree weights computed straight from the kernel
    val wA1 = Linkage.log2Micro(2) + Linkage.log2Micro(4) -
      Linkage.log2Micro(1) - Linkage.log2Micro(3)
    val wA2 = Linkage.log2Micro(2) + Linkage.log2Micro(4) -
      Linkage.log2Micro(2) - Linkage.log2Micro(3)
    assert(lo(1L) == wA1 + wA2, s"${lo(1L)} vs ${wA1 + wA2}")
  }

  test("fellegiSunterEm: unsupervised posteriors separate the planted classes") {
    import spark.implicits._
    // same planted mixture as the supervised separation test, but the
    // label is NOT given to the estimator — EM on pattern counts must
    // still push the all-agree pattern above the link threshold and the
    // partial/no-agree patterns below it
    val rows =
      (1L to 50L).map(i => (i, i + 1000L, true, true, true)) ++
        (1L to 100L).map(i => (i, i + 2000L, false, i % 2 == 0, false)) ++
        (1L to 100L).map(i => (i, i + 3000L, i % 3 == 0, false, false))
    val df = rows.toDF("key_a", "key_b", "a1", "a2", "is_match")
    val got = Linkage.fellegiSunterEm(df.drop("is_match"), Seq("a1", "a2"))
      .collect().map(r => (r.getAs[Boolean]("a1"), r.getAs[Boolean]("a2")) ->
        r.getAs[Long]("posterior_micro")).toMap
    assert(got((true, true)) > 500000L, got.toString)
    assert(got((false, true)) < got((true, true)), got.toString)
    assert(got((false, false)) < 500000L, got.toString)
    // deterministic and partition-invariant (pattern counts are exact)
    val again = Linkage.fellegiSunterEm(df.drop("is_match").repartition(7),
        Seq("a1", "a2"))
      .collect().map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Long]("posterior_micro"))).toSet
    val first = Linkage.fellegiSunterEm(df.drop("is_match"), Seq("a1", "a2"))
      .collect().map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Long]("posterior_micro"))).toSet
    assert(again == first)
  }

  test("fellegiSunterScores: matches outrank non-matches; partition-invariant") {
    import spark.implicits._
    // 50 true pairs agreeing on both fields, 200 non-matches agreeing
    // on at most one — every match must clear R > 1, non-matches not
    val rows =
      (1L to 50L).map(i => (i, i + 1000L, true, true, true)) ++
        (1L to 100L).map(i => (i, i + 2000L, false, i % 2 == 0, false)) ++
        (1L to 100L).map(i => (i, i + 3000L, i % 3 == 0, false, false))
    val df = rows.toDF("key_a", "key_b", "a1", "a2", "is_match")
    val scored = Linkage.fellegiSunterScores(df, Seq("a1", "a2"), "is_match")
    val byLabel = scored.groupBy(col("is_match"))
      .agg(min(col("ratio_micro")).as("mn"), max(col("ratio_micro")).as("mx"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLabel(true)._1 > 1000000L, byLabel.toString)
    assert(byLabel(false)._2 < byLabel(true)._1, byLabel.toString)
    val again = Linkage.fellegiSunterScores(df.repartition(7),
        Seq("a1", "a2"), "is_match")
      .collect().map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Long]("ratio_micro"))).toSet
    assert(again == scored.collect().map(r => (r.getAs[Long]("key_a"),
      r.getAs[Long]("key_b"), r.getAs[Long]("ratio_micro"))).toSet)
  }
}
