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
