package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing: the co-located-join pattern for repeated fact-fact joins at
  * scale — both tables pre-hashed into the same bucket layout on the join
  * key, so the join needs NO exchange of either side (the shuffle is paid
  * once at write time, amortized over every subsequent join).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without any Exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    graft.T.t(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.T.t(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    // disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).toList
      assert(plan.contains("SortMergeJoin"), plan)
      // neither join input is re-shuffled: no Exchange below the join
      assert(!joinSection.exists(_.contains("Exchange hashpartitioning")),
        s"bucketed join should not exchange its inputs:\n$plan")
      // correctness unchanged vs unbucketed
      val expect = graft.T.t(spark, dir, "lineitem")
        .join(graft.T.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
