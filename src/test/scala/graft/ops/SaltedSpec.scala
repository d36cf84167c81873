package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedSpec extends SparkSpec {

  test("salted aggregation is bit-identical to plain groupBy") {
    val ev = graft.T.events(spark, "/root/testdata/sf0.001")
    val salted = Salted.countAndSums(ev, Seq("event_type"), col("event_id"),
        buckets = 16, sums = Seq(graft.T.cents(col("value")) -> "cents"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(graft.T.cents(col("value"))).as("cents"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("partial aggregate fans out over the salt (skew split)") {
    import spark.implicits._
    // one pathological key
    val hot = (1L to 1000L).map(i => ("hot", i)).toDF("k", "id")
    val partial = hot.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .groupBy("k", "__salt").count()
    assert(partial.count() == 8) // the hot key split into 8 partial groups
  }

  test("salted join equals the plain join (skew-proof, no dup/loss)") {
    import spark.implicits._
    // skewed: 90% of rows share one key
    val big = (1L to 1000L).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i))
      .toDF("k", "v")
    val dim = Seq(("hot", 1), ("k1", 2), ("k2", 3), ("k3", 4)).toDF("k", "d")
    val plain = big.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val salted = Salted.saltedJoin(big, dim, Seq("k"), col("v"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(salted == plain)
    assert(!Salted.saltedJoin(big, dim, Seq("k"), col("v"), 8).columns.contains("__salt"))
  }

  test("AQE splits a skewed sort-merge join at runtime (the automatic path)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathologically hot key vs a long tail
      val big = (1L to 60000L)
        .map(i => (if (i <= 50000) "hot" else s"k${i % 97}", i, "x" * 32))
        .toDF("k", "v", "pad")
      val dim = (Seq("hot") ++ (0 until 97).map(i => s"k$i")).map((_, 1))
        .toDF("k", "d")
      val j = big.join(dim, Seq("k"))
      // collect() drives THIS Dataset's QueryExecution (count() would build
      // a different one and prune the padding below the skew threshold);
      // the adaptive plan is final only after execution
      assert(j.collect().length == 60000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the hot partition skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
