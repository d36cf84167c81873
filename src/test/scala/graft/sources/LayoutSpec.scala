package graft.sources

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def withAqeOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bucketed tables join and aggregate with zero exchange") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")
    // a previous JVM's in-memory catalog is gone but its warehouse dirs
    // survive; CTAS refuses to reuse the location
    Seq("ev_bucketed", "users_bucketed").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete(_))
    }
    val events = graft.T.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("value"))
    Layout.writeBucketed(events, "ev_bucketed", Seq("user_id"), 4, Seq("user_id"))
    Layout.writeBucketed(
      events.groupBy("user_id").agg(count(lit(1)).as("n")),
      "users_bucketed", Seq("user_id"), 4)
    withAqeOff {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("users_bucketed"), "user_id")
      val plan = joined.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // the write-time shuffle also covers aggregation on the bucket key
      val agg = spark.table("ev_bucketed").groupBy("user_id")
        .agg(sum(col("value")))
      val aggPlan = agg.queryExecution.sparkPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed agg must not shuffle:\n$aggPlan")
      assert(joined.count() == events.count())
    }
  }

  test("range layout confines a narrow filter to few files") {
    val tmp = Files.createTempDirectory("layout").toString
    val events = graft.T.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_s", col("ts").cast("long"))
    Layout.writeRangeLayout(events, s"$tmp/ranged", "ts_s", 8)
    // same data, value-agnostic layout
    events.repartition(8).write.parquet(s"$tmp/random")

    val r0 = spark.read.parquet(s"$tmp/ranged")
      .agg(min(col("ts_s")), max(col("ts_s"))).head()
    val (lo, hi) = (r0.getLong(0), r0.getLong(1))
    val band = lo + (hi - lo) / 100 // ~1% of the time range
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("ts_s") >= lo && col("ts_s") <= band)
        .select(input_file_name()).distinct().count()
    val ranged = filesTouched(s"$tmp/ranged")
    val random = filesTouched(s"$tmp/random")
    assert(ranged <= 2, s"range layout touched $ranged of 8 files")
    assert(random >= 6, s"random layout unexpectedly clustered: $random files")
  }

  test("z-order layout prunes narrow filters on either column") {
    val tmp = Files.createTempDirectory("zorder").toString
    val events = graft.T.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_s", col("ts").cast("long"))
    Layout.writeZOrderLayout(events, s"$tmp/zorder", "ts_s", "user_id",
      nFiles = 16, bits = 8)
    events.repartition(16).write.parquet(s"$tmp/random")

    def bandOf(path: String, c: String): (Long, Long) = {
      val r = spark.read.parquet(path).agg(min(col(c)), max(col(c))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      (lo, lo + (hi - lo) / 100) // ~1% of the value range
    }
    def filesTouched(path: String, c: String): Long = {
      val (lo, hi) = bandOf(path, c)
      spark.read.parquet(path)
        .filter(col(c) >= lo && col(c) <= hi)
        .select(input_file_name()).distinct().count()
    }
    // ~sqrt-of-files per dimension (4 of 16), with approx-quantile slack
    assert(filesTouched(s"$tmp/zorder", "ts_s") <= 6,
      "z-order must prune on the first column")
    assert(filesTouched(s"$tmp/zorder", "user_id") <= 6,
      "z-order must prune on the second column")
    // control: the same band on a value-agnostic layout touches more
    // files than either z-order dimension (the band holds few rows at
    // sf0.001, so it cannot reach all 16 files — only clearly more)
    assert(filesTouched(s"$tmp/random", "ts_s") > 6,
      "random layout unexpectedly clustered")
    // content preserved
    assert(spark.read.parquet(s"$tmp/zorder").count() ==
      events.count())
  }

  test("compaction bin-packs small files, preserving content") {
    val tmp = Files.createTempDirectory("compact").toString
    val dir = s"$tmp/events"
    val events = graft.T.events(spark, "/root/testdata/sf0.001")
    events.repartition(20).write.parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val sum0 = spark.read.parquet(dir).agg(sum(col("value"))).head().getDouble(0)

    val (before, after) = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(before == 20 && after == 1, s"$before -> $after")
    assert(spark.read.parquet(dir).count() == rows)
    val sum1 = spark.read.parquet(dir).agg(sum(col("value"))).head().getDouble(0)
    assert(math.abs(sum0 - sum1) < 1e-6)
    // idempotent: already-compact directory is left alone
    assert(Layout.compact(spark, dir, targetBytes = 1L << 30) == (1, 1))
  }
}
