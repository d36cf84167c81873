package graft

/** Isolated per-query benchmark: one query per fresh-session invocation,
  * WARM-ONLY — the same methodology as [[Bench]] (one discarded warmup
  * execution, then timed samples), so "recorded vs isolated" comparisons
  * measure the same thing. The warmup absorbs the session's one-time
  * costs (parquet footers, codegen compile, executor-pool spin-up, JIT)
  * that a 268-query run pays once but a single-query session would
  * otherwise charge to its first sample; it is still printed (cold=) so
  * the end-to-end first-run cost stays visible. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      // discarded warmup (same as Bench's uncounted full warmup pass)
      val w0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      val cold = (System.nanoTime() - w0) / 1e9
      val ts = (1 to 3).map { _ =>
        // untimed GC before each sample — same hygiene as Bench's
        // warmup/timed boundary: allocation debris from the previous
        // pass (the cold warmup especially) must not trigger a
        // collection inside this one.
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[one] $name%-30s median=${ts.sorted.apply(1)}%.2f cold=$cold%.2f samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
