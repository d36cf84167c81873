package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a list of registered queries to
  * files — the plan evidence the optimization rounds commit under
  * `plans/r<N>/`. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>
  * writes <outDir>/<query>_<suffix>.txt per query. Plans are built (not
  * executed), so this is cheap and load-independent.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plan] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        println(s"[plan] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
