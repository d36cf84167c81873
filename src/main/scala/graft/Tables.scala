package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + deterministic-arithmetic helpers shared by all query
  * registries.
  *
  * Determinism contract with the DuckDB oracle: floating-point SUM/AVG is
  * order-dependent, and both engines aggregate in nondeterministic partition
  * order. All monetary aggregates therefore go through exact integer cents
  * (`round(x*100)` is unambiguous because the synthetic data carries 2-decimal
  * values), are summed as longs, and only converted back to double by a single
  * exact division at the end. Every query orders its output by a unique key
  * set so row order is reproducible too.
  */
object T {

  /** Load one of the driver's parquet tables from an sf directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has carried two `ts` encodings across testdata
    * generations: nanosecond parquet timestamps (which Spark's vectorized
    * reader rejects outright — read as raw nanos via
    * legacy.parquet.nanosAsLong and convert with integer division; a
    * double-based division would lose precision above 2^53 ns) and plain
    * microsecond timestamps (read natively). Dispatch on the loaded type so
    * both generations work; either way the µs value matches DuckDB's
    * CAST(ts AS TIMESTAMP) used by the oracle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Normalize to TimestampType (LTZ) — the type the ns generation
        // produced. Sessions pin spark.sql.session.timeZone=UTC, so the
        // wall-clock values are unchanged; watermarks and long casts
        // (which reject NTZ) keep working.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already a (µs) LTZ timestamp column
    }
  }

  /** Spread a (small, single-partition) input across all cores before a
    * compute-heavy narrow stage. The testdata files are a few MB, so the
    * scan yields 1-2 partitions and CPU-bound stages (regex, hashing,
    * pairwise dot products) would otherwise serialize on one thread. The
    * shuffle moves only the small input once; at production scale the scan
    * is already wide and callers skip this. */
  def par(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  /** Exact cents: 2-decimal double -> long. Same result in DuckDB via
    * CAST(round(x*100, 0) AS BIGINT). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Order-independent exact money sum, returned as double (one exact
    * integer/100.0 division — bit-identical across engines). */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** Order-independent exact money avg: integer cents sum / count, two exact
    * double divisions. */
  def moneyAvg(c: Column): Column = sum(cents(c)) / count(lit(1)) / 100.0

  /** DuckDB-side fragments mirroring the helpers above (kept adjacent so the
    * two dialects stay in sync). */
  object sql {
    def cents(x: String): String = s"CAST(round(($x)*100, 0) AS BIGINT)"
    def moneySum(x: String): String = s"(CAST(sum(${cents(x)}) AS BIGINT) / 100.0)"
    def moneyAvg(x: String): String = s"(CAST(sum(${cents(x)}) AS BIGINT) / count(*) / 100.0)"
  }
}
