package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.ip_to_num

/** GeoIP enrichment (SURVEY §2.3 J1; reference: core/aggregator.go:62-66).
  *
  * The reference does an O(1) in-process mmdb lookup per event. The
  * Spark-native design is a **broadcast equi-join**: the range table
  * (~hundreds of k rows — GeoLite2 scale) is exploded so each row covers one
  * /16 bucket, then events join on `bucket = ip >> 16` and filter
  * `start <= ip <= end`. This keeps the join a hash equi-join (never a
  * BroadcastNestedLoopJoin over range predicates), costs no shuffle of the
  * fact side, and scales to any event volume — the 100 TB path.
  *
  * Left-outer semantics: unmatched or unparseable addresses keep NULL
  * country columns, exactly like the reference ignoring lookup errors.
  */
object GeoIp {

  /** Expected geo schema: start_ip_num, end_ip_num, country_code,
    * country_name (FIXTURES.md B.4 — the mmdb content flattened to
    * ranges). [[Mmdb.fromMmdb]] reads the binary `.mmdb` directly into the
    * same schema; this CSV form covers pre-flattened exports. */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true")
      .schema("start_ip_num LONG, end_ip_num LONG, country_code STRING, country_name STRING")
      .csv(path)

  /** Explode each range into its covered /16 buckets. GeoIP ranges are
    * narrow (mostly within one /16), so the blow-up factor is ~1. */
  private[enrich] def bucketed(geo: DataFrame): DataFrame =
    geo.withColumn("bucket",
        explode(sequence(shiftright(col("start_ip_num"), 16),
          shiftright(col("end_ip_num"), 16))))
      .select(col("bucket"), col("start_ip_num"), col("end_ip_num"),
        col("country_code").as("geo_country_code"),
        col("country_name").as("geo_country_name"))

  /** Enrich `events` (any DataFrame with a dotted-quad `addrCol`) with
    * country_code / country_name. Ranges must be non-overlapping (true of
    * GeoIP data) so the join never duplicates events. */
  def enrich(events: DataFrame, geo: DataFrame, addrCol: String = "address"): DataFrame = {
    val g = broadcast(bucketed(geo))
    val ip = ip_to_num(col(addrCol))
    val joined = events
      .withColumn("__ip_num", ip)
      .withColumn("__bucket", shiftright(col("__ip_num"), 16))
      .join(g,
        col("__bucket") === g("bucket") &&
          col("__ip_num") >= g("start_ip_num") &&
          col("__ip_num") <= g("end_ip_num"),
        "left_outer")
    val base = joined
      .withColumn("country_code_r", col("geo_country_code"))
      .withColumn("country_name_r", col("geo_country_name"))
      .drop("bucket", "start_ip_num", "end_ip_num", "geo_country_code",
        "geo_country_name", "__ip_num", "__bucket")
    // overwrite pre-existing country columns if present (backfill S9 path)
    val replaced = Seq("country_code", "country_name").foldLeft(base) { (df, c) =>
      if (df.columns.count(_ == c) > 0) df.drop(c) else df
    }
    replaced
      .withColumnRenamed("country_code_r", "country_code")
      .withColumnRenamed("country_name_r", "country_name")
  }

  /** §3.3 geo backfill (`-geo` flag; core/aggregator.go:174-209): re-resolve
    * every event's country and report how many changed. Batch overwrite —
    * the Spark analogue of its per-row UPDATE loop. */
  def backfill(events: DataFrame, geo: DataFrame): (DataFrame, Column) = {
    val refreshed = enrich(
      events.withColumnRenamed("country_code", "old_country_code")
        .withColumnRenamed("country_name", "old_country_name"),
      geo)
    val changed = coalesce(col("country_code"), lit("")) =!=
      coalesce(col("old_country_code"), lit(""))
    (refreshed.drop("old_country_code", "old_country_name"), changed)
  }
}
