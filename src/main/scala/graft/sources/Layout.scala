package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout management — the storage-side half of the 100 TB
  * story. Query operators control the COMPUTE shape (what shuffles, what
  * broadcasts); this module controls the STORAGE shape, which decides how
  * much of the 100 TB a query touches at all:
  *
  *  - [[writeBucketed]]: hash-bucketed + sorted tables. Two tables
  *    bucketed the same way join/aggregate with ZERO exchange — the
  *    shuffle was paid once at write time and amortizes over every later
  *    query. The difference between re-shuffling 100 TB per join and
  *    never shuffling it again.
  *  - [[writeRangeLayout]]: range-partition + sort by a clustering column
  *    so parquet row-group min/max statistics become effective — a narrow
  *    time/key filter then reads 1 file in N instead of all of them.
  *  - [[writeZOrderLayout]]: Morton-curve clustering across two columns —
  *    partial file pruning on EITHER filter column, where single-column
  *    range clustering serves only one.
  *  - [[compact]]: bin-packs the small files a streaming sink accretes
  *    into target-size files. Thousands of KB-size micro-batch files turn
  *    scan planning and task scheduling into the bottleneck; compaction
  *    restores scan efficiency without changing row content.
  *
  * The reference has no analogue (its store is a row-store MySQL table,
  * `core/aggregator.go:84`); these are the Spark-native equivalents of
  * what its schema-level indexes were doing.
  */
object Layout {

  /** Write `df` as a hash-bucketed, per-bucket-sorted managed table.
    * Readers joining or aggregating on `bucketCols` get a shuffle-free
    * plan (Spark's bucketing contract: same columns, same count).
    *
    * Bucket count sizing at scale: target ≤ ~1 GB per bucket file —
    * e.g. 100 TB of events by address → 128k buckets; local tests use
    * small counts. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0, "need bucket columns and count")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Range-partition by `clusterCol` into `nFiles` sorted files so every
    * file owns a disjoint value range and parquet min/max stats prune
    * whole files for range/point predicates. One shuffle at write time
    * (sampling range boundaries), zero at read time. */
  def writeRangeLayout(df: DataFrame, path: String, clusterCol: String,
      nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-order (Morton-curve) clustering across TWO filter columns: assign
    * each row an equi-depth quantile bucket per column (2^bits buckets,
    * from one distributed quantile-sketch pass — the driver holds only
    * the boundary arrays), interleave the bucket bits into a z-value,
    * and range-partition + sort by it. Each output file then covers a
    * small RECTANGLE of the (a, b) value space, so parquet min/max
    * stats prune files for narrow predicates on EITHER column —
    * ~sqrt-of-files touched per dimension, where single-column range
    * clustering gives perfect pruning on one column and none on the
    * other. Columns must be numeric (cast timestamps to long first).
    *
    * The z-value is built from shift/and/or built-ins — fully
    * codegen'd, no UDF — and dropped before the write. */
  def writeZOrderLayout(df: DataFrame, path: String, colA: String,
      colB: String, nFiles: Int, bits: Int = 8): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    require(bits > 0 && bits <= 16, "bits must be in [1, 16]")
    val nq = (1 << bits) - 1
    val probs = (1 to nq).map(_.toDouble / (nq + 1)).toArray
    val Array(qa, qb) =
      df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    // bucket = #boundaries <= value (nulls land in bucket 0)
    def bucket(c: String, bounds: Array[Double]) =
      size(filter(lit(bounds), b => b <= col(c).cast("double"))).cast("long")
    def zval(a: Column, b: Column): Column =
      (0 until bits).map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(
            shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_.bitwiseOR(_))
    df.withColumn("__z", zval(bucket(colA, qa), bucket(colB, qb)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a parquet directory's small files into ~`targetBytes` files:
    * read, coalesce to ceil(bytes/target), write alongside, atomically
    * swap via directory rename. `coalesce` (not `repartition`) keeps this
    * shuffle-free — each output file is a concatenation of input
    * partitions. Returns (filesBefore, filesAfter).
    *
    * The swap is rename-based: readers racing the swap see either the old
    * or the new complete directory on a POSIX filesystem. Streaming sinks
    * should compact from a separate maintenance job, not the writer. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val dirPath = Paths.get(dir)
    val parquetFiles = listParquet(dirPath)
    require(parquetFiles.nonEmpty, s"no parquet files under $dir")
    val totalBytes = parquetFiles.map(Files.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val before = parquetFiles.size
    if (nOut >= before) return (before, before) // already compact enough
    val tmp = dir.stripSuffix("/") + ".compacting"
    val old = dir.stripSuffix("/") + ".precompact"
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val after = listParquet(Paths.get(tmp)).size
    Files.move(dirPath, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dirPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(Paths.get(old))
    (before, after)
  }

  private def listParquet(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .toSeq

  private def deleteRecursively(dir: Path): Unit =
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete(_))
}
