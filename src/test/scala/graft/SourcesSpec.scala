package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond the parquet mainline: CSV and JSON
  * round-trips with explicit schemas (schema inference is a full extra
  * pass at scale — never used), ORC, and corrupt-input tolerance — at
  * 100 TB a single bad file or row must cost a quarantine entry, not the
  * job. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  private val rows = Seq((1L, "alpha", 1.5), (2L, "beta", -0.5), (3L, "gamma", 2.0))

  test("csv round-trip with explicit schema (no inference pass)") {
    val dir = tmp("csv")
    rows.toDF("id", "name", "score").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val back = spark.read.schema("id LONG, name STRING, score DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == rows.toSet)
  }

  test("json lines round-trip with explicit schema") {
    val dir = tmp("json")
    rows.toDF("id", "name", "score").write.mode("overwrite").json(dir)
    val back = spark.read.schema("id LONG, name STRING, score DOUBLE").json(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == rows.toSet)
  }

  test("orc round-trip") {
    val dir = tmp("orc")
    rows.toDF("id", "name", "score").write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == rows.toSet)
  }

  test("malformed json rows quarantine via PERMISSIVE corrupt-record column") {
    val dir = tmp("badjson")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"id": 1, "name": "ok"}
        |this is not json at all
        |{"id": 2, "name": "also ok"}
        |""".stripMargin.getBytes)
    // Spark refuses queries touching ONLY _corrupt_record on the raw read;
    // the documented pattern is to materialize first
    val back = spark.read
      .schema("id LONG, name STRING, _corrupt_record STRING")
      .json(dir).cache()
    try {
      val good = back.filter(col("_corrupt_record").isNull)
      val bad = back.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
    } finally back.unpersist()
  }

  test("a corrupt parquet file is skippable, not fatal (ignoreCorruptFiles)") {
    val dir = tmp("badparquet")
    rows.toDF("id", "name", "score").write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-junk.parquet"),
      "PAR1 this is not a real parquet footer".getBytes)
    val prior = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir).count() == 3)
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }
}
