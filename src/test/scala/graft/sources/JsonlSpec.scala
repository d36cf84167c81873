package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tdir(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("round trip preserves content including newlines and unicode") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two\ttabbed"),
      (3L, "unicode: café 中文 \"quoted\""),
      (4L, "")).toDF("doc_id", "text")
    val path = tdir("graft-jsonl")
    Jsonl.write(docs, path, shards = 2)
    val (clean, quarantine) = Jsonl.read(spark, path, schema)
    assert(quarantine.count() == 0)
    val got = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == exp)
    // sharded write produced the asked-for part files
    val parts = new java.io.File(path).listFiles
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 2, s"expected 2 shards, found $parts")
  }

  test("malformed lines quarantine with the raw line; clean rows survive") {
    val path = tdir("graft-jsonl-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/shard.jsonl"),
      """{"doc_id": 1, "text": "good"}
        |{torn json line
        |{"doc_id": 2, "text": "also good"}
        |""".stripMargin)
    val (clean, quarantine) = Jsonl.read(spark, path, schema)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.startsWith("{torn"), bad.toSeq)
  }

  test("gzip write reads back identically") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val path = tdir("graft-jsonl-gz")
    Jsonl.write(docs, path, shards = 1, gzip = true)
    assert(new java.io.File(path).listFiles.exists(_.getName.endsWith(".gz")))
    val (clean, q) = Jsonl.read(spark, path, schema)
    assert(q.count() == 0 && clean.count() == 50)
  }
}
