package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  test("fixed-window chunking: offsets, overlap, short tail") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 chars
    val out = Chunking.chunkFixed(docs, size = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // offsets 0,3,6,9 -> abcd, defg, ghij, j
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    // overlap: chunk 0 ends with 'd', chunk 1 starts with 'd'
    val md5d = spark.sql("SELECT md5('defg')").head().getString(0)
    assert(out(1).getString(3) == md5d)
  }

  test("every doc yields at least one chunk, including empty text") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "xy")).toDF("doc_id", "text")
    val out = Chunking.chunkFixed(docs, size = 8, stride = 8)
    assert(out.count() == 2)
    val empty = out.filter(col("doc_id") === 1).head()
    assert(empty.getInt(2) == 0) // zero-length chunk, not a dropped doc
  }

  test("chunking is map-only: no exchange in the plan") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val plan = Chunking.chunkFixed(docs, 4, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("gate corpus stays under the doc_chunks oracle's 100k-char mirror cap") {
    // the DuckDB mirror enumerates offsets from range(0, 100000, 48) —
    // a document of >= 100k chars would silently lose its tail chunks
    // in the ORACLE (the engine has no such bound). Pin the gate data
    // well below the cap so the mirror is exhaustive.
    val maxLen = graft.T.t(spark, "/root/testdata/sf0.01", "documents")
      .agg(max(length(col("text")))).head().getInt(0)
    assert(maxLen < 50000, s"doc_chunks oracle cap at risk: max doc $maxLen chars")
  }

  test("chunkWithText: window texts, short tail, empty doc keeps one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val out = Chunking.chunkWithText(docs, size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out == Map(
      (1L, 0) -> "abcd", (1L, 1) -> "defg", (1L, 2) -> "ghij",
      (1L, 3) -> "j", (2L, 0) -> ""))
    // text is the substring the md5 form hashes: the two forms agree
    val hashed = Chunking.chunkFixed(docs, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    out.foreach { case (k, t) =>
      assert(hashed(k) == org.apache.commons.codec.digest.DigestUtils.md5Hex(t))
    }
  }

  test("sentenceChunks: never cuts a sentence, offsets assign chunks") {
    import spark.implicits._
    val docs = Seq((1L,
      "one two three. four five. six seven eight nine ten. eleven"))
      .toDF("doc_id", "text")
    val got = Chunking.sentenceChunks(docs, budgetWords = 5)
      .collect()
      .map(r => r.getAs[Long]("chunk_idx") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
          r.getAs[String]("chunk_text"))).toMap
    assert(got(0L) == ((2L, 5L, "one two three. four five")) ||
      got(0L) == ((2L, 5L, "one two three four five")),
      s"chunk0: ${got(0L)}")
    assert(got(1L)._2 == 5L && got(1L)._3.startsWith("six"))
    assert(got(2L) == ((1L, 1L, "eleven")))
    // a sentence longer than the budget overflows, never splits
    val long = Seq((2L, "a b c d e f g h i j k l. tail"))
      .toDF("doc_id", "text")
    val lc = Chunking.sentenceChunks(long, budgetWords = 5)
      .collect().map(r => r.getLong(1) -> r.getAs[String]("chunk_text")).toMap
    assert(lc(0L) == "a b c d e f g h i j k l")
    assert(lc(2L) == "tail") // next sentence lands at offset 12 -> chunk 2
    // partition invariance
    val again = Chunking.sentenceChunks(docs.repartition(5), 5)
      .collect().map(_.toSeq).toSet
    assert(again ==
      Chunking.sentenceChunks(docs, 5).collect().map(_.toSeq).toSet)
  }
}
