package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the context-window
  * preparation step of a training-data pipeline (SURVEY §2.10 extension):
  * long documents are sliced into `size`-char windows every `stride`
  * chars so downstream tokenization sees bounded inputs with
  * `size - stride` chars of overlap preserving cross-boundary context.
  *
  * Map-only: offsets come from a per-row `sequence()` explode and the
  * slice is a `substring` — no shuffle, no state, a pure narrow stage
  * that pipelines straight into the tokenizer/writer at any corpus size.
  * (Token-budgeted chunking swaps the char offsets for token offsets from
  * a tokenizer column; the plumbing is identical.)
  */
object Chunking {

  /** Chunk text into windows of `size` chars starting every `stride`
    * chars (`size > stride` ⇒ overlap). The final window may be shorter
    * than `size`; every document yields at least one chunk (empty text ⇒
    * one empty chunk), so no doc silently disappears.
    *
    * Output: (idCol, chunk_idx, chunk_len, chunk_md5) — the slice itself
    * is hashed rather than carried so the relation stays narrow; callers
    * that need the text select `substring` themselves from the offset
    * `chunk_idx * stride`. */
  def chunkFixed(docs: DataFrame, size: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val chunk = col(textCol).substr(col("__off") + 1, lit(size))
    docs
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0),
          greatest(length(col(textCol)) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "__off")))
      .select(col(idCol), col("chunk_idx"),
        length(chunk).as("chunk_len"), md5(chunk).as("chunk_md5"))
  }

  /** [[chunkFixed]] carrying the chunk TEXT instead of its hash — the
    * form the embedding/indexing path consumes (a RAG pipeline chunks,
    * then embeds each chunk). Same map-only window arithmetic; output
    * (idCol, chunk_idx, chunk_text). */
  def chunkWithText(docs: DataFrame, size: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    docs
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0),
          greatest(length(col(textCol)) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "__off")))
      .select(col(idCol), col("chunk_idx"),
        col(textCol).substr(col("__off") + 1, lit(size)).as("chunk_text"))
  }

  /** Sentence-aligned chunking: split on sentence boundaries (`.` runs —
    * RE2-compatible, no lookbehind, so both engines split identically)
    * and assign each sentence to the chunk its word OFFSET falls in
    * (chunk = offset div budgetWords) — chunks never cut a sentence,
    * hold ≥ 1 sentence each, and a long sentence overflows its chunk
    * instead of being split, which is the standard RAG trade against
    * [[chunkWithText]]'s exact-size windows. Offset-based assignment
    * (rather than greedy remainder-reset packing) is what keeps the
    * operator a pure window expression — greedy packing is inherently
    * sequential per doc and buys little for retrieval chunks.
    *
    * Output: (idCol, chunk_idx, n_sentences, n_words, chunk_text), one
    * row per non-empty chunk; sentence order inside a chunk is preserved
    * via a sort_array over (idx, sentence) structs (partition-invariant,
    * no ORDER-BY-dependent collect_list).
    *
    * Scale shape: one per-doc window (the word-offset running sum) + one
    * combine-agg keyed (doc, chunk) — same skew posture as every per-doc
    * window here. */
  def sentenceChunks(docs: DataFrame, budgetWords: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetWords > 0, "budgetWords must be positive")
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("__i", "__s")))
      .withColumn("__s", trim(col("__s")))
      .filter(col("__s") =!= "")
      .withColumn("__nw", size(split(col("__s"), "\\s+")).cast("long"))
      .withColumn("__off", coalesce(sum(col("__nw")).over(wd), lit(0L)))
      .withColumn("chunk_idx", expr(s"__off div ${budgetWords}L"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_sentences"), sum(col("__nw")).as("n_words"),
        array_join(transform(
          sort_array(collect_list(struct(col("__i"), col("__s")))),
          x => x.getField("__s")), " ").as("chunk_text"))
  }
}
