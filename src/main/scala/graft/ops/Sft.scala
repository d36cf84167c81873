package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / conversation-data preparation: the turn-structure audits that sit
  * between raw document collection and instruction-tuning corpus assembly.
  *
  * The corpus fixture has no native conversation table, so
  * [[conversationView]] derives a deterministic one from `documents`
  * (consecutive doc_id blocks = conversations, n_chars parity = role) — the
  * kernels themselves are schema-generic: any relation with
  * (conv_id, turn_idx, role, text, n_tokens) works.
  *
  * Scale notes (100 TB): every kernel partitions by `conv_id` — the window
  * and the groupBy in [[turnStats]] share one hash partitioning, so each
  * query is a single shuffle keyed on the conversation id (bounded group
  * size: conversations are short). [[responseOpeningDedup]] groups on a
  * ≤`openingTokens`-token key, so only the short opening string shuffles,
  * never the full response text, and the count/min aggregate combines
  * map-side. No global windows, no driver-side state.
  */
object Sft {

  /** Deterministic conversation view over the documents corpus: blocks of
    * `turnsPerConv` consecutive doc_ids form one conversation, turn order is
    * position in the block, and the speaker role is derived from the
    * n_chars parity (a stable per-row attribute, so role sequences contain
    * realistic alternation violations for the audits to find). */
  def conversationView(docs: DataFrame, turnsPerConv: Int = 8): DataFrame =
    docs.select(
      expr(s"doc_id div $turnsPerConv").as("conv_id"),
      (col("doc_id") % turnsPerConv).as("turn_idx"),
      when(col("n_chars") % 2 === 0, "user").otherwise("assistant").as("role"),
      col("text"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))

  /** Per-conversation turn statistics: turn/role counts, token totals, the
    * trainable-token (loss-mask) ratio in integer micro units, the opening
    * role, and the alternation audit — `alternation_ok` iff the conversation
    * opens with a user turn and never repeats a role back-to-back. The lag
    * window and the aggregate share the conv_id hash partitioning (one
    * shuffle total). */
  def turnStats(conv: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("role") === "assistant", col("n_tokens")).otherwise(0L))
          .as("assistant_tokens"),
        min(when(col("turn_idx") === 0, col("role"))).as("first_role"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_role_repeats"))
      .select(col("conv_id"), col("n_turns"), col("n_user"),
        col("n_assistant"), col("total_tokens"), col("assistant_tokens"),
        expr("(1000000 * assistant_tokens) div greatest(total_tokens, 1)")
          .as("assistant_ratio_micro"),
        col("first_role"), col("n_role_repeats"),
        // coalesce: a conversation with no turn_idx-0 row (id gaps) has
        // first_role null — pin the audit to false, not null
        (col("n_role_repeats") === 0 &&
          coalesce(col("first_role") === "user", lit(false)))
          .as("alternation_ok"))
  }

  /** The individual alternation violations behind [[turnStats]]'s boolean:
    * a conversation whose first turn is not the user's
    * (`leading_assistant`) and any turn repeating its predecessor's role
    * (`repeated_role`). Emits only the violating turns — the relation SFT
    * curation quarantines or re-segments before training. */
  def roleViolations(conv: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .filter((col("turn_idx") === 0 && col("role") =!= "user") ||
        (col("role") === col("prev_role")))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        when(col("turn_idx") === 0 && col("role") =!= "user",
          "leading_assistant").otherwise("repeated_role").as("violation"))
  }

  /** Templated-response dedup: assistant turns grouped by their opening
    * (first `openingTokens` whitespace tokens) — the cheap detector for
    * boilerplate/templated responses that exact full-text dedup misses and
    * that degrade instruction diversity. Row-stable over assistant turns:
    * every turn is emitted with its opening's copy count, whether it is the
    * canonical (lowest conv/turn) holder, and where the canonical copy
    * lives. Only the bounded opening key shuffles; the full text never
    * leaves the scan. */
  def responseOpeningDedup(conv: DataFrame,
      openingTokens: Int = 8): DataFrame = {
    val a = conv.filter(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"), col("n_tokens"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, openingTokens),
          " ").as("opening"))
    // canonical holder = lexicographic min over (conv_id, turn_idx) as a
    // struct — derived from the rows themselves (ADVICE r11: the earlier
    // conv_id*turnsPerConv+turn_idx encoding took turnsPerConv as a
    // parameter that could silently disagree with the view and mislabel
    // keep_conv_id/keep_turn_idx; a struct min cannot)
    val g = a.groupBy("opening").agg(
      count(lit(1)).as("n_copies"),
      min(struct(col("conv_id"), col("turn_idx"))).as("keep"))
    a.join(g, Seq("opening"))
      .select(col("conv_id"), col("turn_idx"), col("n_tokens"),
        col("n_copies"),
        (col("conv_id") === col("keep.conv_id") &&
          col("turn_idx") === col("keep.turn_idx")).as("is_canonical"),
        col("keep.conv_id").as("keep_conv_id"),
        col("keep.turn_idx").as("keep_turn_idx"))
  }

  /** Prompt/response token-length ratio per adjacent (user, assistant) turn
    * pair — the audit that surfaces degenerate SFT rows (one-word answers to
    * essay prompts and vice versa). Integer micro-unit ratio, zero-prompt
    * guarded. One conv_id-partitioned lead window, then a filter. */
  def promptResponseRatio(conv: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv
      .withColumn("next_role", lead(col("role"), 1).over(w))
      .withColumn("next_tokens", lead(col("n_tokens"), 1).over(w))
      .filter(col("role") === "user" && col("next_role") === "assistant")
      .withColumn("ratio_micro",
        expr("(1000000 * next_tokens) div greatest(n_tokens, 1)"))
      .select(col("conv_id"), col("turn_idx").as("prompt_turn"),
        col("n_tokens").as("prompt_tokens"),
        col("next_tokens").as("response_tokens"), col("ratio_micro"))
  }
}
