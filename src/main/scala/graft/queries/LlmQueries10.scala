package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.T
import graft.ops.Sft

/** Round-11 registry: SFT / conversation-data preparation — the
  * turn-structure audits an instruction-tuning corpus needs between raw
  * collection and training (turn stats + loss-mask ratios, role-alternation
  * validation, templated-response dedup, prompt/response length audit).
  */
object LlmQueries10 {

  private def conv(spark: SparkSession, dir: String): DataFrame =
    Sft.conversationView(T.par(spark, T.t(spark, dir, "documents")))

  /** Per-conversation turn statistics over the derived conversation view
    * ([[Sft.turnStats]]): role counts, token totals, the trainable-token
    * (loss-mask) micro ratio, and the alternation audit flag. */
  def sftTurnStats(spark: SparkSession, dir: String): DataFrame =
    Sft.turnStats(conv(spark, dir)).orderBy(col("conv_id"))

  /** Individual role-alternation violations ([[Sft.roleViolations]]):
    * assistant-first conversations and back-to-back same-role turns. */
  def sftRoleViolations(spark: SparkSession, dir: String): DataFrame =
    Sft.roleViolations(conv(spark, dir))
      .orderBy(col("conv_id"), col("turn_idx"))

  /** Templated-response dedup ([[Sft.responseOpeningDedup]]): assistant
    * turns keyed by their first 8 whitespace tokens, each row flagged with
    * its opening's copy count and canonical holder. */
  def sftResponseDedup(spark: SparkSession, dir: String): DataFrame =
    Sft.responseOpeningDedup(conv(spark, dir))
      .orderBy(col("conv_id"), col("turn_idx"))

  /** Prompt/response token-length ratio for adjacent (user, assistant)
    * pairs ([[Sft.promptResponseRatio]]). */
  def sftPairRatio(spark: SparkSession, dir: String): DataFrame =
    Sft.promptResponseRatio(conv(spark, dir))
      .orderBy(col("conv_id"), col("prompt_turn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sft_turn_stats" -> (sftTurnStats _),
    "sft_role_violations" -> (sftRoleViolations _),
    "sft_response_dedup" -> (sftResponseDedup _),
    "sft_pair_ratio" -> (sftPairRatio _),
  )

  // The derived conversation view (must mirror Sft.conversationView exactly:
  // 8-turn doc_id blocks, n_chars-parity roles, whitespace token counts).
  private val convCte =
    """conv AS (
      |  SELECT doc_id // 8 AS conv_id, doc_id % 8 AS turn_idx,
      |         CASE WHEN n_chars % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |         text,
      |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sft_turn_stats" ->
      s"""WITH $convCte,
         |w AS (SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
         |      FROM conv),
         |g AS (SELECT conv_id,
         |    CAST(count(*) AS BIGINT) AS n_turns,
         |    CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
         |    CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
         |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(sum(CASE WHEN role = 'assistant' THEN n_tokens ELSE 0 END) AS BIGINT) AS assistant_tokens,
         |    min(CASE WHEN turn_idx = 0 THEN role END) AS first_role,
         |    CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats
         |  FROM w GROUP BY conv_id)
         |SELECT conv_id, n_turns, n_user, n_assistant, total_tokens,
         |  assistant_tokens,
         |  (1000000 * assistant_tokens) // greatest(total_tokens, 1) AS assistant_ratio_micro,
         |  first_role, n_role_repeats,
         |  (n_role_repeats = 0 AND first_role = 'user') AS alternation_ok
         |FROM g ORDER BY conv_id""".stripMargin,
    "sft_role_violations" ->
      s"""WITH $convCte,
         |w AS (SELECT conv_id, turn_idx, role,
         |    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
         |  FROM conv)
         |SELECT conv_id, turn_idx, role,
         |  CASE WHEN turn_idx = 0 AND role <> 'user' THEN 'leading_assistant'
         |       ELSE 'repeated_role' END AS violation
         |FROM w
         |WHERE (turn_idx = 0 AND role <> 'user') OR role = prev_role
         |ORDER BY conv_id, turn_idx""".stripMargin,
    "sft_response_dedup" ->
      s"""WITH $convCte,
         |a AS (SELECT conv_id, turn_idx, n_tokens,
         |    array_to_string(string_split_regex(trim(text), '\\s+')[1:8], ' ') AS opening
         |  FROM conv WHERE role = 'assistant'),
         |g AS (SELECT opening, CAST(count(*) AS BIGINT) AS n_copies,
         |    min(conv_id * 8 + turn_idx) AS keep_key
         |  FROM a GROUP BY opening)
         |SELECT a.conv_id, a.turn_idx, a.n_tokens, g.n_copies,
         |  (a.conv_id * 8 + a.turn_idx) = g.keep_key AS is_canonical,
         |  g.keep_key // 8 AS keep_conv_id, g.keep_key % 8 AS keep_turn_idx
         |FROM a JOIN g ON g.opening = a.opening
         |ORDER BY conv_id, turn_idx""".stripMargin,
    "sft_pair_ratio" ->
      s"""WITH $convCte,
         |p AS (SELECT conv_id, turn_idx, role, n_tokens,
         |    lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
         |    lead(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tokens
         |  FROM conv)
         |SELECT conv_id, turn_idx AS prompt_turn, n_tokens AS prompt_tokens,
         |  next_tokens AS response_tokens,
         |  (1000000 * next_tokens) // greatest(n_tokens, 1) AS ratio_micro
         |FROM p WHERE role = 'user' AND next_role = 'assistant'
         |ORDER BY conv_id, prompt_turn""".stripMargin,
  )
}
