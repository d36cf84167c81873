package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Planted-data tests for the SFT/conversation-prep kernels: the derived
  * view's role/turn arithmetic, the alternation audit on a known-good and a
  * known-broken conversation, opening-keyed dedup winner selection, and the
  * prompt/response ratio math (including the zero-prompt guard).
  */
class SftSpec extends SparkSpec {
  import spark.implicits._

  // Two planted 4-turn conversations (turnsPerConv = 4):
  //  conv 0: user/assistant alternating cleanly (even/odd n_chars).
  //  conv 1: assistant-first, then a repeated assistant turn.
  private lazy val docs = Seq(
    (0L, "hi there", "en", "s", 8L),             // user (even n_chars)
    (1L, "hello how can I help", "en", "s", 21L), // assistant
    (2L, "what is two plus two", "en", "s", 20L), // user
    (3L, "the answer is four", "en", "s", 19L),   // assistant
    (4L, "unprompted reply", "en", "s", 17L),     // assistant (leading!)
    (5L, "another reply in a row", "en", "s", 23L), // assistant (repeat!)
    (6L, "ok thanks", "en", "s", 10L),            // user... n_chars odd -> assistant? keep explicit
    (7L, "bye", "en", "s", 4L),                   // user (even)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val conv = Sft.conversationView(docs, turnsPerConv = 4)

  test("conversation view derives conv/turn/role/token columns") {
    val r = conv.orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "role", "n_tokens").collect()
    assert(r(0) === Row(0L, 0L, "user", 2L))
    assert(r(1) === Row(0L, 1L, "assistant", 5L))
    assert(r(4) === Row(1L, 0L, "assistant", 2L)) // leading assistant
    assert(r(5) === Row(1L, 1L, "assistant", 5L)) // repeated role
  }

  test("turnStats: alternation_ok only for the clean conversation") {
    val r = Sft.turnStats(conv).orderBy("conv_id").collect()
    val clean = r(0)
    assert(clean.getAs[Long]("n_turns") === 4L)
    assert(clean.getAs[Long]("n_user") === 2L)
    assert(clean.getAs[Long]("n_assistant") === 2L)
    assert(clean.getAs[String]("first_role") === "user")
    assert(clean.getAs[Long]("n_role_repeats") === 0L)
    assert(clean.getAs[Boolean]("alternation_ok"))
    // exact micro ratio: assistant 5+4=9 of 2+5+5+4=16 tokens
    assert(clean.getAs[Long]("assistant_tokens") === 9L)
    assert(clean.getAs[Long]("assistant_ratio_micro") === 9L * 1000000L / 16L)
    val broken = r(1)
    assert(broken.getAs[String]("first_role") === "assistant")
    assert(!broken.getAs[Boolean]("alternation_ok"))
  }

  test("roleViolations labels leading_assistant and repeated_role") {
    val r = Sft.roleViolations(conv).orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "violation").collect()
    assert(r.toSeq === Seq(
      Row(1L, 0L, "leading_assistant"),
      Row(1L, 1L, "repeated_role"),   // assistant after assistant
      Row(1L, 3L, "repeated_role")))  // user after user
  }

  test("responseOpeningDedup: identical openings share one canonical row") {
    val dup = Seq(
      (0L, "q", "en", "s", 2L),
      (1L, "As an assistant I think yes", "en", "s", 27L),
      (2L, "q2", "en", "s", 2L),
      (3L, "As an assistant I think no way", "en", "s", 31L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Sft.responseOpeningDedup(
        Sft.conversationView(dup, turnsPerConv = 4),
        openingTokens = 5)
      .orderBy("turn_idx").collect()
    assert(r.length === 2)
    assert(r(0).getAs[Long]("n_copies") === 2L)
    assert(r(0).getAs[Boolean]("is_canonical"))
    assert(!r(1).getAs[Boolean]("is_canonical"))
    assert(r(1).getAs[Long]("keep_turn_idx") === 1L)
  }

  test("responseOpeningDedup keep keys come from the rows, not a packing factor") {
    // ADVICE r11 regression: a view built with one turnsPerConv used to be
    // mislabeled when the dedup was called with another. Keys now derive
    // from (conv_id, turn_idx) directly, so ANY view labels correctly —
    // including turn indices >= 8 that the old *8 encoding would fold.
    val turns = Seq(
      (0L, 9L, "assistant", "Same opening here", 3L),
      (1L, 0L, "assistant", "Same opening here", 3L),
    ).toDF("conv_id", "turn_idx", "role", "text", "n_tokens")
    val r = Sft.responseOpeningDedup(turns, openingTokens = 3)
      .orderBy("conv_id").collect()
    // lexicographic struct min: (0, 9) < (1, 0) — conv 0 turn 9 canonical
    assert(r(0).getAs[Boolean]("is_canonical"))
    assert(r(0).getAs[Long]("keep_conv_id") === 0L)
    assert(r(0).getAs[Long]("keep_turn_idx") === 9L)
    assert(!r(1).getAs[Boolean]("is_canonical"))
    assert(r(1).getAs[Long]("keep_conv_id") === 0L)
    assert(r(1).getAs[Long]("keep_turn_idx") === 9L)
  }

  test("promptResponseRatio pairs adjacent user->assistant turns only") {
    val r = Sft.promptResponseRatio(conv)
      .orderBy("conv_id", "prompt_turn").collect()
    // conv 0: (t0 user 2 tok -> t1 assistant 5 tok), (t2 user 5 -> t3 assistant 4)
    // conv 1: t2 user -> t3 user: no pair; t1 assistant precedes t2: no pair
    assert(r.map(x => (x.getAs[Long]("conv_id"), x.getAs[Long]("prompt_turn")))
      .toSeq === Seq((0L, 0L), (0L, 2L)))
    assert(r(0).getAs[Long]("ratio_micro") === 5L * 1000000L / 2L)
  }
}
