package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Planted-data tests for the preference-prep kernels: comparison
  * extraction rules (adjacency, tie/same-type drops), win-matrix
  * arithmetic, and Bradley–Terry MM behavior (ordering, normalization,
  * the zero-win degenerate case).
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("comparisonsFromEvents pairs adjacent events, drops ties/same-type") {
    val ev = Seq(
      // user 1: A(2.0) -> B(1.0): A wins; B(1.0) -> B(3.0): same type, drop;
      // B(3.0) -> C(3.0): tie, drop; C(3.0) -> A(5.0): A wins
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "A", 2.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 1L, "B", 1.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 1L, "B", 3.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 1L, "C", 3.0),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 1L, "A", 5.0),
      // user 2 is a different partition: no pair with user 1's tail
      (6L, java.sql.Timestamp.valueOf("2024-01-01 00:00:06"), 2L, "B", 9.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Preference.comparisonsFromEvents(ev)
      .orderBy("a", "b").collect()
    assert(r.toSeq === Seq(Row("A", "B", "A"), Row("C", "A", "A")))
  }

  private def plant(rows: (String, String, String)*) =
    rows.toDF("a", "b", "winner")

  test("winMatrix counts games and exact micro win rates per unordered pair") {
    val cmp = plant(("A", "B", "A"), ("B", "A", "A"), ("A", "B", "B"),
      ("B", "C", "B"))
    val r = Preference.winMatrix(cmp).orderBy("model_a", "model_b").collect()
    assert(r.toSeq === Seq(
      Row("A", "B", 3L, 2L, 1L, 2L * 1000000L / 3L),
      Row("B", "C", 1L, 1L, 0L, 1000000L)))
  }

  test("btScores: transitive dominance orders strengths; zero-win arm hits 0") {
    // A beats B 2x, B beats C 2x, A beats C 2x: strength A > B > C, and C
    // (zero wins) is the degenerate MLE at exactly 0.
    val cmp = plant(
      ("A", "B", "A"), ("A", "B", "A"),
      ("B", "C", "B"), ("B", "C", "B"),
      ("A", "C", "A"), ("A", "C", "A"))
    val r = Preference.btScores(cmp, iters = 5)
      .orderBy("model").collect()
    val bt = r.map(x => x.getAs[String]("model") -> x.getAs[Long]("bt_micro"))
      .toMap
    assert(bt("A") > bt("B") && bt("B") > bt("C"))
    assert(bt("C") === 0L)
    // normalization: sum p = 3e6 up to integer-truncation slack
    val s = bt.values.sum
    assert(s <= 3000000L && s > 3000000L - 10L, s.toString)
    assert(r.map(_.getAs[Long]("n_games")).toSeq === Seq(4L, 4L, 4L))
    assert(r.map(_.getAs[Long]("n_wins")).toSeq === Seq(4L, 2L, 0L))
  }

  test("btScores balanced two-arm duel stays at the uniform fixpoint") {
    val cmp = plant(("A", "B", "A"), ("A", "B", "B"))
    val r = Preference.btScores(cmp, iters = 3).orderBy("model").collect()
    assert(r.map(_.getAs[Long]("bt_micro")).toSeq === Seq(1000000L, 1000000L))
  }

  test("btCalibration: balanced duel implies 50% with zero gap") {
    val cmp = plant(("A", "B", "A"), ("A", "B", "B"))
    val r = Preference.btCalibration(cmp, iters = 3).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("win_rate_a_micro") === 500000L)
    assert(r(0).getAs[Long]("bt_expected_a_micro") === 500000L)
    assert(r(0).getAs[Long]("gap_micro") === 0L)
  }
}
