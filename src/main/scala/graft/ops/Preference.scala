package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data preparation for RLHF / evaluation pipelines: pairwise
  * comparison extraction, win-rate matrices, and Bradley–Terry strength
  * scores (the aggregate behind chat-arena leaderboards and
  * reward-model data audits).
  *
  * Bradley–Terry fitting uses Hunter's MM algorithm (Hunter, "MM
  * algorithms for generalized Bradley-Terry models", Annals of Statistics
  * 2004): p_i ← W_i / Σ_j n_ij/(p_i+p_j), run for a fixed iteration count
  * in integer micro units so the whole trajectory replays bit-exactly in
  * the DuckDB oracle (the same unrolled-iteration discipline as
  * `graph_pagerank` / `KmeansSql`).
  *
  * Scale notes (100 TB): the comparison log is aggregated ONCE to the
  * (model, opponent) game matrix — a |models|²-bounded relation — with
  * map-side combine; every MM iteration then joins and re-aggregates only
  * that matrix (localCheckpointed per iteration to keep lineage and plan
  * size O(1)). The per-iteration normalizer is a one-row aggregate
  * broadcast back. Nothing corpus-sized is ever iterated or collected;
  * the only driver-side values are the model count (one bounded action)
  * and nothing else.
  */
object Preference {

  /** Deterministic pairwise-comparison view over the events log: adjacent
    * events of one user (ts, event_id order) with differing types and
    * differing values form one comparison — the event_type plays the
    * "model" arm, the higher value wins. Ties and same-type pairs are
    * dropped (no information). One user-partitioned lead window. */
  def comparisonsFromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("event_type") =!= col("next_type") &&
        col("value") =!= col("next_value"))
      .select(col("event_type").as("a"), col("next_type").as("b"),
        when(col("value") > col("next_value"), col("event_type"))
          .otherwise(col("next_type")).as("winner"))
  }

  /** Pairwise win/loss matrix over unordered model pairs: game count,
    * wins for the lexicographically first arm, and its exact micro win
    * rate. One hash aggregate on the pair key (map-side combinable). */
  def winMatrix(cmp: DataFrame): DataFrame =
    cmp.groupBy(least(col("a"), col("b")).as("model_a"),
        greatest(col("a"), col("b")).as("model_b"))
      .agg(count(lit(1)).as("n_games"),
        sum(when(col("winner") === least(col("a"), col("b")), 1L)
          .otherwise(0L)).as("wins_a"))
      .select(col("model_a"), col("model_b"), col("n_games"), col("wins_a"),
        (col("n_games") - col("wins_a")).as("wins_b"),
        expr("(1000000 * wins_a) div n_games").as("win_rate_a_micro"))

  /** Bradley–Terry strength scores via `iters` fixed MM rounds in integer
    * micro units, normalized each round to Σp = |models|·10⁶ (the MM map
    * is scale-invariant; normalization pins the integer trajectory).
    * A zero-win model converges to p = 0 — the degenerate MLE — and the
    * `greatest(_, 1)` guards keep every division defined even when two
    * zero-score models meet. Output: (model, n_games, n_wins, bt_micro).
    */
  def btScores(cmp: DataFrame, iters: Int = 5): DataFrame = {
    val pairs = cmp
      .groupBy(least(col("a"), col("b")).as("ma"),
        greatest(col("a"), col("b")).as("mb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("winner") === least(col("a"), col("b")), 1L)
          .otherwise(0L)).as("wa"))
    // Symmetric game matrix + per-model win totals: the ONLY relations the
    // iterations touch, both |models|²-bounded.
    val games = pairs.select(col("ma").as("model"), col("mb").as("opp"),
        col("n"))
      .unionByName(pairs.select(col("mb").as("model"), col("ma").as("opp"),
        col("n")))
      .localCheckpoint()
    val wins = cmp.groupBy(col("winner").as("mw"))
      .agg(count(lit(1)).as("w")).localCheckpoint()
    val models = games.select("model").distinct().localCheckpoint()
    val k = models.count() // bounded: the number of compared models

    var p = models.withColumn("p", lit(1000000L))
    for (_ <- 1 to iters) {
      val pi = p.select(col("model").as("mi"), col("p").as("p_i"))
      val pj = p.select(col("model").as("mj"), col("p").as("p_j"))
      // n·10¹² and w·10¹² ride DECIMAL(38,0) (ADVICE r11: a Long multiply
      // wraps silently once a pair's game count or a model's win total
      // passes ~9.2M — exactly the 100 TB regime); d accumulates in
      // DECIMAL too, so the per-model sum of quotients cannot wrap either.
      // The DuckDB oracle mirrors with HUGEINT. Values are unchanged
      // in-range (decimal multiply and integral div are exact).
      val raw = games
        .join(pi, col("model") === col("mi"))
        .join(pj, col("opp") === col("mj"))
        .groupBy("model")
        .agg(sum(expr(
          """CAST((CAST(n AS DECIMAL(38,0)) * 1000000000000)
            |  div greatest(p_i + p_j, 1) AS DECIMAL(38,0))""".stripMargin))
          .as("d"))
        .join(wins, col("model") === col("mw"), "left")
        .select(col("model"),
          expr("""(CAST(coalesce(w, 0) AS DECIMAL(38,0)) * 1000000000000)
                 |  div greatest(d, 1)""".stripMargin)
            .as("praw"))
      val tot = raw.agg(sum("praw").as("s"))
      p = raw.crossJoin(broadcast(tot))
        .select(col("model"),
          expr(s"(praw * ${k * 1000000L}L) div greatest(s, 1)").as("p"))
        .localCheckpoint()
    }
    val ng = games.groupBy("model").agg(sum("n").as("n_games"))
    models.join(ng, Seq("model"))
      .join(p.withColumnRenamed("p", "bt_micro"), Seq("model"))
      .join(wins, col("model") === col("mw"), "left")
      .select(col("model"), col("n_games"),
        coalesce(col("w"), lit(0L)).as("n_wins"), col("bt_micro"))
  }

  /** Calibration audit of the fitted Bradley–Terry model: per unordered
    * pair, the BT-implied win probability p_a/(p_a+p_b) (micro) next to
    * the empirical win rate, and the signed gap — large |gap| flags pairs
    * the single-scalar-strength model cannot explain (intransitive arms,
    * judge artifacts). Joins the |models|²-sized matrix against the
    * |models|-sized score relation — nothing corpus-sized. */
  def btCalibration(cmp: DataFrame, iters: Int = 5): DataFrame = {
    // The comparison log feeds both the fit and the matrix — materialize it
    // once so the corpus-sized lead window runs a single time.
    val c = cmp.localCheckpoint()
    val p = btScores(c, iters).select(col("model"), col("bt_micro"))
    winMatrix(c)
      .join(p.select(col("model").as("model_a"), col("bt_micro").as("p_a")),
        Seq("model_a"))
      .join(p.select(col("model").as("model_b"), col("bt_micro").as("p_b")),
        Seq("model_b"))
      .select(col("model_a"), col("model_b"), col("n_games"),
        col("win_rate_a_micro"),
        expr("(p_a * 1000000) div greatest(p_a + p_b, 1)")
          .as("bt_expected_a_micro"),
        (col("win_rate_a_micro") -
          expr("(p_a * 1000000) div greatest(p_a + p_b, 1)")).as("gap_micro"))
  }
}
