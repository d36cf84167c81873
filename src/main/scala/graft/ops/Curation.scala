package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data pipelines: deterministic
  * stratified sampling, train/val/test split assignment, and PII redaction.
  *
  * All randomness is content-addressed — a salted md5 draw per key — so
  * results are reproducible across runs, engines, cluster sizes, and
  * re-partitioning (unlike `rand()`-based sampling, which changes per task
  * retry and per partition layout). Every operator is a map-only pass:
  * no shuffle, embarrassingly parallel at any scale.
  */
object Curation {

  /** 2^60 — the md5-prefix draw below is 60 bits. */
  val HashDenom: Double = (1L << 60).toDouble

  /** Deterministic U[0,1) draw from a key under a named salt. Independent
    * salts give independent draws (sampling vs splitting must not
    * correlate — otherwise e.g. every sampled-out doc would also be the
    * 'test' split of another pipeline stage). */
  def hashFraction(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + "|"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") / lit(HashDenom)

  /** DuckDB-side mirror of [[hashFraction]] (kept adjacent per the T.sql
    * convention so the dialects stay in sync). */
  def hashFractionSql(keyExpr: String, salt: String): String =
    s"(CAST('0x' || substring(md5('$salt|' || CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT)" +
      s" / ${HashDenom.toLong}.0)"

  /** Stratified downsampling: keep a row iff its hash draw is below the
    * rate of its stratum. Rates ship as a broadcast dim join (at scale the
    * strata table may be thousands of sources — never a literal CASE chain
    * baked into the plan). Strata absent from `rates` fall back to
    * `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "samp"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = broadcast(rates.toSeq.toDF(strataCol, "__rate"))
    df.join(ratesDf, Seq(strataCol), "left")
      .where(hashFraction(col(keyCol), salt) < coalesce(col("__rate"), lit(defaultRate)))
      .drop("__rate")
  }

  /** Split-bound prefix sums for `assignSplit` — exposed so the oracle SQL
    * can embed the exact same double values (0.8+0.1 is 0.9000000000000001
    * in IEEE; regenerating the bounds in another engine's decimal parser
    * would diverge on the boundary draw). */
  def splitBounds(weights: Seq[(String, Double)]): Seq[(String, Double)] =
    weights.zip(weights.scanLeft(0.0)(_ + _._2).tail).map { case ((n, _), b) => (n, b) }

  /** Assign each key to a named split with the given weights (fractions
    * summing to ~1). Pure map-side expression; content-stable. */
  def assignSplit(key: Column, weights: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(weights.nonEmpty)
    val u = hashFraction(key, salt)
    val bounds = splitBounds(weights)
    bounds.init.reverse.foldLeft(lit(bounds.last._1)) {
      case (els, (name, bound)) => when(u < lit(bound), lit(name)).otherwise(els)
    }
  }

  /** Deterministic per-stratum cap: keep at most `cap` rows per stratum,
    * chosen by salted hash rank (content-stable — the same rows survive
    * regardless of partitioning or cluster size, unlike LIMIT-per-group).
    * One shuffle on the stratum; the window never materializes a group in
    * memory (row_number streams over the sorted run). */
  /** Temperature-flattened mixture sampling at τ = ½ — the pretraining
    * data-mix op that tempers source shares toward `share ∝ n^τ`: each
    * row of stratum s keeps with probability `sqrt(n_min / n_s)`, so the
    * smallest source is kept whole and larger sources are downsampled by
    * the square-root of their size ratio. Content-stable hash draws;
    * `n_min` rides as a broadcast one-row aggregate.
    *
    * Engine-exact by construction: the keep probability uses only
    * correctly-rounded IEEE ops (one long/long→double division, one
    * sqrt) compared against the exact md5 hash fraction — no float sums,
    * so the keep SET is bit-identical across engines and partitionings.
    * The strata-count relation is localCheckpoint'ed (strata-sized) so
    * the corpus is scanned once for counts and once for the gated scan.
    *
    * NULL strata form their own stratum (null-safe count join), exactly
    * as in the window-based [[keepTopQuantile]]/[[clipAtQuantile]] —
    * the three quantile/sampling ops agree on NULL-stratum rows. */
  def temperatureFlatten(df: DataFrame, strataCol: String, keyCol: String,
      salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__ns"))
      .withColumnRenamed(strataCol, "__strata")
      .localCheckpoint()
    val nmin = counts.agg(min(col("__ns")).as("__nmin"))
    df.join(broadcast(counts), col(strataCol) <=> col("__strata"))
      .crossJoin(broadcast(nmin))
      .where(hashFraction(col(keyCol), salt) <
        sqrt(col("__nmin") / col("__ns")))
      .drop("__strata", "__ns", "__nmin")
  }

  /** Exact-count global sample: the `n` rows with the lowest salted
    * content hash — a deterministic reservoir draw ("give me a uniform
    * 100k-doc sample of the corpus"), independent of partitioning and
    * file order. Rate sampling ([[stratifiedSample]]) only hits a target
    * COUNT in expectation; this is exact.
    *
    * Physical shape is the reason it scales: `orderBy(hash).limit(n)`
    * plans as TakeOrderedAndProject — each task keeps an n-row heap and
    * the driver merges heaps — never a global sort of the corpus
    * (PlanSpec-asserted). Driver memory is O(n·row), so n is for
    * samples, not for partitioning the corpus. */
  def sampleGlobal(df: DataFrame, n: Int, keyCol: String,
      salt: String = "gsamp"): DataFrame = {
    require(n > 0, "n must be positive")
    df.withColumn("__h", hashFraction(col(keyCol), salt))
      .orderBy(col("__h"), col(keyCol))
      .limit(n)
      .drop("__h")
  }

  /** Keep the top `qMicro`/10⁶ fraction of each stratum by score —
    * "top quartile per domain" — with EXACT rank arithmetic instead of
    * an approximate quantile: row ranks by (score desc, key), a row
    * survives iff rank ≤ ceil(q·n) where n is its stratum size, all in
    * integer micro-units (`rank·10⁶ ≤ qMicro·n` rounded up) — so the
    * cut is deterministic, ties are total-ordered, and the oracle can
    * replay it bit-for-bit. One Window pass per stratum computes both
    * the rank and the stratum size (same partition spec → one exec).
    * Skewed strata behave like any other per-stratum window: the
    * partition key spreads the corpus; a single pathological stratum is
    * the caller's salting problem, exactly as in [[capPerStratum]]. */
  def keepTopQuantile(df: DataFrame, strataCol: String, scoreCol: String,
      keyCol: String, qMicro: Long): DataFrame = {
    require(qMicro >= 0 && qMicro <= 1000000L, "qMicro is a fraction in micro-units")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val wOrd = w.orderBy(col(scoreCol).desc, col(keyCol))
    df.withColumn("__rk", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(w))
      .where(expr(s"__rk <= ($qMicro * __n + 999999) div 1000000"))
      .drop("__rk", "__n")
  }

  /** Per-stratum winsorization: cap `scoreCol` at the stratum's top
    * `qMicro`/10⁶ quantile — outlier clipping before length-weighted
    * sampling or budget math, so one pathological document cannot
    * dominate a source's token mass. The threshold is EXACT rank
    * arithmetic like [[keepTopQuantile]] (the value at rank
    * ceil(q·n) in (score desc, key) order — deterministic, total-order
    * ties), never an approximate quantile. Emits every input row with
    * `<scoreCol>_clipped = least(score, threshold)`.
    *
    * Shape: one Window pass per stratum (rank + size share the
    * partition sort), the ≤|strata|-row threshold relation broadcast
    * back (null-safe on the stratum, so NULL strata clip against their
    * own threshold — consistent with the window-only [[keepTopQuantile]]). */
  def clipAtQuantile(df: DataFrame, strataCol: String, scoreCol: String,
      keyCol: String, qMicro: Long): DataFrame = {
    require(qMicro > 0 && qMicro <= 1000000L, "qMicro is a fraction in micro-units")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val wOrd = w.orderBy(col(scoreCol).desc, col(keyCol))
    val ranked = df
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(w))
    val thresholds = ranked
      .filter(expr(s"__rk = ($qMicro * __n + 999999) div 1000000"))
      .select(col(strataCol).as("__strata"), col(scoreCol).as("__t"))
    ranked.drop("__rk", "__n")
      .join(broadcast(thresholds), col(strataCol) <=> col("__strata"))
      .withColumn(s"${scoreCol}_clipped", least(col(scoreCol), col("__t")))
      .drop("__strata", "__t")
  }

  /** Sketch-driven winsorization — the 100 TB form of [[clipAtQuantile]]:
    * clip at the log-binned-histogram p99 ([[Sketches.histQuantiles]])
    * instead of the exact rank. The exact form sorts every stratum
    * (a Window pass over all rows); this form builds the fixed-size
    * histogram in one map-side-combined pass and broadcasts the
    * ≤|strata|-row threshold relation back — no per-row sort anywhere,
    * at the cost of the sketch's ≤6.25% relative threshold error
    * (one-sided: the bin lower bound, so it clips slightly MORE than
    * exact p99). Null-safe on the stratum, same as [[clipAtQuantile]].
    * Emits `<valueCol>_micro` and the clipped `<valueCol>_clipped_micro`
    * (micro-units: the sketch's exact integer domain). */
  def winsorizeBySketch(df: DataFrame, strataCol: String,
      valueCol: String): DataFrame = {
    val thresholds = graft.ops.Sketches
      .histQuantiles(df, Seq(strataCol), valueCol)
      .select(col(strataCol).as("__strata"), col("p99_micro"))
    df.join(broadcast(thresholds), col(strataCol) <=> col("__strata"))
      .withColumn(s"${valueCol}_micro",
        floor(col(valueCol).cast("double") * lit(1000000.0)).cast("long"))
      .withColumn(s"${valueCol}_clipped_micro",
        least(col(s"${valueCol}_micro"), col("p99_micro")))
      .drop("__strata", "p99_micro")
  }

  /** Weighted sampling without replacement — sequential Poisson sampling
    * (Ohlsson 1998, the πps order-sampling scheme): each row gets priority
    * `hash / weight` and the `n` lowest-priority rows survive, so
    * inclusion probability is approximately proportional to the weight
    * ("sample 100k docs weighted by token count"). The classic
    * Efraimidis–Spirakis exponential keys (u^(1/w)) need transcendental
    * pow; the Ohlsson priority is ORDER-equivalent for sampling purposes
    * and stays in exact integer arithmetic: the 60-bit content hash
    * integer-divided by the integer weight, ties broken by key — so the
    * sample SET is bit-identical across engines, partitionings, and
    * cluster sizes.
    *
    * Physical shape is [[sampleGlobal]]'s: `orderBy(priority).limit(n)`
    * plans as TakeOrderedAndProject — per-task n-row heaps merged on the
    * driver, never a global sort. Rows with weight ≤ 0 are excluded (a
    * zero-weight doc must never be drawn; guarding here keeps the
    * division total). */
  def sampleWeighted(df: DataFrame, n: Int, weightCol: String,
      keyCol: String, salt: String = "wsamp"): DataFrame = {
    require(n > 0, "n must be positive")
    val h = conv(substring(md5(concat(lit(salt + "|"),
      col(keyCol).cast("string"))), 1, 15), 16, 10).cast("long")
    // integer div (both operands non-negative, so div == floor in every
    // engine), never float division — the priority stays exactly replayable
    df.where(col(weightCol) > 0)
      .withColumn("__h", h)
      .withColumn("__prio", expr(s"__h div CAST($weightCol AS BIGINT)"))
      .orderBy(col("__prio"), col(keyCol))
      .limit(n)
      .drop("__h", "__prio")
  }

  /** Data-mix planning for a uniform target mixture — the "how do I
    * actually hit my data recipe" arithmetic of pretraining mixtures
    * (the Pile / LLaMA-style recipes where under-represented sources are
    * up-sampled for multiple epochs and over-represented ones are rate-
    * sampled down): given per-stratum token masses and a total token
    * budget, each stratum gets quota = budget div P tokens, and the plan
    * reports, per stratum,
    *  - `rate_micro`  = min(1, quota/n) — the [[stratifiedSample]] rate
    *    that downsamples an over-quota source,
    *  - `epochs_micro` = quota/n — >10⁶ means the source must repeat
    *    (up-sample epochs) to fill its quota,
    *  - `shortfall_tokens` = max(0, quota − n) — the mass that up-
    *    sampling must supply.
    * All integer arithmetic (one div per ratio), so the plan replays
    * exactly; the non-uniform-shares form is the same join with a
    * shares dim instead of the broadcast stratum count.
    *
    * Scale shape: ONE combine-agg to the |strata|-row count relation;
    * everything after is arithmetic on that relation with the stratum
    * count riding as a one-row broadcast. */
  def planMixUniform(docs: DataFrame, strataCol: String, tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = docs.groupBy(col(strataCol))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
      .localCheckpoint(false) // |strata| rows; consumed with its own count
    val p = counts.agg(count(lit(1)).as("__p"))
    counts.crossJoin(broadcast(p))
      .withColumn("quota_tokens", expr(s"$budget div __p"))
      .withColumn("rate_micro", expr(
        "least(1000000L, (1000000 * quota_tokens) div greatest(n_tokens, 1))"))
      .withColumn("epochs_micro", expr(
        "(1000000 * quota_tokens) div greatest(n_tokens, 1)"))
      .withColumn("shortfall_tokens",
        expr("greatest(0L, quota_tokens - n_tokens)"))
      .drop("__p")
  }

  /** UniMax language sampling (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): allocate a total token `budget` across
    * strata so every stratum is as close to UNIFORM as its data allows
    * without repeating any stratum more than `maxEpochs` times — the
    * fix for temperature sampling's head-domination/tail-overfitting
    * tradeoff. Waterfilling closed form: with per-stratum caps
    * cap_l = maxEpochs·n_l ranked ascending (ties to the lower stratum
    * name), the capped set is the maximal prefix k where every member
    * satisfies cap_r·(L−r+1) ≤ B−S_{r−1} (its cap fits under an equal
    * split of what remains); members get cap_r, everyone else gets an
    * equal share ⌊(B−S_k)/(L−k)⌋ of the remainder. The prefix condition
    * is monotone for ascending caps, so k is well-defined; all integer
    * arithmetic (the one share division floors, DECIMAL(38,0) products
    * in the fit test), so the plan replays exactly.
    *
    * Output per stratum: token mass, cap, rank, capped flag,
    * alloc_tokens, epochs_micro = 10⁶·alloc/n (≤ maxEpochs·10⁶ by
    * construction), and the global leftover ⌊·⌋ dust.
    *
    * Scale shape: ONE combine-agg to the |strata|-row mass relation;
    * rank and prefix sum via the triangular self-join on that bounded
    * relation (the [[graft.ops.TextAnalysis]] zipfFit pattern — no
    * global window), two one-row aggregates broadcast back. Strata are
    * languages/sources — tens to thousands of rows, never corpus-
    * proportional. */
  def planMixUnimax(docs: DataFrame, strataCol: String, tokens: Column,
      budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs >= 1 && maxEpochs <= 1000, "maxEpochs in [1, 1000]")
    val dec = "DECIMAL(38,0)"
    val counts = docs.groupBy(col(strataCol))
      // NULL masses (all-NULL token column) coalesce to 0 so the
      // triangular rank/prefix comparisons and the fit test stay
      // total; negative masses raise with the stratum named — a
      // negative cap would silently corrupt the waterfilling order
      // for EVERY stratum, not just its own row (ADVICE r14)
      .agg(coalesce(sum(tokens.cast("long")), lit(0L)).as("n_tokens"))
      .withColumn("n_tokens", when(col("n_tokens") < 0L,
        raise_error(concat(lit("planMixUnimax: negative token mass for "),
          lit("stratum '"), col(strataCol).cast("string"), lit("'")))
          .cast("long"))
        .otherwise(col("n_tokens")))
      .withColumn("cap_tokens", expr(s"${maxEpochs}L * n_tokens"))
      .localCheckpoint(false) // |strata| rows; both triangular sides + L
    val lrel = counts.agg(count(lit(1)).as("__l"))
    // rank ascending by (cap, stratum) + exclusive prefix sum, one join
    val ranked = counts.as("a")
      .join(counts.select(col("cap_tokens").as("__c2"),
          col(strataCol).as("__s2")),
        col("__c2") < col("cap_tokens") ||
          (col("__c2") === col("cap_tokens") && col("__s2") < col(strataCol)),
        "left")
      .groupBy(col(strataCol), col("n_tokens"), col("cap_tokens"))
      .agg(count(col("__s2")).as("__before"),
        coalesce(sum(col("__c2")), lit(0L)).as("__prefix"))
      .withColumn("rank", col("__before") + lit(1L))
      .crossJoin(broadcast(lrel))
      // the waterfilling fit test: this stratum's cap fits under an
      // equal split of the budget left after every smaller cap is paid
      .withColumn("__fits", expr(
        s"""CAST(cap_tokens AS $dec) * (__l - rank + 1)
           | <= CAST(${budget}L - __prefix AS $dec)""".stripMargin))
      .localCheckpoint(false) // feeds the k aggregate AND the plan rows
    val krel = ranked.agg(
      coalesce(max(when(col("__fits"), col("rank"))), lit(0L)).as("__k"),
      coalesce(sum(when(col("__fits"), col("cap_tokens"))), lit(0L))
        .as("__sk"))
    val plan = ranked.crossJoin(broadcast(krel))
      .withColumn("capped", col("rank") <= col("__k"))
      .withColumn("__share", expr(
        s"(${budget}L - __sk) div greatest(__l - __k, 1L)"))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens")).otherwise(col("__share")))
      .withColumn("epochs_micro", expr(
        s"CAST(CAST(alloc_tokens AS $dec) * 1000000 div " +
          s"CAST(greatest(n_tokens, 1L) AS $dec) AS BIGINT)"))
    val leftover = plan.agg(
      (lit(budget) - sum(col("alloc_tokens"))).as("leftover_tokens"))
    plan.crossJoin(broadcast(leftover))
      .select(col(strataCol), col("n_tokens"), col("cap_tokens"),
        col("rank"), col("capped"), col("alloc_tokens"),
        col("epochs_micro"), col("leftover_tokens"))
  }

  /** Per-stratum rank normalization — put scores from different sources
    * (or different scoring models) on ONE comparable [0, 1] scale before
    * mixing: pct = 10⁶·(rank−1) div (n−1), rank by (score asc, key) —
    * the exact-integer quantile-normalization transform (the feature-
    * engineering sibling of [[keepTopQuantile]]'s gate: same window,
    * but it EMITS the normalized score instead of cutting). Single-row
    * strata normalize to 0; ties are total-ordered by key, so the
    * transform is deterministic and engine-replayable.
    *
    * One Window pass per stratum (rank + size share the partition
    * sort) — the same skew posture as every per-stratum window here. */
  /** Curriculum schedule construction: rank each stratum's documents by
    * difficulty, cut into `nBuckets` equal-depth difficulty buckets, and
    * emit the round-robin interleaved training order (easy bucket's
    * first doc, next bucket's first doc, …, wrap) — the standard
    * curriculum-learning layout that ramps difficulty WITHIN every
    * window of `nBuckets` consecutive examples instead of front-loading
    * all easy data. `sched_rank = pos_in_bucket·nBuckets + bucket` is
    * a pure expression of the two ranks, so the whole schedule costs
    * two per-stratum window passes and no extra shuffle.
    *
    * Exact integer arithmetic (equal-depth bucket = (nBuckets·(rk−1))
    * div n, ties total-ordered by key) — deterministic and
    * engine-replayable. Per-stratum windows share [[rankNormalize]]'s
    * skew posture: a stratum must fit a partition sort; shard + stitch
    * (the [[sampleTokenBudget]] pattern) past that. */
  def curriculumInterleave(df: DataFrame, strataCol: String,
      scoreCol: String, keyCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val wOrd = w.orderBy(col(scoreCol).asc, col(keyCol))
    val ranked = df
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("bucket", expr(s"($nBuckets * (__rk - 1)) div __n"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("bucket"))
      .orderBy(col(scoreCol).asc, col(keyCol))
    ranked
      .withColumn("pos_in_bucket", (row_number().over(wB) - 1).cast("long"))
      .withColumn("sched_rank",
        expr(s"pos_in_bucket * $nBuckets + bucket"))
      .drop("__rk", "__n")
  }

  /** Epoch-aware data-mix planning: given a per-stratum token target,
    * how many FULL epochs of each stratum does the run take, and which
    * deterministic subset fills the fractional last epoch?
    * Per stratum:  epochs_micro = unit·target div tokens,
    * full_epochs = epochs_micro div unit, and the fractional epoch
    * admits exactly the documents whose integer hash draw
    * (`hash mod unit`, salt-keyed — no float in the inclusion test)
    * falls below frac_micro — so the plan names its partial-epoch
    * membership, not just a rate, and replays bit-identically.
    * Small-stratum upsampling (full_epochs ≥ 2) and large-stratum
    * subsampling (full_epochs = 0) fall out of the same arithmetic —
    * this is [[planMixUniform]]'s missing epoch dimension.
    *
    * Scale shape: one combine-agg to the |strata|-row token relation,
    * broadcast back for the membership test, one more combine-agg —
    * no window, no per-doc state. */
  def planMixEpochs(docs: DataFrame, strataCol: String, targetTokens: Long,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      hashSeed: Int = 97, unit: Long = 1000000L): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val c = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens_tot"))
      .withColumn("epochs_micro",
        expr(s"(${unit}L * ${targetTokens}L) div greatest(n_tokens_tot, 1)"))
      .withColumn("full_epochs", expr(s"epochs_micro div ${unit}L"))
      .withColumn("frac_micro", expr(s"epochs_micro % ${unit}L"))
    val h = docs.select(col(strataCol),
      col(tokensCol).cast("long").as("__tok"),
      pmod(Dedup.hashStr(col(idCol).cast("string"), hashSeed), lit(unit))
        .as("__hm"))
    h.join(broadcast(c), Seq(strataCol))
      .groupBy(col(strataCol), col("n_docs"), col("n_tokens_tot"),
        col("epochs_micro"), col("full_epochs"), col("frac_micro"))
      .agg(
        sum(when(col("__hm") < col("frac_micro"), 1L).otherwise(0L))
          .as("partial_docs"),
        sum(when(col("__hm") < col("frac_micro"), col("__tok"))
          .otherwise(0L)).as("partial_tokens"))
      .withColumn("planned_tokens",
        expr("full_epochs * n_tokens_tot + partial_tokens"))
  }

  /** Repetition-aware token budgeting (Muennighoff et al., "Scaling
    * Data-Constrained Language Models", NeurIPS 2023): the mix family's
    * plans ([[planMixUniform]]/[[planMixUnimax]]/[[planMixEpochs]])
    * price every planned token at face value, but the paper's central
    * result is that REPEATED epochs decay — the k-th pass over the same
    * data is worth less than the first, falling off roughly
    * exponentially with a half-life of R* ≈ 15 repeats. This operator
    * adds that value dimension to [[planMixEpochs]]: per stratum, the
    * epoch plan (full epochs + named fractional membership, unchanged
    * arithmetic) plus its EFFECTIVE token value
    *
    *   effective = Σ_{k=0}^{E−1} tokens_k · δ^k / unit,   δ = decay
    *     per repeat (micro; the paper's fit ⇒ δ ≈ e^(−1/R*), e.g.
    *     937000 ≈ e^(−1/15.4)), tokens_k = the full stratum for full
    *     epochs, the fractional-epoch membership's tokens for the last
    *
    * with δ^k = exp2(k·(log₂δ − log₂unit)) through the shared
    * fixed-point log₂/exp2 kernels — a closed form in k, so every
    * value replays bit-for-bit (no compounding floor chain). The
    * readout is value_ratio_micro = effective/planned: how much of the
    * budget's face value the repetition actually buys — the number
    * that says "add fresh data" when it sags.
    *
    * No-decay law (CurationSpec): decayMicro = unit ⇒ δ^k ≡ unit
    * exactly (exp2(0)), so effective = planned and the plan reduces to
    * [[planMixEpochs]]'s fresh-token arithmetic; effective ≤ planned
    * always.
    *
    * Scale shape: [[planMixEpochs]]' two combine-aggs, then an epoch
    * explode BOUNDED by |strata|·(maxEpochs+1) rows (never
    * corpus-proportional; strata needing more than `maxEpochs` epochs
    * raise loudly — the [[planMixUnimax]] guard discipline) and one
    * more |strata|-row combine-agg. The per-epoch token product rides
    * DECIMAL(38,0): a 10¹³-token stratum × micro value would wrap a
    * Long. */
  def planRepeatValue(docs: DataFrame, strataCol: String,
      targetTokens: Long, decayMicro: Long, maxEpochs: Int = 100,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      hashSeed: Int = 97, unit: Long = 1000000L): DataFrame = {
    require(decayMicro >= 1L && decayMicro <= unit,
      "decayMicro in [1, unit] — repeats cannot gain value")
    require(maxEpochs >= 1 && maxEpochs <= 1000, "maxEpochs in [1, 1000]")
    val e2 = graft.functions.VectorFunctions.exp2_micro _
    val dec = "DECIMAL(38,0)"
    // log₂δ in micro, computed once driver-side from the literal params
    // (the dsirOracle lgU convention — the oracle re-derives the same
    // constant from the same fixed-point algorithm)
    val lgD = graft.functions.ExactMicroOps.log2Micro(decayMicro) -
      graft.functions.ExactMicroOps.log2Micro(unit)
    val base = planMixEpochs(docs, strataCol, targetTokens, idCol,
        tokensCol, hashSeed, unit)
      .withColumn("full_epochs", when(col("full_epochs") > maxEpochs,
        raise_error(concat(
          lit("planRepeatValue: stratum '"), col(strataCol).cast("string"),
          lit(s"' needs more than maxEpochs=$maxEpochs epochs — "),
          lit("shrink targetTokens or raise the cap"))).cast("long"))
        .otherwise(col("full_epochs")))
      .localCheckpoint(false) // |strata| rows; the explode AND the join
    val eff = base
      .select(col(strataCol), col("n_tokens_tot"), col("full_epochs"),
        col("partial_tokens"),
        explode(sequence(lit(0L), col("full_epochs"))).as("__k"))
      .withColumn("__tok",
        when(col("__k") < col("full_epochs"), col("n_tokens_tot"))
          .otherwise(col("partial_tokens")))
      .withColumn("__val",
        e2(greatest(col("__k") * lit(lgD), lit(-64L * unit))))
      .groupBy(col(strataCol))
      .agg(sum(expr(
        s"CAST((CAST(__tok AS $dec) * __val) div $unit AS BIGINT)"))
        .as("effective_tokens"))
    base.join(eff, Seq(strataCol))
      .withColumn("value_ratio_micro", expr(
        s"($unit * effective_tokens) div greatest(planned_tokens, 1L)"))
  }

  /** OPTIMAL repeat allocation under a total token budget — the
    * resource-allocation question Muennighoff et al. 2023 §5 actually
    * ask ([[planRepeatValue]] prices a GIVEN plan; this one chooses
    * it): spend budget `B` across strata when the k-th pass over any
    * stratum is worth δ^k. Because the marginal value of a token
    * depends only on its stratum's CURRENT epoch depth (δ^⌊e_l⌋, the
    * same curve for every stratum), the exchange argument gives the
    * unique optimal shape — EQUAL EPOCH DEPTH: fill every stratum's
    * epoch 0 (all fresh tokens), then every epoch 1, …, so
    *
    *   k* = B div U   (U = Σ_l U_l, the corpus),  R = B − k*·U
    *
    * full levels everywhere plus the remainder R spread at level k*
    * (any split at the same level has equal value; pro-rata
    * R·U_l div U is the deterministic choice, div dust surfacing as
    * the global `leftover_tokens` — the [[planMixUnimax]] dust
    * convention). Per stratum: alloc_tokens = k*·U_l + partial,
    * epochs_micro, effective_tokens under the δ-decay (the
    * [[planRepeatValue]] exp2-closed-form), and value_ratio_micro.
    *
    * Laws (CurationSpec): δ = unit ⇒ effective = alloc and the plan is
    * a pure pro-rata budget split; for ANY competing plan at the same
    * budget (e.g. [[planMixUniform]]'s equal quotas on a skewed
    * corpus), Σ effective is never higher than this plan's — equal
    * depth dominates by exchange.
    *
    * Scale shape: ONE combine-agg to the |strata|-row mass relation,
    * a one-row broadcast total, per-stratum arithmetic, and the
    * bounded (≤ |strata|·(maxEpochs+1)-row) value explode. */
  def planRepeatOptimal(docs: DataFrame, strataCol: String, budget: Long,
      decayMicro: Long, maxEpochs: Int = 100,
      tokensCol: String = "n_tokens", unit: Long = 1000000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(decayMicro >= 1L && decayMicro <= unit,
      "decayMicro in [1, unit] — repeats cannot gain value")
    require(maxEpochs >= 1 && maxEpochs <= 1000, "maxEpochs in [1, 1000]")
    val e2 = graft.functions.VectorFunctions.exp2_micro _
    val dec = "DECIMAL(38,0)"
    val lgD = graft.functions.ExactMicroOps.log2Micro(decayMicro) -
      graft.functions.ExactMicroOps.log2Micro(unit)
    val counts = docs.groupBy(col(strataCol))
      .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L))
        .as("n_tokens_tot"))
      .localCheckpoint(false) // |strata| rows; total + plan + explode
    val tot = counts.agg(sum(col("n_tokens_tot")).as("__u"))
    val base = counts.crossJoin(broadcast(tot))
      .withColumn("full_levels", expr(s"${budget}L div greatest(__u, 1L)"))
      .withColumn("full_levels", when(col("full_levels") > maxEpochs,
        raise_error(lit(s"planRepeatOptimal: budget needs more than " +
          s"maxEpochs=$maxEpochs epochs of the corpus — " +
          "shrink the budget or raise the cap")).cast("long"))
        .otherwise(col("full_levels")))
      .withColumn("__r", expr(s"${budget}L % greatest(__u, 1L)"))
      .withColumn("partial_tokens", expr(
        s"CAST(CAST(__r AS $dec) * n_tokens_tot div greatest(__u, 1L)" +
          " AS BIGINT)"))
      .withColumn("alloc_tokens",
        expr("full_levels * n_tokens_tot + partial_tokens"))
      .withColumn("epochs_micro", expr(
        s"(${unit}L * alloc_tokens) div greatest(n_tokens_tot, 1L)"))
      .localCheckpoint(false) // feeds the explode AND the final join
    val eff = base
      .select(col(strataCol), col("n_tokens_tot"), col("full_levels"),
        col("partial_tokens"),
        explode(sequence(lit(0L), col("full_levels"))).as("__k"))
      .withColumn("__tok",
        when(col("__k") < col("full_levels"), col("n_tokens_tot"))
          .otherwise(col("partial_tokens")))
      .withColumn("__val",
        e2(greatest(col("__k") * lit(lgD), lit(-64L * unit))))
      .groupBy(col(strataCol))
      .agg(sum(expr(
        s"CAST((CAST(__tok AS $dec) * __val) div $unit AS BIGINT)"))
        .as("effective_tokens"))
    val plan = base.join(eff, Seq(strataCol))
    val leftover = plan.agg(
      (lit(budget) - sum(col("alloc_tokens"))).as("leftover_tokens"))
    plan.crossJoin(broadcast(leftover))
      .select(col(strataCol), col("n_tokens_tot"), col("full_levels"),
        col("partial_tokens"), col("alloc_tokens"), col("epochs_micro"),
        col("effective_tokens"),
        expr(s"(${unit}L * effective_tokens) div greatest(alloc_tokens, 1L)")
          .as("value_ratio_micro"),
        col("leftover_tokens"))
  }

  def rankNormalize(df: DataFrame, strataCol: String, scoreCol: String,
      keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val wOrd = w.orderBy(col(scoreCol).asc, col(keyCol))
    df.withColumn("__rk", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn(s"${scoreCol}_pct_micro",
        expr("(1000000 * (__rk - 1)) div greatest(__n - 1, 1)"))
      .drop("__rk", "__n")
  }

  /** Per-stratum Gini coefficient of a non-negative value column — the
    * inequality audit of mix planning: how unevenly token mass is spread
    * across a source's documents (0 = perfectly uniform, →1 = one
    * document carries everything). A source whose token mass concentrates
    * in a few giant documents behaves very differently under per-document
    * sampling than its document count suggests; this is the one-number
    * monitor for that.
    *
    * Exactly rational via the rank form over the ascending-sorted values
    * x_(1) ≤ … ≤ x_(n):  G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx), so
    * gini_micro = unit·(2R − (n+1)·S) div (n·S) with R = Σ rank·x.
    * `row_number` over (value, key) pins the permutation for plan
    * determinism, but the RESULT is tie-break-invariant: swapping two
    * equal values between adjacent ranks leaves Σ rank·x unchanged.
    * The numerator is ≥ 0 for non-negative x, so floor-div agrees across
    * engines (no negative-division divergence).
    *
    * 100 TB shape: one per-stratum rank window (a stratum must fit a
    * partition sort — the exact-percentile / trimmed-mean class; beyond
    * that, serve quantile-sketch summaries instead) feeding a map-side
    * combined agg down to ONE row per stratum. Overflow: R ≤ n²·max(x)
    * wraps a long near n ≈ 10⁵ at book-length documents, so both products
    * AND the value sum S ride DECIMAL(38,0) — exact past n ~ 10¹⁵ docs
    * per stratum (a plain long S would wrap first, around 10¹⁴
    * book-length docs, and diverge from a HUGEINT-summing oracle).
    * `total_value` is reported as a long for schema stability and nulls
    * if the exact decimal sum exceeds long range — the gini itself never
    * loses exactness.
    *
    * All-zero strata (S = 0): gini is defined here as 0 (a constant
    * vector is perfectly uniform — the 0/0 limit by the deflation
    * convention). Without the guard Spark's `div` would yield NULL while
    * engines with erroring integer division (DuckDB `//`) abort. */
  def giniByStratum(df: DataFrame, strataCol: String, valueCol: String,
      keyCol: String, unit: Long = 1000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(valueCol).asc, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"),
        sum(expr(s"CAST($valueCol AS DECIMAL(38,0))")).as("__s"),
        sum(expr(s"CAST(__rk AS DECIMAL(38,0)) * $valueCol")).as("__r"))
      .withColumn("gini_micro", expr(
        s"CASE WHEN __s = 0 THEN CAST(0 AS BIGINT) ELSE " +
          s"CAST(($unit * (2 * __r - CAST(__n + 1 AS DECIMAL(38,0)) * __s)) " +
          s"div (CAST(__n AS DECIMAL(38,0)) * __s) AS BIGINT) END"))
      .select(col(strataCol), col("__n").as("n_rows"),
        expr("try_cast(__s AS BIGINT)").as("total_value"), col("gini_micro"))
  }

  def capPerStratum(df: DataFrame, strataCol: String, keyCol: String,
      cap: Int, salt: String = "cap"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashFraction(col(keyCol), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Java-and-RE2-compatible PII patterns (DuckDB's regexp engine is RE2 —
    * stick to syntax both accept: no lookarounds, no backrefs). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d-]{7,}"

  /** Instrument a gating stage with pass/total counters via
    * `Dataset.observe` — the metrics ride the job that materializes the
    * result, so monitoring a 100 TB gate costs zero extra passes (the
    * naive `df.count()` before-and-after doubles the pipeline). Returns
    * the filtered frame plus the Observation handle; read
    * `observation.get` after an action completes. */
  def observedGate(df: DataFrame, name: String,
      keep: Column): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("total_rows"),
      sum(when(keep, 1L).otherwise(0L)).as("kept_rows"))
    (observed.filter(keep), obs)
  }

  /** Redact emails, IPv4s, then phone-shaped tokens (fixed order — the
    * patterns can overlap, so order is part of the contract). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Sequence packing: assign each document a (shard, bin, offset) slot in
    * fixed token-budget bins — the pretraining step that concatenates
    * documents into context-length rows. Greedy fill in a content-stable
    * order (md5 of the key): each doc starts at its shard's running token
    * sum; `bin_id = start / maxTokens`; a doc that straddles a boundary is
    * split/truncated by the downstream writer (standard packing-with-
    * truncation semantics — no bin is left short except each shard's last).
    *
    * Scale shape: a GLOBAL running sum would serialize the corpus through
    * one partition, so packing is sharded — `nShards` independent hash
    * shards, each a `Window.partitionBy(shard)` cumulative sum, all
    * computed in parallel after one shuffle by shard. Bins are keyed
    * (shard, bin) so ids never collide across shards. At 100 TB with
    * balanced md5 shards, each shard's window sees corpus/nShards rows.
    * Deterministic: same corpus → same packing, independent of partition
    * layout or cluster size. */
  def packSequences(df: DataFrame, maxTokens: Long, nShards: Int = 256,
      keyCol: String = "doc_id", tokensCol: String = "n_tokens"): DataFrame = {
    require(maxTokens > 0 && nShards > 0, "maxTokens and nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"))
    df
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 2), 16, 10).cast("int"), lit(nShards)))
      .withColumn("__start",
        coalesce(sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L)))
      .select(col(keyCol), col("shard"),
        floor(col("__start") / maxTokens).as("bin_id"),
        pmod(col("__start"), lit(maxTokens)).as("bin_offset"),
        col(tokensCol))
  }

  /** Exact per-source token-budget sampling — build a training mix by
    * taking documents from each source, in a content-stable order, until
    * that source's token budget is EXACTLY respected (every kept prefix
    * sums ≤ budget; the straddling document and everything after it are
    * dropped — prefix semantics, not a knapsack). Sources absent from
    * `budgets` are dropped entirely. Rate-based sampling
    * ([[sampleStratified]]) only hits a budget in expectation; this hits
    * it deterministically, which is what a curriculum/mix spec needs.
    *
    * Scale shape: the same sharded-cumsum trick as [[packSequences]] —
    * a global per-source running sum would serialize each source
    * through one partition, so the order is (shard, md5) with
    * per-shard parallel cumulative sums, stitched into a global
    * position by adding the (sources × nShards)-sized shard-prefix
    * offsets. One shuffle keyed (source, shard) + one tiny window.
    * Deterministic and partition-invariant. */
  def sampleTokenBudget(docs: DataFrame, budgets: Map[String, Long],
      nShards: Int = 256, idCol: String = "doc_id",
      sourceCol: String = "source", tokensCol: String = "n_tokens"): DataFrame = {
    require(budgets.nonEmpty && nShards > 0, "need budgets and positive shards")
    val spark = docs.sparkSession
    import spark.implicits._
    val b = broadcast(budgets.toSeq.toDF(sourceCol, "__budget"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("__shard")).orderBy(col("__h"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = docs
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__shard",
        pmod(conv(substring(col("__h"), 1, 2), 16, 10).cast("int"), lit(nShards)))
      .withColumn("__cum", sum(col(tokensCol)).over(wIn))
    val offsets = cum.groupBy(col(sourceCol), col("__shard"))
      .agg(sum(col(tokensCol)).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col(sourceCol), col("__shard"), col("__off"))
    cum.join(offsets, Seq(sourceCol, "__shard"))
      .join(b, Seq(sourceCol))
      .filter(col("__off") + col("__cum") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col(tokensCol),
        (col("__off") + col("__cum")).as("budget_pos"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: for each distinct
    * quasi-identifier combination, its equivalence-class size and
    * whether it violates k-anonymity (class smaller than k — those rows
    * are re-identifiable by the quasi-identifiers alone). The release
    * gate that runs BEFORE a corpus with demographic/provenance columns
    * ships: [[redactPii]] scrubs direct identifiers inside the text;
    * this catches the indirect ones in the metadata.
    *
    * One map-side-combined aggregation on the quasi-identifier key —
    * the output is attribute-combination-sized (not corpus-sized), so
    * at 100 TB it is a single cheap pass; the violating classes join
    * back against the corpus as a broadcast to drop or generalize the
    * affected rows. */
  def kAnonymityAudit(df: DataFrame, quasiIdCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty && k >= 1, "need quasi-id columns and k >= 1")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity audit (Machanavajjhala et al., TKDD'07) — the
    * [[kAnonymityAudit]] companion for the attack k-anonymity misses: a
    * class can be large yet carry only ONE sensitive value, so knowing
    * someone is in it reveals their attribute anyway. Per quasi-id
    * equivalence class: size, distinct sensitive values, and the
    * violation flag (distinct < l). Same one-aggregation scale shape as
    * the k audit (attribute-combination-sized output; violating classes
    * broadcast back to suppress or generalize). */
  def lDiversityAudit(df: DataFrame, quasiIdCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiIdCols.nonEmpty && l >= 1,
      "need quasi-id columns and l >= 1")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Leakage-safe split assignment: the split draw is keyed by the
    * near-dup CLUSTER representative, not the document — every member
    * of a duplicate cluster lands in the SAME split, so a test doc can
    * never be a near-copy of a train doc (the failure mode
    * `split_leakage_check` AUDITS, prevented by construction here;
    * per-doc [[assignSplit]] scatters a 50-copy cluster across all
    * three splits with probability ~1).
    *
    * `pairs` is any verified near-dup pair relation (MinHash, SimHash,
    * prefix-filter…); docs in no pair are their own singleton cluster.
    * Scale shape: [[graft.ops.Components.connectedComponents]] over the
    * pair minority + one left join of the component labels back to the
    * corpus + a map-side hash split — the corpus never enters the
    * component loop. */
  def splitByCluster(docs: DataFrame, pairs: DataFrame,
      weights: Seq[(String, Double)], idCol: String = "doc_id",
      aCol: String = "id_a", bCol: String = "id_b",
      salt: String = "split"): DataFrame = {
    val comps = graft.ops.Components
      .connectedComponents(pairs, srcCol = aCol, dstCol = bCol)
      .select(col("id").as(idCol), col("component"))
    docs.join(comps, Seq(idCol), "left")
      .withColumn("cluster_rep", coalesce(col("component"), col(idCol)))
      .withColumn("split", assignSplit(col("cluster_rep"), weights, salt))
      .drop("component")
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) — the third
    * leg of the privacy triad after [[kAnonymityAudit]] and
    * [[lDiversityAudit]], for the attack l-diversity misses: a class can
    * carry many DISTINCT sensitive values that are all semantically
    * close (every salary in the class is "high"), so membership still
    * leaks the attribute. Per quasi-id equivalence class: the Earth
    * Mover's Distance between the class's sensitive-value distribution
    * and the GLOBAL distribution, under the ordered-distance ground
    * metric of the paper (§4.2): for m ordered values,
    * EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j − q_j)|.
    *
    * Exact integer arithmetic: with cumulative class count C_i (class
    * size n) and cumulative global count G_i (total N), each cumulative
    * mass difference is the exact rational (N·C_i − n·G_i)/(n·N); the
    * products route through DECIMAL(38,0) so billion-row classes cannot
    * wrap a Long (same discipline as Preference.btScores), and ONE
    * integral division at the end yields
    * emd_micro = ⌊10⁶ · Σ|N·C_i − n·G_i| / ((m−1)·n·N)⌋ — floor
    * semantics agree across engines on non-negative operands, so the
    * audit hash-replays in any SQL engine.
    *
    * Scale shape: two map-side-combined aggregations (per-class-value
    * counts; global value counts) plus a class × value-domain expansion
    * where the value domain is the BOUNDED ordered bucket set (callers
    * pass a bucketed sensitive column — m ≤ a few hundred), broadcast
    * against the class relation. The corpus is touched once; everything
    * downstream is attribute-combination-sized. Missing (class, value)
    * cells are genuine zeros: the cumulative difference must still be
    * evaluated at every i, which is why the expansion joins the full
    * domain instead of only observed cells. */
  def tClosenessAudit(df: DataFrame, quasiIdCols: Seq[String],
      sensitiveCol: String, tMicro: Long): DataFrame = {
    require(quasiIdCols.nonEmpty && tMicro >= 0,
      "need quasi-id columns and t >= 0")
    val qs = quasiIdCols.map(col)
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(qs :+ col(sensitiveCol).cast("long").as("__v"): _*)
    // Global ordered distribution: value -> cumulative count G_i via the
    // triangular self-join on the BOUNDED value domain (the house
    // no-global-window pattern, cf. Sketches.ksFromCounts), with domain
    // size m and total N crossed on from a one-row aggregate.
    val counts = base.groupBy(col("__v")).agg(count(lit(1)).as("__g"))
      .localCheckpoint(false) // value-domain sized; feeds cum + totals
    val gcum = counts.as("x")
      .join(counts.select(col("__v").as("__v2"), col("__g").as("__g2")),
        col("__v2") <= col("__v"))
      .groupBy(col("__v")).agg(sum(col("__g2")).as("__gcum"))
    val tot = counts.agg(sum(col("__g")).as("__n_total"),
      count(lit(1)).as("__m"))
    val global = gcum.crossJoin(broadcast(tot))
    // Per-class observed counts, then expand to the full value domain so
    // zero cells contribute their (constant-C_i, growing-G_i) terms.
    val classCounts = base.groupBy(qs :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val classes = classCounts.groupBy(qs: _*)
      .agg(sum(col("__c")).as("class_size"))
    val grid = classes.crossJoin(broadcast(global))
    val wClass = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dec = "DECIMAL(38,0)"
    grid.join(classCounts, quasiIdCols :+ "__v", "left")
      .withColumn("__ccum", sum(coalesce(col("__c"), lit(0L))).over(wClass))
      // |N·C_i − n·G_i| in DECIMAL(38,0); the last value (i = m) always
      // cancels exactly (C_m = n, G_m = N), so summing ALL rows equals
      // summing i < m.
      .withColumn("__term", abs(
        col("__n_total").cast(dec) * col("__ccum").cast(dec) -
          col("class_size").cast(dec) * col("__gcum").cast(dec)))
      .groupBy(qs :+ col("class_size") :+ col("__m") :+ col("__n_total"): _*)
      .agg(sum(col("__term")).as("__num"))
      // IntegralDivide on non-negative DECIMAL(38,0) operands: floor in
      // Spark AND DuckDB (//) — the single rounding point of the audit.
      .withColumn("emd_micro", when(col("__m") <= 1, lit(0L)).otherwise(
        expr("CAST(__num * 1000000 AS DECIMAL(38,0)) div " +
          "CAST((__m - 1) * CAST(class_size AS DECIMAL(38,0)) * __n_total " +
          "AS DECIMAL(38,0))")))
      .withColumn("at_risk", col("emd_micro") > lit(tMicro))
      .drop("__num", "__m", "__n_total")
  }

  /** Greedy k-center coreset selection (Sener & Savarese, ICLR 2018 —
    * the farthest-point traversal with the 2-approximation guarantee)
    * over an embedding corpus: pick the max-norm vector first (the
    * deterministic pin replacing the paper's random seed, ties to the
    * lowest id), then repeatedly the point FARTHEST from its nearest
    * selected center — the diverse-sample / annotation-budget selector
    * (the selected radius is the covering radius, so each output row
    * reports how well the corpus was covered before that center was
    * added).
    *
    * Exact integers end-to-end: vectors are micro-quantized
    * ([[Similarity.microVec]] floor(x·10⁶)), squared distances are
    * ‖a‖² + ‖b‖² − 2a·b over Long dots (components < 2⁵³, so the
    * oracle's double-based list_dot_product replays them exactly — the
    * shared idot contract), and every argmax is (dist desc, id asc)
    * pinned with already-selected ids excluded.
    *
    * Scale shape: one quantize+norm pass (localCheckpointed), then per
    * center ONE map-only distance update against the broadcast-literal
    * center vector, a checkpoint (the min-dist relation feeds the next
    * round), and a 1-row TakeOrdered collect — k corpus passes total,
    * the greedy algorithm's inherent cost; k is required ≤ 64. */
  def coresetKCenter(emb: DataFrame, k: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k=$k out of range: one corpus pass + one 1-row collect per center")
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("id"),
        Similarity.microVec(col(vecCol)).as("v"))
      .withColumn("q", aggregate(zip_with(col("v"), col("v"), _ * _),
        lit(0L), _ + _))
      .localCheckpoint(false) // feeds every round's distance update
    def pick(df: DataFrame, ordCol: String, selected: Seq[Long]) = {
      val row = df.filter(!col("id").isin(selected: _*))
        .orderBy(col(ordCol).desc, col("id")).limit(1).collect()(0)
      (row.getLong(row.fieldIndex("id")), row.getSeq[Long](1).toArray,
        row.getLong(row.fieldIndex("q")), row.getLong(row.fieldIndex(ordCol)))
    }
    val first = pick(base, "q", Nil)
    val centers = Seq.newBuilder[(Long, Long, Long)] // (rank, id, radius²)
    centers += ((1L, first._1, 0L))
    var selected = Seq(first._1)
    var cv = first._2
    var cq = first._3
    var mind: DataFrame = null
    for (r <- 2 to k) {
      val d = col("q") + lit(cq) -
        lit(2L) * aggregate(zip_with(col("v"), lit(cv), _ * _),
          lit(0L), _ + _)
      mind = (if (mind == null) base.withColumn("mind", d)
        else mind.withColumn("mind", least(col("mind"), d)))
        .localCheckpoint(false)
      val next = pick(mind, "mind", selected)
      centers += ((r.toLong, next._1, next._4))
      selected :+= next._1
      cv = next._2
      cq = next._3
    }
    import spark.implicits._
    centers.result().toDF("rank", "vec_id", "radius_sq")
  }

  /** ε-differentially-private count release via the GEOMETRIC
    * mechanism (Ghosh, Roughgarden & Sundararajan, STOC 2009 — the
    * universally utility-maximizing discrete mechanism; the discrete
    * Laplace of Dwork et al. 2006): per group, release n + Z where
    * Z = X₁ − X₂ and each Xᵢ ~ Geometric with decay α = e^(−ε) —
    * P(Z = z) ∝ α^|z|, the exact ε-DP noise for count queries of
    * sensitivity 1. This completes the privacy release gate:
    * k-anonymity / l-diversity / t-closeness audit the QUASI-identifier
    * side; the DP mechanism protects the released AGGREGATES
    * themselves.
    *
    * Determinism contract (documented, deliberate): the geometric
    * draws come from content-stable md5 uniforms (key, seed) through
    * the quantized inverse CDF X = ⌊|lg u| / |lg α|⌋ over the shared
    * floored-micro log₂ kernel — the engine provides the MECHANISM
    * with replayable draws so the oracle can gate it bit-for-bit; a
    * production release swaps the seeded uniforms for fresh entropy
    * (the only non-replayable ingredient). α itself is the shared
    * fixed-point chain: α = exp2Micro(−⌊ε·log₂e⌋).
    *
    * Output: (stratum, n_true, noise, n_dp) with n_dp = max(n + Z, 0)
    * (the standard non-negative post-processing, which DP permits);
    * n_true rides along for the audit harness and is dropped by an
    * actual release.
    *
    * Scale shape: one map-side-combined count aggregation; the noise
    * is map-only arithmetic on the group-bounded relation. */
  def dpGeometricCounts(df: DataFrame, keyCol: String,
      epsMicro: Long = 1000000L, seed: Int = 47,
      unit: Long = 1000000L): DataFrame = {
    require(epsMicro >= 100000L && epsMicro <= 20000000L,
      s"epsMicro=$epsMicro out of [0.1, 20] — alpha would leave the " +
        "exact log2/exp2 envelope")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val lgExp = (BigInt(epsMicro) * 1442695L / unit).toLong
    val alphaMicro = math.max(
      graft.functions.ExactMicroOps.exp2Micro(-lgExp), 1L)
    val lgU6 = graft.functions.ExactMicroOps.log2Micro(unit)
    val absLgA = lgU6 - graft.functions.ExactMicroOps.log2Micro(alphaMicro)
    df.groupBy(col(keyCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("__l1",
        lg(Dedup.hashStr(col("stratum"), seed) % unit + 1L))
      .withColumn("__l2",
        lg(Dedup.hashStr(col("stratum"), seed + 1) % unit + 1L))
      .withColumn("noise", expr(
        s"(($lgU6 - __l1) div $absLgA) - (($lgU6 - __l2) div $absLgA)"))
      .select(col("stratum"), col("n_true"), col("noise"),
        greatest(col("n_true") + col("noise"), lit(0L)).as("n_dp"))
  }

  /** Class-balanced mixture weights by EFFECTIVE number of samples
    * (Cui et al., CVPR 2019): the re-weighting family's answer to "n
    * raw counts overstate big strata because samples overlap" — the
    * effective number E_n = (1 − βⁿ)/(1 − β) saturates at 1/(1 − β)
    * as a stratum grows, so weights w ∝ 1/E_n interpolate between
    * no re-weighting (β = 0) and inverse-frequency (β → 1). The
    * standard imbalance correction for a mixing plan over
    * heavy-tailed source/language strata.
    *
    * Exact chain: βⁿ in micro by LSB-first square-and-multiply with a
    * truncating ÷10⁶ after every multiply — deterministic and
    * replayed bit-for-bit by the oracle's recursive-CTE pow (the
    * [[graft.functions.ExactMicroOps.exp2Micro]] discipline applied
    * to a data-dependent exponent); E_n, the raw weight, and the
    * Σ = 10⁶-normalized weight are single floor divisions each.
    *
    * Scale shape: ONE map-side-combined count aggregation; everything
    * after runs on the strata-bounded relation (loud `maxStrata`
    * guard) driver-side — the [[graft.ops.Linkage.fellegiSunterEm]]
    * bounded-sufficient-statistic posture. */
  def classBalancedWeights(df: DataFrame, strataCol: String,
      betaMicro: Long = 999000L, unit: Long = 1000000L,
      maxStrata: Int = 1024): DataFrame = {
    require(betaMicro >= 0L && betaMicro < unit,
      s"betaMicro=$betaMicro out of [0, $unit)")
    val spark = df.sparkSession
    val counts = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty && counts.length <= maxStrata,
      s"classBalancedWeights: ${counts.length} strata outside " +
        s"[1, $maxStrata] — the per-stratum walk is driver-side")
    def powMicro(n: Long): Long = { // LSB-first square-and-multiply
      var acc = BigInt(unit); var base = BigInt(betaMicro); var rem = n
      while (rem > 0) {
        if ((rem & 1L) == 1L) acc = acc * base / unit
        base = base * base / unit
        rem >>= 1
      }
      acc.toLong
    }
    val oneMinusB = unit - betaMicro
    val rows = counts.map { case (s, n) =>
      val bp = powMicro(n)
      // E_n = (1 − βⁿ)/(1 − β), micro; β = 0 ⇒ E_n = 10⁶ (= 1 sample
      // of worth per sample); raw weight ∝ 1/E_n
      val eff = (BigInt(unit - bp) * unit / oneMinusB).toLong
      val wraw = (BigInt(unit) * oneMinusB / (unit - bp)).toLong
      (s, n, bp, eff, wraw)
    }
    val wsum = rows.map(r => BigInt(r._5)).sum
    import spark.implicits._
    rows.map { case (s, n, bp, eff, wraw) =>
      (s, n, bp, eff, (BigInt(unit) * wraw / wsum).toLong)
    }.toSeq.toDF("stratum", "n_docs", "beta_pow_micro",
      "effective_num_micro", "weight_micro")
  }

  /** Facility-location submodular selection (Lin & Bilmes, ACL 2011 —
    * the coverage objective behind submodular data-subset selection):
    * greedily pick k candidates maximizing F(S) = Σ_corpus max_{j∈S}
    * sim(i, j), the "every corpus point is near some selected point"
    * criterion — the coverage-seeking complement of
    * [[coresetKCenter]]'s worst-case radius and `sim_mmr_rerank`'s
    * candidate-internal diversity. The greedy argmax carries the
    * classic (1 − 1/e) guarantee because F is monotone submodular —
    * which the similarity floor enforces: sim = max(idot, 0) over
    * micro-quantized vectors (exact integer dots; negative cosine
    * regions contribute zero coverage, keeping F monotone).
    *
    * Exact chain: sims in micro² (dot of two micro vectors), per-round
    * marginal gains Σ max(sim − cur, 0) summed in DECIMAL(38,0)
    * (corpus-sized sums of ≤ dim·10¹² terms overflow Long past ~10⁵
    * rows), argmax pinned (gain desc, cid asc), coverage update cur′ =
    * max(cur, sim(·, pick)). Reported gain is floored to micro
    * (÷ 10⁶).
    *
    * Scale shape: the per-row pool-similarity ARRAY is built once
    * (pool ≤ maxPool enforced — at 100 TB the pool is a pre-selected
    * bounded candidate set: cluster centroids, a stratified sample;
    * the collected candidate vectors ride as literals) and
    * checkpointed; each of the k rounds is then ONE map-side-combined
    * posexplode+gain aggregation down to a P-row collect, with the
    * coverage-so-far computed inline from the picked array slots (no
    * per-round join, no per-round checkpoint) — k·(n·P) work, the
    * greedy algorithm's inherent cost, with NO corpus×corpus relation
    * ever built. */
  def facilityLocationSelect(corpus: DataFrame, pool: DataFrame,
      k: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      maxPool: Int = 256): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of [1, 64]")
    val spark = corpus.sparkSession
    val dec = "DECIMAL(38,0)"
    val nPool = pool.count()
    require(nPool >= k && nPool <= maxPool,
      s"facilityLocationSelect: pool of $nPool outside [$k, $maxPool] — " +
        "the gain aggregation is corpus×pool-sized; pre-select a bounded " +
        "candidate set (centroids, a stratified sample) at scale")
    // candidate vectors collected once (pool is loudly bounded above),
    // cid-sorted so the array index order is deterministic
    val candArr = pool.select(col(idCol).as("cid"),
        Similarity.microVec(col(vecCol)).as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    // per corpus row, ALL pool similarities as one array column — built
    // once, map-only (the transform over the literal candidate matrix
    // keeps codegen compiled; P separate fold expressions in one
    // projection blow the codegen method budget into interpreted mode),
    // then materialized ONCE as an RDD of primitive arrays. Every
    // greedy round is then ONE result-stage job — a mapPartitions
    // partial-gain fold merged on the driver — with NO exchange and no
    // per-round codegen (the r15 posexplode+groupBy form re-planned,
    // re-compiled, and ran 2 AQE stage-jobs per round; same k·(n·P)
    // work, same values).
    val candMatrix = typedLit(candArr.map(_._2.toSeq).toSeq)
    val dotsRdd = corpus
      .select(Similarity.microVec(col(vecCol)).as("v"))
      .withColumn("dots", transform(candMatrix, cv =>
        greatest(aggregate(zip_with(col("v"), cv, _ * _),
          lit(0L), _ + _), lit(0L))))
      .select(col("dots"))
      .rdd.map(r => r.getSeq[Long](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nP = candArr.length
    var selIdx = Seq.empty[Int]
    val picks = Seq.newBuilder[(Long, Long, Long)] // (rank, cid, gain)
    for (r <- 1 to k) {
      val sel = selIdx.toArray
      // per-partition Long partials (each row's gain ≤ dim·10¹² for
      // unit-range embeddings, so ≤ ~10⁵ rows fit a Long), flushed into
      // BigInt well before that envelope — the driver merge is exact,
      // matching the r15 DECIMAL(38,0) sums bit-for-bit. The envelope is
      // data-dependent (nothing clamps the embedding magnitude), so the
      // accumulator adds via Math.addExact: an out-of-envelope corpus
      // fails LOUDLY instead of silently corrupting the greedy argmax
      // (ADVICE r16).
      val gains: Array[BigInt] = dotsRdd.mapPartitions { it =>
        val acc = Array.fill(nP)(BigInt(0))
        val accL = new Array[Long](nP)
        var sinceFlush = 0
        def flush(): Unit = {
          var j = 0
          while (j < nP) { acc(j) += BigInt(accL(j)); accL(j) = 0L; j += 1 }
          sinceFlush = 0
        }
        while (it.hasNext) {
          val d = it.next()
          var cur = 0L
          var i = 0
          while (i < sel.length) {
            val v = d(sel(i)); if (v > cur) cur = v; i += 1
          }
          var j = 0
          while (j < nP) {
            val g = d(j) - cur
            if (g > 0L) accL(j) = Math.addExact(accL(j), g)
            j += 1
          }
          sinceFlush += 1
          if (sinceFlush >= 65536) flush()
        }
        flush()
        Iterator.single(acc)
      }.fold(Array.fill(nP)(BigInt(0))) { (a, b) =>
        Array.tabulate(nP)(j => a(j) + b(j))
      }
      // argmax over unselected candidates: gain desc, cid asc
      val (idx, g) = gains.zipWithIndex
        .map { case (gv, i) => (i, gv) }
        .filterNot { case (i, _) => selIdx.contains(i) }
        .maxBy { case (i, gv) => (gv, -candArr(i)._1) }
      picks += ((r.toLong, candArr(idx)._1, (g / 1000000L).toLong))
      selIdx :+= idx
    }
    dotsRdd.unpersist(false)
    import spark.implicits._
    picks.result().toDF("rank", idCol, "gain_micro")
  }

  /** DoReMi-shaped domain reweighting (Xie et al., NeurIPS 2023):
    * exponentiated-gradient updates of the pretraining mixture weights
    * from per-domain EXCESS LOSS, with the final mixture the average of
    * the per-round weights. This is the static-excess instantiation —
    * DoReMi's proxy/reference pair is taken as (global unigram LM,
    * domain-conditional unigram LM), whose per-token excess loss is
    * exactly the KL divergence KL(domain ‖ corpus):
    *
    *   KL_d·N_d = Σ_w c_dw·(log2(c_dw) − log2(N_d) − log2(c_w) + log2(N))
    *
    * — every log2 the shared fixed-point [[graft.functions.ExactMicroOps
    * .log2Micro]] kernel, every product exact in DECIMAL(38,0), the
    * per-domain division sign-split, negatives (truncation noise around
    * KL ≈ 0) clipped to 0 exactly as DoReMi clips excess loss. Updates
    * use base-2 exponentiation (a monotone reparametrization of the
    * step size, replayable via [[graft.functions.ExactMicroOps
    * .exp2Micro]]): per round,
    * α'_d = ⌊α_d·2^(excess_d·etaNum/(etaDen·10⁶))⌋ with the exponent
    * clamped into the exp2 envelope, renormalized to Σ = 10⁶ by
    * truncating division.
    *
    * Scale shape: token counting is ONE exploded pass with map-side
    * combine; the (domain, word) relation joins word-keyed against the
    * global counts (shuffle on word — the corpus-scale join) and the
    * KL aggregation collapses it to a domains-sized relation, which is
    * localCheckpointed before the `rounds` chained tiny-join updates.
    * Nothing is collected; the output is domains-sized. */
  def doremiDomainWeights(docs: DataFrame, rounds: Int = 4,
      etaNum: Long = 256L, etaDen: Long = 1L, domainCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64 && etaNum >= 1L && etaDen >= 1L &&
      etaNum <= 1000000000L, "bad rounds/eta")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val dec = "DECIMAL(38,0)"
    val toks = docs.select(col(domainCol).as("domain"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    val cdw = toks.groupBy(col("domain"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds nd, cw, totals, and the term join
    val nd = cdw.groupBy(col("domain")).agg(sum(col("c")).as("n_tokens"))
    val cw = cdw.groupBy(col("w")).agg(sum(col("c")).as("cg"))
    val tot = cdw.agg(sum(col("c")).as("n_total"))
    val terms = cdw
      .join(cw, Seq("w"))
      .join(broadcast(nd), Seq("domain"))
      .crossJoin(broadcast(tot))
      .select(col("domain"),
        (col("c").cast(dec) *
          (lg(col("c")) - lg(col("n_tokens")) - lg(col("cg")) +
            lg(col("n_total"))).cast(dec)).as("term"))
      .groupBy(col("domain"))
      .agg(sum(col("term")).as("klnum"))
    // all-docs domain list (a domain of only empty texts still gets a
    // weight — excess 0), n_docs per domain
    val domains = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val kl = domains
      .join(broadcast(nd), Seq("domain"), "left")
      .join(broadcast(terms), Seq("domain"), "left")
      .select(col("domain"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        expr(s"""CAST(CASE WHEN n_tokens IS NULL OR n_tokens = 0 THEN 0
                |  WHEN klnum >= 0 THEN klnum div CAST(n_tokens AS $dec)
                |  ELSE -((-klnum) div CAST(n_tokens AS $dec)) END
                |AS BIGINT)""".stripMargin).as("kl_micro"))
      .withColumn("excess_micro", greatest(col("kl_micro"), lit(0L)))
      .withColumn("x", graft.functions.VectorFunctions.exp2_micro(
        least(expr(s"(excess_micro * ${etaNum}L) div ${etaDen}L"),
          lit(20000000L))))
      .localCheckpoint(false) // domains-sized; feeds every round below
    val d0 = kl.crossJoin(broadcast(kl.agg(count(lit(1)).as("__d"))))
      .withColumn("a", expr("1000000L div __d"))
      .withColumn("asum", lit(0L))
      .drop("__d")
    val rel = (1 to rounds).foldLeft(d0) { (acc, _) =>
      // checkpoint keeps the per-round plan flat: `up` feeds both the
      // normalizing one-row sum and the join back
      val up = acc.withColumn("up", expr("(a * x) div 1000000L"))
        .localCheckpoint(false)
      up.crossJoin(broadcast(up.agg(sum(col("up")).as("__s"))))
        .withColumn("a", expr("(up * 1000000L) div __s"))
        .withColumn("asum", col("asum") + col("a"))
        .drop("up", "__s")
    }
    rel.select(col("domain"), col("n_docs"), col("n_tokens"),
      col("kl_micro"), col("excess_micro"),
      expr(s"asum div ${rounds}L").as("weight_micro"))
  }

  /** DSIR data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every raw
    * document by the log importance ratio of two hashed-n-gram bag
    * unigram models — the target model trained on the `isTarget` slice,
    * the raw model on the full corpus — then select `budget` documents
    * WITHOUT replacement with probability ∝ the importance weight via
    * deterministic Gumbel-top-k (the exact sampling the paper's
    * resampling step performs; Gumbel keys with a content-addressed
    * uniform replace its RNG so every engine replays the same draw).
    *
    * Features: unigrams + bigrams of the normalized text, md5-hashed
    * into `buckets` buckets ([[Dedup.hashStr]] mod B — the paper's
    * hashed n-gram trick, vocabulary-free). Per bucket b with Laplace
    * smoothing: p(b) = (c_b + 1)/(N + B), floored once to micro with a
    * ≥1 clamp (the [[Sketches.psiFromCounts]] contract); per document
    * log2 w(x) = Σ_b n_x(b)·(log2μ p_t(b) − log2μ p_r(b)) in exact
    * micro via the fixed-point log2 kernel. Gumbel key = logw +
    * (−log2(−log2 u)) with u = (md5 draw mod 10⁶)+1 — both logs the
    * same kernel, so the whole chain is integer-exact.
    *
    * Output per document: n_grams, logw_micro, gumbel_micro, keep
    * (budget-sized true set). Uniform-target law: if every document is
    * target, p_t ≡ p_r so logw ≡ 0 and selection reduces to the pure
    * Gumbel draw (CurationSpec pins it).
    *
    * Scale shape: gram explode → ONE (doc, bucket) combine-agg (the
    * [[graft.ops.TextAnalysis]] bigramLmScore posture); both models
    * derive from that materialization (B-row relations, broadcast
    * back); scoring is one broadcast equi-join on bucket id; selection
    * is orderBy+limit = TakeOrderedAndProject (per-partition top-k, no
    * global sort or window). */
  def dsirSelect(docs: DataFrame, isTarget: Column, budget: Int,
      buckets: Int = 256, seed: Int = 29, idCol: String = "doc_id",
      textCol: String = "text", unit: Long = 1000000L,
      bucketsOpt: Option[DataFrame] = None): DataFrame = {
    // bucketsOpt: a precomputed [[dsirBuckets]] relation (same docs/
    // buckets/seed — caller's contract) so [[dsirShiftEval]] shares the
    // gram explode + combine-agg instead of rebuilding it
    require(budget >= 1, "budget must be positive")
    require(buckets >= 2 && buckets <= (1 << 20), "buckets in [2, 2^20]")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val db = bucketsOpt
      .getOrElse(dsirBuckets(docs, isTarget, buckets, seed, idCol, textCol))
    val byB = db.groupBy(col("b"))
      .agg(sum(col("n")).as("cr"),
        sum(when(col("__tg"), col("n")).otherwise(0L)).as("ct"))
    val tots = byB.agg(sum(col("cr")).as("__nr"), sum(col("ct")).as("__nt"))
    val ratios = byB.crossJoin(broadcast(tots))
      .withColumn("__pt", expr(
        s"greatest(($unit * (ct + 1)) div (__nt + $buckets), 1L)"))
      .withColumn("__pr", expr(
        s"greatest(($unit * (cr + 1)) div (__nr + $buckets), 1L)"))
      .select(col("b"), (lg(col("__pt")) - lg(col("__pr"))).as("__dl"))
    val scored = db.join(broadcast(ratios), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_grams"),
        sum(col("n") * col("__dl")).as("logw_micro"))
    val lgU = graft.functions.ExactMicroOps.log2Micro(unit)
    val keyed = docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("logw_micro", coalesce(col("logw_micro"), lit(0L)))
      .withColumn("__u", Dedup.hashStr(col("id").cast("string"), seed + 1)
        % unit + 1L)
      .withColumn("__e",
        greatest(lit(lgU) - lg(col("__u")), lit(1L)))
      .withColumn("gumbel_micro",
        col("logw_micro") + lit(lgU) - lg(col("__e")))
      .localCheckpoint(false) // feeds the top-k cut AND the back-join
    val kept = keyed
      .orderBy(col("gumbel_micro").desc, col("id"))
      .limit(budget)
      .select(col("id"), lit(true).as("keep"))
    keyed.join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"), col("logw_micro"),
        col("gumbel_micro"), coalesce(col("keep"), lit(false)).as("keep"))
  }

  /** The (doc, target-flag, bucket, count) relation every DSIR stage
    * derives from: normalized unigrams+bigrams md5-hashed mod
    * `buckets`, ONE combine-agg, checkpointed (the
    * [[graft.ops.TextAnalysis]] bigramLmScore posture). */
  private def dsirBuckets(docs: DataFrame, isTarget: Column, buckets: Int,
      seed: Int, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
        isTarget.cast("boolean").as("__tg"),
        filter(split(Dedup.normalize(col(textCol)), " "),
          w => w =!= "").as("__w"))
    val uni = base.select(col("id"), col("__tg"),
      explode(col("__w")).as("tok"))
    val big = base.filter(size(col("__w")) >= 2)
      .select(col("id"), col("__tg"), explode(expr(
        """transform(sequence(0, size(__w) - 2),
          |  i -> concat_ws(' ', element_at(__w, i + 1),
          |                 element_at(__w, i + 2)))""".stripMargin))
        .as("tok"))
    uni.unionByName(big)
      .select(col("id"), col("__tg"),
        (Dedup.hashStr(col("tok"), seed) % buckets).as("b"))
      .groupBy(col("id"), col("__tg"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
  }

  /** DSIR distribution-shift evaluation (Xie et al. 2023 §4's own
    * metric): did the resampled subset actually MOVE toward the
    * target? One row of KL divergences over the hashed-n-gram bucket
    * space, in micro bits,
    *
    *   KL(t ‖ q) = Σ_b p_t(b) · (log₂ p_t(b) − log₂ p_q(b)) / 10⁶
    *
    * with every fraction Laplace-smoothed, floored to micro, ≥1-clamped
    * (the [[dsirSelect]] quantization contract) over the shared
    * observed-bucket set, per-population totals, and ONE final
    * sign-split division per KL (per-term floors would compound).
    *
    * THE BASELINE MATTERS: a `budget`-doc subset pays a small-sample
    * Laplace-smoothing penalty that the full raw corpus does not, so
    * comparing against kl_raw alone misreads smoothing noise as
    * selection failure (measured on the gate corpus: selected 5261 vs
    * raw 3819 — yet a SIZE-MATCHED random sample reads 7634). The
    * honest control is the same-budget content-hash random draw
    * (seed+2): improvement_micro = kl_random − kl_selected isolates
    * the importance-weighting effect at equal sample size; positive =
    * the resampling moved the subset toward the target.
    *
    * Scale shape: reuses [[dsirSelect]]'s keep set and the shared
    * (doc, bucket) materialization; both subset selections are
    * TakeOrderedAndProject; histograms are sums over that relation;
    * everything after is B-row arithmetic with one-row broadcast
    * totals. */
  def dsirShiftEval(docs: DataFrame, isTarget: Column, budget: Int,
      buckets: Int = 256, seed: Int = 29, idCol: String = "doc_id",
      textCol: String = "text", unit: Long = 1000000L): DataFrame = {
    val lg = graft.functions.VectorFunctions.log2_micro _
    // ONE shared (doc, bucket) materialization (it is checkpointed in
    // [[dsirBuckets]]): the selection pass and the histogram pass below
    // both read it — ADVICE r15 caught the doc claiming this while the
    // code rebuilt the gram explode + combine-agg per pass
    val db = dsirBuckets(docs, isTarget, buckets, seed, idCol, textCol)
    val keep = dsirSelect(docs, isTarget, budget, buckets, seed, idCol,
        textCol, unit, bucketsOpt = Some(db))
      .filter(col("keep")).select(col(idCol).as("id"))
    val rand = docs.select(col(idCol).as("id"),
        Dedup.hashStr(col(idCol).cast("string"), seed + 2).as("__h"))
      .orderBy(col("__h"), col("id")).limit(budget).select(col("id"))
    val byB = db
      .join(keep.select(col("id"), lit(true).as("__kp")), Seq("id"), "left")
      .join(rand.select(col("id"), lit(true).as("__rd")), Seq("id"), "left")
      .groupBy(col("b"))
      .agg(sum(col("n")).as("cr"),
        sum(when(col("__tg"), col("n")).otherwise(0L)).as("ct"),
        sum(when(col("__kp"), col("n")).otherwise(0L)).as("cs"),
        sum(when(col("__rd"), col("n")).otherwise(0L)).as("cb"))
      .localCheckpoint(false) // B rows; totals + terms
    val tots = byB.agg(sum(col("cr")).as("__nr"), sum(col("ct")).as("__nt"),
      sum(col("cs")).as("__ns"), sum(col("cb")).as("__nb"))
    def frac(c: String, n: String) =
      expr(s"greatest(($unit * ($c + 1)) div ($n + $buckets), 1L)")
    val terms = byB.crossJoin(broadcast(tots))
      .withColumn("__pt", frac("ct", "__nt"))
      .withColumn("__pr", frac("cr", "__nr"))
      .withColumn("__ps", frac("cs", "__ns"))
      .withColumn("__pb", frac("cb", "__nb"))
      .select(col("__pt"),
        (col("__pt") * (lg(col("__pt")) - lg(col("__pr")))).as("__tr"),
        (col("__pt") * (lg(col("__pt")) - lg(col("__ps")))).as("__ts"),
        (col("__pt") * (lg(col("__pt")) - lg(col("__pb")))).as("__tb"))
    def ss(c: String) =
      s"""CAST(CASE WHEN $c >= 0 THEN $c div $unit
         |  ELSE -((-$c) div $unit) END AS BIGINT)""".stripMargin
    terms.agg(sum(col("__tr")).as("__sr"), sum(col("__ts")).as("__ss2"),
        sum(col("__tb")).as("__sb"), count(lit(1)).as("n_buckets"))
      .select(col("n_buckets"),
        expr(ss("__sr")).as("kl_raw_micro"),
        expr(ss("__sb")).as("kl_random_micro"),
        expr(ss("__ss2")).as("kl_selected_micro"))
      .withColumn("improvement_micro",
        col("kl_random_micro") - col("kl_selected_micro"))
  }

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions (Lin 1991; Kilgarriff 2001's corpus-comparison
    * posture) — the mix family's "how different are my sources
    * REALLY" readout: two sources with near-zero JSD are redundant
    * mixture components (their mix weights trade off freely); a
    * source far from every other carries signal no reweighting of the
    * rest recovers. Distributions live in the same hashed-unigram
    * bucket space as DSIR ([[dsirSelect]]), Laplace-smoothed the same
    * way, so the numbers are directly comparable with
    * `mix_dsir_eval`'s KL column.
    *
    * JSD(p, q) = ½·KL(p ‖ m) + ½·KL(q ‖ m), m = (p+q)/2, computed
    * per bucket as p·(lg 2p − lg(p+q)) + q·(lg 2q − lg(p+q)) over
    * micro probabilities — each bucket's term is ≥ 0 in exact reals
    * (log-sum inequality), the floored-lg sum is divided
    * magnitude-then-sign by 2·unit. Bounded: 0 ≤ JSD ≤ 1 bit
    * (10⁶ micro) for any pair. Envelope: |term| ≤ 2·unit·lg-range
    * ≈ 2·10⁶·2·10⁶ per bucket, × buckets ≤ 2²⁰ ≈ 8.4·10¹⁸ — at the
    * Long edge, so the per-pair sum is carried in DECIMAL(38,0).
    *
    * Scale shape: ONE combine-agg over the corpus to (source, bucket)
    * counts; everything after — the dense source×bucket grid (zero
    * buckets still carry Laplace mass), the bucket-keyed pair join,
    * the per-pair sum — is source×bucket-bounded (sources are a
    * handful; B ≤ 2²⁰). Output is the upper triangle, one row per
    * source pair. */
  def sourceJsdMatrix(docs: DataFrame, buckets: Int = 256,
      seed: Int = 31, sourceCol: String = "source",
      textCol: String = "text", unit: Long = 1000000L): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), "buckets in [2, 2^20]")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val dec = "DECIMAL(38,0)"
    val cnt = docs
      .select(col(sourceCol).as("src"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("src"), (Dedup.hashStr(col("w"), seed) % buckets).as("b"))
      .groupBy(col("src"), col("b")).agg(count(lit(1)).as("c"))
    val tots = cnt.groupBy(col("src")).agg(sum(col("c")).as("n"))
    // dense grid: every (source, bucket) cell, zero counts included
    val ps = tots
      .select(col("src"), col("n"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
      .join(cnt, Seq("src", "b"), "left")
      .select(col("src"), col("b"), col("n"),
        expr(s"greatest(($unit * (coalesce(c, 0L) + 1)) div (n + $buckets), 1L)")
          .as("p"))
      .localCheckpoint(false) // S×B rows; both sides of the pair join
    ps.select(col("src").as("src_a"), col("b"), col("n").as("n_tokens_a"),
        col("p").as("__pa"))
      .join(ps.select(col("src").as("src_b"), col("b"),
        col("n").as("n_tokens_b"), col("p").as("__pb")), Seq("b"))
      .filter(col("src_a") < col("src_b"))
      .withColumn("__t", expr(s"CAST(__pa AS $dec)") *
        (lg(col("__pa") * 2L) - lg(col("__pa") + col("__pb"))) +
        expr(s"CAST(__pb AS $dec)") *
        (lg(col("__pb") * 2L) - lg(col("__pa") + col("__pb"))))
      .groupBy(col("src_a"), col("src_b"))
      .agg(first(col("n_tokens_a")).as("n_tokens_a"),
        first(col("n_tokens_b")).as("n_tokens_b"),
        sum(col("__t")).as("__s"))
      .withColumn("jsd_micro", expr(
        s"""CAST(CASE WHEN __s >= 0 THEN __s div (2 * $unit)
           |  ELSE -((-__s) div (2 * $unit)) END AS BIGINT)""".stripMargin))
      .drop("__s")
  }
}
