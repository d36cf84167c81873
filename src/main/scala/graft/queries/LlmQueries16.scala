package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.T

/** Round-15 registry: the ExactSubstr family (spans / decontamination /
  * per-source profile / removal — the suffix-array-exact method the
  * dedup family lacked, VERDICT r14 missing-item 2), DSIR importance
  * resampling + its shift evaluation (missing-item 4), and the
  * Good–Turing pair (raw spectrum + Simple Good–Turing fit) with
  * Church–Gale burstiness.
  */
object LlmQueries16 {

  private def normSql(c: String) =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  private def hashSql(seed: Int, e: String) =
    s"CAST('0x' || substring(md5('$seed|' || $e), 1, 15) AS BIGINT)"

  /** Exact duplicated-substring spans (Lee et al. ACL 2022,
    * [[graft.ops.Dedup.exactSubstringSpans]]): every maximal character
    * region covered by 30-char windows that repeat anywhere in the
    * corpus — the exact-substring companion to the MinHash/SimHash
    * near-dup family (it finds the literal boilerplate the
    * fuzzy methods only score). L = 30 on this corpus yields both
    * whole-document dups and partial boilerplate spans. */
  def dedupExactSubstring(spark: SparkSession, dir: String): DataFrame =
    SharedRels.exactSubstrSpans30(spark, dir)
      .orderBy(col("doc_id"), col("span_start"))

  /** DSIR data selection (Xie et al. NeurIPS 2023,
    * [[graft.ops.Curation.dsirSelect]]): hashed unigram+bigram
    * importance weights of the raw corpus against the lang = 'en'
    * target slice, Gumbel-top-200 resampling — the paper's actual
    * RESAMPLING step (sampling without replacement ∝ w), completing
    * the family next to `curation_dsir_select`'s deterministic
    * top-ratio cut (unigram features, rank selection): resampling
    * preserves target-distribution DIVERSITY where a hard top-k
    * overselects the mode. */
  def mixDsirWeights(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Curation.dsirSelect(
        T.par(spark, T.t(spark, dir, "documents")),
        isTarget = col("lang") === "en", budget = 200,
        buckets = 256, seed = 29)
      .orderBy(col("doc_id"))

  /** Exact-substring DECONTAMINATION
    * ([[graft.ops.Dedup.exactSubstringContamination]]): the doc_id < 50
    * slice as the "benchmark", the rest of the corpus as training data
    * — per eval doc, the exact 30-char-window coverage fraction (the
    * Carlini/Lee memorization probe). Completes the decon family's
    * fidelity ladder: bloom gate → n-gram Jaccard/containment → EXACT
    * substring. */
  def deconExactSubstring(spark: SparkSession, dir: String): DataFrame = {
    // parCpu: md5-per-character-window (windowHashes) — bytes are the
    // wrong cost proxy (r17 measured: width-1 ran 6.1 s vs 2.0 s full)
    val docs = T.parCpu(spark, T.t(spark, dir, "documents"))
    graft.ops.Dedup.exactSubstringContamination(
        docs.filter(col("doc_id") < 50), docs.filter(col("doc_id") >= 50),
        minLen = 30)
      .orderBy(col("doc_id"))
  }

  /** `decon_exact_substring` under the BLOOM-GATED plan — the 100 TB
    * exchange strategy (train windows dropped map-side against a
    * driver bloom of the eval windows, below the shuffle): identical
    * rows by construction (the exact hash equi-join scrubs bloom false
    * positives), so the oracle is shared verbatim — the
    * `sim_ivf_shuffled_topk` differential-twin discipline, here
    * pinning that the map-side-reduction plan is value-neutral. */
  def deconExactSubstringBloom(spark: SparkSession, dir: String): DataFrame = {
    // parCpu: same windowHashes kernel as the plain twin
    val docs = T.parCpu(spark, T.t(spark, dir, "documents"))
    graft.ops.Dedup.exactSubstringContamination(
        docs.filter(col("doc_id") < 50), docs.filter(col("doc_id") >= 50),
        minLen = 30, bloomGate = true)
      .orderBy(col("doc_id"))
  }

  /** Corpus duplication profile by source (the Lee et al. ACL 2022
    * Table-1 readout): per source, documents, total characters, and the
    * fraction covered by exact duplicated substrings ≥ 30 chars —
    * [[graft.ops.Dedup.exactSubstringSpans]] rolled up against the full
    * per-source character volume (docs shorter than L count in the
    * denominator; they simply contribute no windows). */
  def dedupSubstringProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = T.par(spark, T.t(spark, dir, "documents"))
    val spans = SharedRels.exactSubstrSpans30(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("__cov"))
    docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("__len"))
      .join(spans, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("total_chars"),
        sum(coalesce(col("__cov"), lit(0L))).as("covered_chars"))
      .withColumn("coverage_micro",
        expr("(1000000 * covered_chars) div greatest(total_chars, 1L)"))
      .orderBy(col("source"))
  }

  /** Exact duplicated-substring REMOVAL
    * ([[graft.ops.Dedup.removeDuplicateSubstrings]]): the ExactSubstr
    * pipeline's end product — every character covered by a duplicated
    * ≥30-char window dropped, survivors stitched in order; the result
    * hashes the full reassembled text of every document. */
  def dedupSubstringRemoval(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.removeDuplicateSubstrings(
        T.par(spark, T.t(spark, dir, "documents")), minLen = 30,
        spansOpt = Some(SharedRels.exactSubstrSpans30(spark, dir)))
      .orderBy(col("doc_id"))

  /** Good–Turing frequency spectrum (Good 1953,
    * [[graft.ops.TextAnalysis.goodTuringSpectrum]]): N_f, the raw
    * Turing-adjusted counts f*, and the unseen-probability mass N₁/N —
    * the open-vocabulary smoothing input the LM family
    * (`text_lm_bigram`/`text_lm_kneser_ney`) assumes. */
  def textGoodTuring(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.goodTuringSpectrum(
      T.par(spark, T.t(spark, dir, "documents")))

  /** Church–Gale word burstiness
    * ([[graft.ops.TextAnalysis.wordBurstiness]]): top-100 burstiest
    * words with df ≥ 3 — cf/df in exact micro, the content-word
    * signal pure frequency misses. */
  def textBurstiness(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.wordBurstiness(
      T.par(spark, T.t(spark, dir, "documents")))

  /** Simple Good–Turing smoothing fit (Gale & Sampson 1995,
    * [[graft.ops.TextAnalysis.sgtFit]]): Z-transformed spectrum,
    * exact milli-log power-law fit, and the fitted smoothed counts
    * f*_SGT = (f+1)·2^(b·Δlog₂f) — the companion that fills
    * `text_good_turing`'s raw-estimator gaps (every f with N_{f+1}=0). */
  def textSgtFit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.sgtFit(T.par(spark, T.t(spark, dir, "documents")))

  /** DSIR shift evaluation ([[graft.ops.Curation.dsirShiftEval]], the
    * paper's §4 metric): KL(target ‖ raw) vs KL(target ‖ selected)
    * over the hashed-n-gram bucket space for the `mix_dsir_weights`
    * selection — one row whose improvement_micro > 0 is the evidence
    * the resampling moved the corpus toward the target. */
  def mixDsirEval(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Curation.dsirShiftEval(
      T.par(spark, T.t(spark, dir, "documents")),
      isTarget = col("lang") === "en", budget = 200,
      buckets = 256, seed = 29)

  /** Dirichlet query-likelihood retrieval (Zhai & Lafferty SIGIR 2001,
    * [[graft.ops.TextAnalysis.dirichletQlMultiQuery]]) over the SAME
    * query catalog as `text_bm25_multiquery` — the language-modeling
    * scorer completing the sparse-retrieval family (BM25 / TF-IDF /
    * dense hash / RRF hybrid), μ = 100, top-10 per query. */
  def textDirichletQl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = LlmQueries3.Bm25Queries.toDF("query_id", "terms")
    graft.ops.TextAnalysis.dirichletQlMultiQuery(
        T.par(spark, T.t(spark, dir, "documents")), qs, k = 10, mu = 100L)
      .orderBy(col("query_id"), col("rk"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 / the TREC
    * RM3 interpolation, [[graft.ops.TextAnalysis.rm3ExpansionTerms]]):
    * top-10 expansion terms per query from the Dirichlet-QL top-5
    * feedback docs, λ = 0.5 — the expanded-query definition a second
    * retrieval round consumes, completing the LM-IR story
    * (`text_dirichlet_ql` retrieves → this expands). */
  def textRm3Expansion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = LlmQueries3.Bm25Queries.toDF("query_id", "terms")
    graft.ops.TextAnalysis.rm3ExpansionTerms(
        T.par(spark, T.t(spark, dir, "documents")), qs,
        kDocs = 5, mTerms = 10, mu = 100L, lambdaMicro = 500000L)
      .orderBy(col("query_id"), col("rk"))
  }

  /** The RM3 loop's SECOND retrieval round
    * ([[graft.ops.TextAnalysis.rm3Retrieve]]): the corpus re-scored
    * with the expanded weighted query — Dirichlet QL with the integer
    * term counts generalized to the RM3 micro weights. Completes the
    * full pseudo-relevance-feedback pipeline under the gate:
    * retrieve (`text_dirichlet_ql`) → expand (`text_rm3_expansion`) →
    * retrieve again (this). */
  def textRm3Retrieve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = LlmQueries3.Bm25Queries.toDF("query_id", "terms")
    graft.ops.TextAnalysis.rm3Retrieve(
        T.par(spark, T.t(spark, dir, "documents")), qs,
        kDocs = 5, mTerms = 10, kFinal = 10, mu = 100L,
        lambdaMicro = 500000L)
      .orderBy(col("query_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rm3_retrieve" -> (textRm3Retrieve _),
    "text_rm3_expansion" -> (textRm3Expansion _),
    "text_dirichlet_ql" -> (textDirichletQl _),
    "text_sgt_fit" -> (textSgtFit _),
    "mix_dsir_eval" -> (mixDsirEval _),
    "dedup_exact_substring" -> (dedupExactSubstring _),
    "decon_exact_substring" -> (deconExactSubstring _),
    "decon_exact_substring_bloom" -> (deconExactSubstringBloom _),
    "dedup_substring_profile" -> (dedupSubstringProfile _),
    "dedup_substring_removal" -> (dedupSubstringRemoval _),
    "text_good_turing" -> (textGoodTuring _),
    "text_burstiness" -> (textBurstiness _),
    "mix_dsir_weights" -> (mixDsirWeights _)
  )

  /** Per-position L-char window hash CTE via unnest(range(...))
    * (DuckDB 1.0.0 range/generate_series reject lateral column bounds;
    * the scalar-range-then-unnest form does not). */
  private def windowCte(name: String, L: Int, pred: String): String =
    s"""$name AS (SELECT doc_id, CAST(s AS BIGINT) AS s,
       |    md5(substr(text, CAST(s AS INTEGER), $L)) AS g
       |  FROM (SELECT doc_id, text,
       |      unnest(range(1, length(text) - $L + 2)) AS s
       |    FROM documents WHERE length(text) >= $L AND ($pred)))"""
      .stripMargin

  /** Interval-merge CTEs over a `hits(doc_id, s)` relation → a
    * `spans` relation (doc_id, span_start, span_end, span_len,
    * n_windows) — the lag-gap flag + running run id + per-run agg. */
  private[queries] def mergeCtes(L: Int): String =
    s"""flagged AS (SELECT doc_id, s,
       |    CASE WHEN lag(s) OVER w IS NULL
       |           OR s > lag(s) OVER w + $L THEN 1 ELSE 0 END AS nf
       |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY s)),
       |runs AS (SELECT doc_id, s,
       |    sum(nf) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM flagged),
       |spans AS (SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       |    CAST(max(s) + $L - 1 AS BIGINT) AS span_end,
       |    CAST(max(s) - min(s) + $L AS BIGINT) AS span_len,
       |    CAST(count(*) AS BIGINT) AS n_windows
       |  FROM runs GROUP BY doc_id, run)""".stripMargin

  /** ExactSubstr replay: window hashes, duplicated windows by global
    * count, per-doc interval merge. */
  private def exactSubstringOracle(L: Int): String =
    s"""WITH ${windowCte("pos", L, "TRUE")},
       |dups AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
       |hits AS (SELECT doc_id, s FROM pos JOIN dups USING (g)),
       |${mergeCtes(L)}
       |SELECT doc_id, span_start, span_end, span_len, n_windows
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  /** Exact-substring decon replay: eval windows hit iff their hash
    * occurs among the train slice's distinct window hashes; merged
    * spans rolled up per eval doc, zero-coverage docs back-joined. */
  private[queries] def deconExactSubstringOracle(L: Int, cut: Long): String =
    s"""WITH ${windowCte("ew", L, s"doc_id < $cut")},
       |tw AS (SELECT DISTINCT g FROM (
       |  SELECT md5(substr(text, CAST(s AS INTEGER), $L)) AS g
       |  FROM (SELECT text, unnest(range(1, length(text) - $L + 2)) AS s
       |    FROM documents WHERE length(text) >= $L AND doc_id >= $cut))),
       |hits AS (SELECT doc_id, s FROM ew
       |  WHERE g IN (SELECT g FROM tw)),
       |${mergeCtes(L)},
       |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(sum(span_len) AS BIGINT) AS covered FROM spans
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_spans, 0) AS n_spans,
       |  coalesce(p.covered, 0) AS covered_chars,
       |  CAST(length(d.text) AS BIGINT) AS n_chars,
       |  (1000000 * coalesce(p.covered, 0))
       |    // greatest(length(d.text), 1) AS coverage_micro
       |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
       |WHERE d.doc_id < $cut ORDER BY d.doc_id""".stripMargin

  /** Per-source duplication profile replay: the exact-substring spans
    * rolled up against total per-source character volume. */
  private def substringProfileOracle(L: Int): String =
    s"""WITH ${windowCte("pos", L, "TRUE")},
       |dups AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
       |hits AS (SELECT doc_id, s FROM pos JOIN dups USING (g)),
       |${mergeCtes(L)},
       |perdoc AS (SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS cov
       |  FROM spans GROUP BY doc_id)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
       |  CAST(sum(coalesce(p.cov, 0)) AS BIGINT) AS covered_chars,
       |  (1000000 * CAST(sum(coalesce(p.cov, 0)) AS BIGINT))
       |    // greatest(CAST(sum(length(d.text)) AS BIGINT), 1)
       |    AS coverage_micro
       |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** DSIR replay: normalized unigrams+bigrams hashed mod 256, one
    * (doc, bucket) count relation, Laplace micro fractions for the
    * target ('en') and raw models, the shared fixed-point log2 chain
    * (twice — the Gumbel key needs −log₂(−log₂ u), so the second round
    * runs under the g-prefixed CTE names), Gumbel-top-200 keep set. */
  private def dsirOracle(buckets: Int, budget: Int, seed: Int,
      unit: Long): String =
    s"""WITH ${dsirChainCtes(buckets, seed, unit)}
       |SELECT k.doc_id, k.n_grams, k.logw_micro, k.gumbel_micro,
       |  rk.rnk <= $budget AS keep
       |FROM keyed k JOIN rk ON rk.doc_id = k.doc_id
       |ORDER BY k.doc_id""".stripMargin

  /** The shared DSIR chain (words -> models -> log-weights -> Gumbel
    * keys -> global rank), ending at `rk`; terminals select against
    * `keyed`/`rk` (the keep gate) or extend with the selected-set
    * histograms (the shift eval). */
  private def dsirChainCtes(buckets: Int, seed: Int,
      unit: Long): String = {
    val lgU = graft.functions.ExactMicroOps.log2Micro(unit)
    s"""words AS (SELECT doc_id, lang,
       |    list_filter(string_split(${normSql("text")}, ' '),
       |      x -> x <> '') AS w
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, lang, unnest(w) AS tok FROM words
       |  UNION ALL
       |  SELECT doc_id, lang,
       |    w[CAST(i AS INTEGER)] || ' ' || w[CAST(i + 1 AS INTEGER)] AS tok
       |  FROM (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i
       |        FROM words WHERE len(w) >= 2)),
       |db AS (SELECT doc_id, lang,
       |    ${hashSql(seed, "tok")} % $buckets AS b,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM toks GROUP BY 1, 2, 3),
       |byb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cr,
       |    CAST(coalesce(sum(CASE WHEN lang = 'en' THEN n END), 0)
       |      AS BIGINT) AS ct
       |  FROM db GROUP BY b),
       |tots AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
       |    CAST(sum(ct) AS BIGINT) AS nt FROM byb),
       |pq AS (SELECT b,
       |    greatest(($unit * (ct + 1)) // (nt + $buckets), 1) AS pt,
       |    greatest(($unit * (cr + 1)) // (nr + $buckets), 1) AS pr
       |  FROM byb CROSS JOIN tots),
       |draws AS (SELECT doc_id,
       |    ${hashSql(seed + 1, "CAST(doc_id AS VARCHAR)")} % $unit + 1 AS u
       |  FROM documents),
       |vals AS (SELECT pt AS v FROM pq UNION SELECT pr FROM pq
       |  UNION SELECT u FROM draws),
       |${LlmQueries14.log2ValueCtes},
       |dl AS (SELECT pq.b, lt.l - lr.l AS dl
       |  FROM pq JOIN lg lt ON lt.v = pq.pt JOIN lg lr ON lr.v = pq.pr),
       |sc AS (SELECT db.doc_id, CAST(sum(db.n) AS BIGINT) AS n_grams,
       |    CAST(sum(db.n * dl.dl) AS BIGINT) AS logw_micro
       |  FROM db JOIN dl ON dl.b = db.b GROUP BY db.doc_id),
       |ed AS (SELECT d.doc_id,
       |    coalesce(sc.n_grams, 0) AS n_grams,
       |    coalesce(sc.logw_micro, 0) AS logw_micro,
       |    greatest(${lgU} - lu.l, 1) AS e
       |  FROM documents d
       |  JOIN draws ON draws.doc_id = d.doc_id
       |  JOIN lg lu ON lu.v = draws.u
       |  LEFT JOIN sc ON sc.doc_id = d.doc_id),
       |gvals AS (SELECT DISTINCT e AS v FROM ed),
       |${LlmQueries14.log2ValueCtesP("g")},
       |keyed AS (SELECT ed.doc_id, ed.n_grams, ed.logw_micro,
       |    ed.logw_micro + ${lgU} - glg.l AS gumbel_micro
       |  FROM ed JOIN glg ON glg.v = ed.e),
       |rk AS (SELECT doc_id, row_number() OVER (
       |    ORDER BY gumbel_micro DESC, doc_id) AS rnk FROM keyed)"""
      .stripMargin
  }

  /** Removal replay: the span CTEs, kept segments via the lag window
    * (head/mid gaps) plus the per-doc tail segment, ordered string_agg
    * reassembly, pass-through for span-free docs. */
  private def substringRemovalOracle(L: Int): String =
    s"""WITH ${windowCte("pos", L, "TRUE")},
       |dups AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
       |hits AS (SELECT doc_id, s FROM pos JOIN dups USING (g)),
       |${mergeCtes(L)},
       |mids AS (SELECT doc_id,
       |    coalesce(lag(span_end) OVER (PARTITION BY doc_id
       |      ORDER BY span_start), 0) + 1 AS gs,
       |    span_start - 1 AS ge
       |  FROM spans),
       |tails AS (SELECT doc_id, max(span_end) AS last_e,
       |    CAST(sum(span_len) AS BIGINT) AS removed
       |  FROM spans GROUP BY doc_id),
       |segs AS (SELECT doc_id, gs, ge FROM mids WHERE ge >= gs
       |  UNION ALL
       |  SELECT t.doc_id, t.last_e + 1, CAST(length(d.text) AS BIGINT)
       |  FROM tails t JOIN documents d USING (doc_id)
       |  WHERE length(d.text) >= t.last_e + 1),
       |kept AS (SELECT s.doc_id,
       |    string_agg(substr(d.text, CAST(s.gs AS INTEGER),
       |      CAST(s.ge - s.gs + 1 AS INTEGER)), '' ORDER BY s.gs) AS kt
       |  FROM segs s JOIN documents d USING (doc_id) GROUP BY s.doc_id)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |  coalesce(t.removed, 0) AS removed_chars,
       |  CAST(length(d.text) - coalesce(t.removed, 0) AS BIGINT)
       |    AS kept_chars,
       |  CASE WHEN t.doc_id IS NULL THEN d.text
       |       ELSE coalesce(k.kt, '') END AS kept_text
       |FROM documents d
       |LEFT JOIN tails t USING (doc_id)
       |LEFT JOIN kept k USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  private def goodTuringOracle(unit: Long): String =
    s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(${normSql("text")}, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |spec AS (SELECT f, CAST(count(*) AS BIGINT) AS n_f
       |  FROM wc GROUP BY f),
       |tot AS (SELECT CAST(sum(f * n_f) AS BIGINT) AS n,
       |    CAST(coalesce(sum(CASE WHEN f = 1 THEN n_f END), 0) AS BIGINT)
       |      AS n1
       |  FROM spec)
       |SELECT s.f, s.n_f,
       |  CAST(((s.f + 1) * $unit * coalesce(s2.n_f, 0)) // s.n_f
       |    AS BIGINT) AS f_star_micro,
       |  CAST(($unit * t.n1) // t.n AS BIGINT) AS p0_micro,
       |  t.n AS n_tokens
       |FROM spec s LEFT JOIN spec s2 ON s2.f = s.f + 1 CROSS JOIN tot t
       |ORDER BY s.f""".stripMargin

  private def burstinessOracle(minDf: Long, topK: Int, unit: Long): String =
    s"""WITH wd AS (SELECT w, doc_id, count(*) AS c
       |  FROM (SELECT doc_id,
       |      unnest(string_split(${normSql("text")}, ' ')) AS w
       |    FROM documents)
       |  WHERE w <> '' GROUP BY w, doc_id),
       |agg AS (SELECT w, CAST(sum(c) AS BIGINT) AS cf,
       |    CAST(count(*) AS BIGINT) AS df
       |  FROM wd GROUP BY w)
       |SELECT w, cf, df,
       |  CAST(($unit * cf) // df AS BIGINT) AS burstiness_micro
       |FROM agg WHERE df >= $minDf
       |ORDER BY burstiness_micro DESC, w LIMIT $topK""".stripMargin

  /** SGT replay: the spectrum, lag/lead Z-transform (the oracle MAY
    * use global windows — the spectrum is tiny and DuckDB has no task
    * model), the shared log2 chain over {f, f+1, z}, the HUGEINT
    * closed-form fit, then exp2Micro's (q, fraction) decomposition and
    * product chain (the sigmoidCtes discipline) for the smoothed
    * counts. */
  private def sgtOracle(unit: Long): String =
    s"""WITH RECURSIVE ${LlmQueries14.exp2ConstsCtes},
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(${normSql("text")}, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |spec AS (SELECT f, CAST(count(*) AS BIGINT) AS n_f
       |  FROM wc GROUP BY f),
       |nbr AS (SELECT f, n_f,
       |    coalesce(lag(f) OVER (ORDER BY f), 0) AS q0,
       |    coalesce(lead(f) OVER (ORDER BY f),
       |      2 * f - coalesce(lag(f) OVER (ORDER BY f), 0)) AS t0
       |  FROM spec),
       |zr AS (SELECT f, n_f,
       |    greatest((2 * n_f * $unit) // (t0 - q0), 1) AS z_micro
       |  FROM nbr),
       |vals AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT f AS v FROM zr UNION ALL SELECT f + 1 FROM zr
       |  UNION ALL SELECT z_micro FROM zr)),
       |${LlmQueries14.log2ValueCtes},
       |cap AS (SELECT f FROM zr ORDER BY f LIMIT 1024),
       |xy AS (SELECT lx.l // 1000 AS x, lz.l // 1000 AS y
       |  FROM zr JOIN cap ON cap.f = zr.f
       |  JOIN lg lx ON lx.v = zr.f
       |  JOIN lg lz ON lz.v = zr.z_micro),
       |fs AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(x * x) AS HUGEINT) AS sxx,
       |    CAST(sum(y * y) AS HUGEINT) AS syy,
       |    CAST(sum(x * y) AS HUGEINT) AS sxy FROM xy),
       |fd AS (SELECT n, sx, sy, n * sxy - sx * sy AS num,
       |    n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy FROM fs),
       |fit AS (SELECT CAST(n AS BIGINT) AS n_freqs,
       |    CAST(CASE WHEN dx = 0 THEN 0
       |         WHEN num >= 0 THEN (num * 1000000) // dx
       |         ELSE -((-num * 1000000) // dx) END AS BIGINT)
       |      AS slope_micro,
       |    CAST(CASE WHEN dx = 0 THEN 0
       |         WHEN sy * dx - num * sx >= 0
       |         THEN (sy * dx - num * sx) // (n * dx)
       |         ELSE -((-(sy * dx - num * sx)) // (n * dx))
       |    END AS BIGINT) AS intercept_milli,
       |    CAST(CASE WHEN dx = 0 OR dy = 0 THEN 0
       |         ELSE (num * num * 1000000) // (dx * dy)
       |    END AS BIGINT) AS r2_micro
       |  FROM fd),
       |sm AS (SELECT zr.f, zr.n_f, zr.z_micro,
       |    greatest(least(CAST(CAST(fit.slope_micro AS HUGEINT)
       |        * (l1.l - l0.l) // $unit AS BIGINT), 0),
       |      ${-64L * unit}) AS be,
       |    fit.n_freqs, fit.slope_micro, fit.intercept_milli,
       |    fit.r2_micro
       |  FROM zr CROSS JOIN fit
       |  JOIN lg l0 ON l0.v = zr.f JOIN lg l1 ON l1.v = zr.f + 1),
       |ex AS (SELECT sm.*,
       |    (xs // 1000000) - 64 AS eq,
       |    ((xs % 1000000) * 1048576) // 1000000 AS fr
       |  FROM (SELECT *, be + 64000000 AS xs FROM sm) sm),
       |e2 AS (SELECT ex.*,
       |    CAST((acc * 1000000) //
       |      (CAST(1 AS HUGEINT) << CAST(32 - eq AS INTEGER))
       |      AS BIGINT) AS e2v
       |  FROM (SELECT ex.*, ${LlmQueries14.exp2AccExpr("fr")} AS acc
       |    FROM ex CROSS JOIN cl) ex)
       |SELECT f, n_f, z_micro,
       |  CAST((f + 1) * e2v AS BIGINT) AS sgt_star_micro,
       |  n_freqs, slope_micro, intercept_milli, r2_micro
       |FROM e2 ORDER BY f""".stripMargin

  /** DSIR shift-eval replay: the shared chain, the selected set
    * (rnk ≤ budget), per-bucket selected counts, the third Laplace
    * model, one MORE prefixed log2 round for the selected fractions
    * (pt/pr already ride the first chain's `lg`), the two KL sums
    * with a single sign-split division each. */
  private def dsirEvalOracle(buckets: Int, budget: Int, seed: Int,
      unit: Long): String =
    s"""WITH ${dsirChainCtes(buckets, seed, unit)},
       |sel AS (SELECT doc_id FROM rk WHERE rnk <= $budget),
       |bsel AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
       |    ORDER BY ${hashSql(seed + 2, "CAST(doc_id AS VARCHAR)")},
       |      doc_id) AS rr FROM documents) WHERE rr <= $budget),
       |csel AS (SELECT db.b, CAST(sum(db.n) AS BIGINT) AS cs
       |  FROM db JOIN sel ON sel.doc_id = db.doc_id GROUP BY db.b),
       |cbas AS (SELECT db.b, CAST(sum(db.n) AS BIGINT) AS cb
       |  FROM db JOIN bsel ON bsel.doc_id = db.doc_id GROUP BY db.b),
       |byb2 AS (SELECT byb.b, coalesce(csel.cs, 0) AS cs,
       |    coalesce(cbas.cb, 0) AS cb
       |  FROM byb LEFT JOIN csel ON csel.b = byb.b
       |  LEFT JOIN cbas ON cbas.b = byb.b),
       |tot2 AS (SELECT CAST(sum(cs) AS BIGINT) AS ns,
       |    CAST(sum(cb) AS BIGINT) AS nb FROM byb2),
       |pq2 AS (SELECT b,
       |    greatest(($unit * (cs + 1)) // (ns + $buckets), 1) AS ps,
       |    greatest(($unit * (cb + 1)) // (nb + $buckets), 1) AS pb
       |  FROM byb2 CROSS JOIN tot2),
       |kvals AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT ps AS v FROM pq2 UNION ALL SELECT pb FROM pq2)),
       |${LlmQueries14.log2ValueCtesP("k")},
       |kterms AS (SELECT pq.b, pq.pt, lt.l AS lpt, lr.l AS lpr,
       |    ls.l AS lps, lb.l AS lpb
       |  FROM pq JOIN pq2 ON pq2.b = pq.b
       |  JOIN lg lt ON lt.v = pq.pt JOIN lg lr ON lr.v = pq.pr
       |  JOIN klg ls ON ls.v = pq2.ps JOIN klg lb ON lb.v = pq2.pb),
       |kagg AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       |    sum(CAST(pt AS HUGEINT) * (lpt - lpr)) AS sr,
       |    sum(CAST(pt AS HUGEINT) * (lpt - lps)) AS ss,
       |    sum(CAST(pt AS HUGEINT) * (lpt - lpb)) AS sb FROM kterms),
       |fin AS (SELECT n_buckets,
       |    CAST(CASE WHEN sr >= 0 THEN sr // $unit
       |         ELSE -((-sr) // $unit) END AS BIGINT) AS kl_raw_micro,
       |    CAST(CASE WHEN sb >= 0 THEN sb // $unit
       |         ELSE -((-sb) // $unit) END AS BIGINT) AS kl_random_micro,
       |    CAST(CASE WHEN ss >= 0 THEN ss // $unit
       |         ELSE -((-ss) // $unit) END AS BIGINT) AS kl_selected_micro
       |  FROM kagg)
       |SELECT n_buckets, kl_raw_micro, kl_random_micro, kl_selected_micro,
       |  kl_random_micro - kl_selected_micro AS improvement_micro
       |FROM fin""".stripMargin

  /** Dirichlet QL replay: the bm25 tokenize/tf CTEs, the sparse
    * decomposition's three log-argument families through ONE shared
    * value-keyed chain, per-query constants, per-doc length penalty,
    * per-query top-10 window. */
  private def dirichletQlOracle(mu: Long, k: Int): String =
    s"""WITH ${dirichletChainCtes(mu)}
       |SELECT qid AS query_id, id AS doc_id, CAST(rk AS INTEGER) AS rk,
       |  n_matched, ql_micro
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY ql_micro DESC, id) AS rk FROM sc)
       |WHERE rk <= $k
       |ORDER BY query_id, rk""".stripMargin

  /** The shared Dirichlet-QL chain ending at `sc(qid, id, n_matched,
    * ql_micro)`; also leaves qt/wf/dl/nt/cf/tf in scope for consumers
    * (the RM3 oracle builds its feedback model from them). */
  private def dirichletChainCtes(mu: Long): String = {
    val qvals = LlmQueries3.Bm25Queries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '$t', CAST(1 AS BIGINT))") }.mkString(", ")
    s"""qt(qid, w, cq) AS (VALUES $qvals),
       |wf AS (
       |  SELECT doc_id AS id, w.w
       |  FROM documents,
       |       unnest(string_split(${normSql("text")}, ' ')) AS w(w)
       |  WHERE w.w <> ''),
       |dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl
       |  FROM wf GROUP BY id),
       |nt AS (SELECT CAST(sum(dl) AS BIGINT) AS NT FROM dl),
       |cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM wf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY w),
       |tf AS (SELECT id, w, CAST(count(*) AS BIGINT) AS c FROM wf
       |  WHERE w IN (SELECT w FROM qt) GROUP BY id, w),
       |vals AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT tf.c * nt.NT + $mu * cf.cf AS v
       |  FROM tf JOIN cf USING (w) CROSS JOIN nt
       |  UNION ALL SELECT $mu * cf FROM cf
       |  UNION ALL SELECT (dl + $mu) * nt.NT FROM dl CROSS JOIN nt)),
       |${LlmQueries14.log2ValueCtes},
       |qc AS (SELECT qt.qid, CAST(sum(qt.cq * l.l) AS BIGINT) AS qc,
       |    CAST(sum(qt.cq) AS BIGINT) AS qlen
       |  FROM qt JOIN cf USING (w)
       |  JOIN lg l ON l.v = $mu * cf.cf GROUP BY qt.qid),
       |sp AS (SELECT qt.qid, tf.id,
       |    CAST(count(*) AS BIGINT) AS n_matched,
       |    CAST(sum(qt.cq * (ln.l - lm.l)) AS BIGINT) AS sm
       |  FROM tf JOIN qt USING (w) JOIN cf USING (w) CROSS JOIN nt
       |  JOIN lg ln ON ln.v = tf.c * nt.NT + $mu * cf.cf
       |  JOIN lg lm ON lm.v = $mu * cf.cf
       |  GROUP BY qt.qid, tf.id),
       |sc AS (SELECT sp.qid, sp.id, sp.n_matched,
       |    CAST(sp.sm + qc.qc - qc.qlen * ld.l AS BIGINT) AS ql_micro
       |  FROM sp JOIN dl ON dl.id = sp.id JOIN qc ON qc.qid = sp.qid
       |  CROSS JOIN nt JOIN lg ld ON ld.v = (dl.dl + $mu) * nt.NT)"""
      .stripMargin
  }

  /** RM3 replay: the Dirichlet chain, the top-kDocs cut, normalized
    * exp2Micro doc weights (the sigmoidCtes q/f decomposition),
    * feedback-doc MLE term models, the weighted RM1 aggregate, the
    * λ-interpolated RM3, per-query top-m window. */
  private def rm3Oracle(mu: Long, kDocs: Int, mTerms: Int,
      lambdaMicro: Long, unit: Long): String =
    s"""WITH RECURSIVE ${rm3ChainCtes(mu, kDocs, lambdaMicro, unit)}
       |SELECT qid AS query_id, CAST(rk AS INTEGER) AS rk, w AS term,
       |  rm1_micro, rm3_micro, is_original
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY rm3_micro DESC, w) AS rk FROM fin)
       |WHERE rk <= $mTerms
       |ORDER BY query_id, rk""".stripMargin

  /** The shared RM3 chain ending at `fin(qid, w, rm1_micro, rm3_micro,
    * is_original)` (also leaves the Dirichlet chain's qt/wf/dl/nt/cf/lg
    * in scope); callers prepend WITH RECURSIVE. */
  private def rm3ChainCtes(mu: Long, kDocs: Int,
      lambdaMicro: Long, unit: Long): String =
    s"""${LlmQueries14.exp2ConstsCtes},
       |${dirichletChainCtes(mu)},
       |top AS (SELECT qid, id, ql_micro FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY ql_micro DESC, id) AS rk FROM sc) WHERE rk <= $kDocs),
       |mxq AS (SELECT qid, max(ql_micro) AS mxv FROM top GROUP BY qid),
       |wq AS (SELECT top.qid, top.id,
       |    greatest(top.ql_micro - mxq.mxv, ${-64L * unit}) + ${64L * unit}
       |      AS xs
       |  FROM top JOIN mxq USING (qid)),
       |wq2 AS (SELECT qid, id, (xs // 1000000) - 64 AS eq,
       |    ((xs % 1000000) * 1048576) // 1000000 AS fr FROM wq),
       |wd AS (SELECT qid, id, CAST((acc * 1000000) //
       |    (CAST(1 AS HUGEINT) << CAST(32 - eq AS INTEGER)) AS BIGINT)
       |      AS wd
       |  FROM (SELECT wq2.*, ${LlmQueries14.exp2AccExpr("fr")} AS acc
       |    FROM wq2 CROSS JOIN cl) x),
       |swd AS (SELECT qid, CAST(sum(wd) AS BIGINT) AS swd
       |  FROM wd GROUP BY qid),
       |ftf AS (SELECT id, w, CAST(count(*) AS BIGINT) AS c FROM wf
       |  WHERE id IN (SELECT id FROM top) GROUP BY id, w),
       |pw AS (SELECT f.id, f.w, ($unit * f.c) // dl.dl AS p
       |  FROM ftf f JOIN dl ON dl.id = f.id),
       |rm1a AS (SELECT wd.qid, pw.w,
       |    sum(CAST(wd.wd AS HUGEINT) * pw.p) AS num
       |  FROM pw JOIN wd ON wd.id = pw.id GROUP BY wd.qid, pw.w),
       |rm1 AS (SELECT rm1a.qid, rm1a.w,
       |    CAST(rm1a.num // swd.swd AS BIGINT) AS rm1
       |  FROM rm1a JOIN swd USING (qid)),
       |qmle AS (SELECT qid, w,
       |    ($unit * cq) // sum(cq) OVER (PARTITION BY qid) AS qp
       |  FROM qt),
       |rmj AS (SELECT coalesce(r.qid, q.qid) AS qid,
       |    coalesce(r.w, q.w) AS w,
       |    coalesce(r.rm1, 0) AS rm1, coalesce(q.qp, 0) AS qp
       |  FROM rm1 r FULL OUTER JOIN qmle q
       |    ON q.qid = r.qid AND q.w = r.w),
       |fin AS (SELECT qid, w, CAST(rm1 AS BIGINT) AS rm1_micro,
       |    CAST(($lambdaMicro * qp + (${unit} - $lambdaMicro) * rm1)
       |      // $unit AS BIGINT) AS rm3_micro,
       |    qp > 0 AS is_original FROM rmj)""".stripMargin

  /** RM3 second-round replay: the shared RM3 chain (expansion relation
    * `fin`), the top-m weighted vocabulary, a THIRD prefixed log2
    * round over the expanded-term value family, the weighted sparse
    * decomposition, one sign-split division, per-query top-k. */
  private def rm3RetrieveOracle(mu: Long, kDocs: Int, mTerms: Int,
      kFinal: Int, lambdaMicro: Long, unit: Long): String =
    s"""WITH RECURSIVE ${rm3ChainCtes(mu, kDocs, lambdaMicro, unit)},
       |expq AS (SELECT qid, w, rm3_micro AS wq FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY rm3_micro DESC, w) AS rk FROM fin)
       |  WHERE rk <= $mTerms AND rm3_micro > 0),
       |rcf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM wf
       |  WHERE w IN (SELECT w FROM expq) GROUP BY w),
       |rtf AS (SELECT id, w, CAST(count(*) AS BIGINT) AS c FROM wf
       |  WHERE w IN (SELECT w FROM expq) GROUP BY id, w),
       |rvals AS MATERIALIZED (SELECT DISTINCT v FROM (
       |  SELECT rtf.c * nt.NT + $mu * rcf.cf AS v
       |  FROM rtf JOIN rcf USING (w) CROSS JOIN nt
       |  UNION ALL SELECT $mu * cf FROM rcf
       |  UNION ALL SELECT (dl + $mu) * nt.NT FROM dl CROSS JOIN nt)),
       |${LlmQueries14.log2ValueCtesP("r")},
       |rqc AS (SELECT expq.qid, CAST(sum(expq.wq * l.l) AS BIGINT) AS qc,
       |    CAST(sum(expq.wq) AS BIGINT) AS wsum
       |  FROM expq JOIN rcf USING (w)
       |  JOIN rlg l ON l.v = $mu * rcf.cf GROUP BY expq.qid),
       |rsp AS (SELECT expq.qid, rtf.id,
       |    CAST(count(*) AS BIGINT) AS n_matched,
       |    CAST(sum(expq.wq * (ln.l - lm.l)) AS BIGINT) AS sm
       |  FROM rtf JOIN expq USING (w) JOIN rcf USING (w) CROSS JOIN nt
       |  JOIN rlg ln ON ln.v = rtf.c * nt.NT + $mu * rcf.cf
       |  JOIN rlg lm ON lm.v = $mu * rcf.cf
       |  GROUP BY expq.qid, rtf.id),
       |rsc AS (SELECT rsp.qid, rsp.id, rsp.n_matched,
       |    rsp.sm + rqc.qc - rqc.wsum * ld.l AS raw
       |  FROM rsp JOIN dl ON dl.id = rsp.id JOIN rqc ON rqc.qid = rsp.qid
       |  CROSS JOIN nt JOIN rlg ld ON ld.v = (dl.dl + $mu) * nt.NT),
       |rql AS (SELECT qid, id, n_matched,
       |    CAST(CASE WHEN raw >= 0 THEN raw // $unit
       |         ELSE -((-raw) // $unit) END AS BIGINT) AS ql_micro
       |  FROM rsc)
       |SELECT qid AS query_id, id AS doc_id, CAST(rk AS INTEGER) AS rk,
       |  n_matched, ql_micro
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY ql_micro DESC, id) AS rk FROM rql)
       |WHERE rk <= $kFinal
       |ORDER BY query_id, rk""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_rm3_retrieve" -> rm3RetrieveOracle(100L, 5, 10, 10, 500000L,
      1000000L),
    "text_rm3_expansion" -> rm3Oracle(100L, 5, 10, 500000L, 1000000L),
    "text_dirichlet_ql" -> dirichletQlOracle(100L, 10),
    "text_sgt_fit" -> sgtOracle(1000000L),
    "mix_dsir_eval" -> dsirEvalOracle(256, 200, 29, 1000000L),
    "dedup_exact_substring" -> exactSubstringOracle(30),
    "decon_exact_substring" -> deconExactSubstringOracle(30, 50L),
    "decon_exact_substring_bloom" -> deconExactSubstringOracle(30, 50L),
    "dedup_substring_profile" -> substringProfileOracle(30),
    "dedup_substring_removal" -> substringRemovalOracle(30),
    "text_good_turing" -> goodTuringOracle(1000000L),
    "text_burstiness" -> burstinessOracle(3L, 100, 1000000L),
    "mix_dsir_weights" -> dsirOracle(256, 200, 29, 1000000L)
  )
}
