package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.T

/** Round-15 registry: suffix-array-exact substring dedup (the ExactSubstr
  * method the dedup family lacked — VERDICT r14 missing-item 2) and DSIR
  * importance resampling (missing-item 4).
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
    graft.ops.Dedup.exactSubstringSpans(
        T.par(spark, T.t(spark, dir, "documents")), minLen = 30)
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
    val docs = T.par(spark, T.t(spark, dir, "documents"))
    graft.ops.Dedup.exactSubstringContamination(
        docs.filter(col("doc_id") < 50), docs.filter(col("doc_id") >= 50),
        minLen = 30)
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
    val spans = graft.ops.Dedup.exactSubstringSpans(docs, minLen = 30)
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
        T.par(spark, T.t(spark, dir, "documents")), minLen = 30)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_substring" -> (dedupExactSubstring _),
    "decon_exact_substring" -> (deconExactSubstring _),
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
  private def mergeCtes(L: Int): String =
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
  private def deconExactSubstringOracle(L: Int, cut: Long): String =
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
      unit: Long): String = {
    val lgU = graft.functions.ExactMicroOps.log2Micro(unit)
    s"""WITH words AS (SELECT doc_id, lang,
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
       |    ORDER BY gumbel_micro DESC, doc_id) AS rnk FROM keyed)
       |SELECT k.doc_id, k.n_grams, k.logw_micro, k.gumbel_micro,
       |  rk.rnk <= $budget AS keep
       |FROM keyed k JOIN rk ON rk.doc_id = k.doc_id
       |ORDER BY k.doc_id""".stripMargin
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

  val oracle: Map[String, String] = Map(
    "dedup_exact_substring" -> exactSubstringOracle(30),
    "decon_exact_substring" -> deconExactSubstringOracle(30, 50L),
    "dedup_substring_profile" -> substringProfileOracle(30),
    "dedup_substring_removal" -> substringRemovalOracle(30),
    "text_good_turing" -> goodTuringOracle(1000000L),
    "text_burstiness" -> burstinessOracle(3L, 100, 1000000L),
    "mix_dsir_weights" -> dsirOracle(256, 200, 29, 1000000L)
  )
}
