package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.count_in_set

/** Text-analysis operators for training-data curation (SURVEY §2.10):
  * token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting. Everything is built-in-expression arithmetic — narrow,
  * codegen'd, shuffle-free per document.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword token count: alphabetic runs, digit runs, and single
    * punctuation marks each count as one token. */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** REAL BPE subword tokenization of the normalized text against a
    * ranked merge list (e.g. a GPT-2-style merges.txt): the classic
    * greedy lowest-rank-pair algorithm, run per word by the codegen'd
    * [[graft.functions.BpeEncode]] expression whose table rides the
    * plan as ONE reference object — a 50k-merge vocabulary costs the
    * same plan size as 5. Map-only; complements the
    * [[subwordTokenCount]] heuristic with vocabulary-exact counts. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.TextFunctions.bpe_encode(Dedup.normalize(text),
      new graft.functions.BpeTable(merges))

  /** size([[bpeTokens]]) — the exact-token-budget counter. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(text, merges))

  /** Distributed BPE merge-table training (Sennrich et al., the
    * standard subword-NMT algorithm): learn `k` merges by repeatedly
    * taking the corpus's most frequent adjacent symbol pair.
    *
    * The scale insight: BPE statistics depend only on the WORD
    * VOCABULARY with frequencies, not the corpus — so the corpus is
    * reduced once to a (word, freq) relation (one map-side-combined
    * shuffle; vocabulary size, not corpus size), and every training
    * round re-tokenizes that vocabulary with the merges learned so far
    * (the codegen [[graft.functions.BpeEncode]] kernel), explodes
    * adjacent token pairs weighted by word frequency, and aggregates
    * the best pair — k rounds × one vocabulary-sized aggregation, with
    * only a single (pair, count) row ever reaching the driver per
    * round. Ties break lexicographically, so training is deterministic
    * and partition-invariant (integer counts, total order). Training
    * stops early if no pair occurs at least `minFreq` times. */
  def trainBpeMerges(docs: DataFrame, k: Int, minFreq: Long = 2,
      textCol: String = "text"): Seq[(String, String)] = {
    require(k > 0, "k must be positive")
    val vocab = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.size < k && !done) {
        val toks =
          if (merges.isEmpty) split(col("w"), "").as("toks")
          else graft.functions.TextFunctions.bpe_encode(col("w"),
            new graft.functions.BpeTable(merges.toSeq)).as("toks")
        val best = vocab
          .select(col("freq"), toks)
          .filter(size(col("toks")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("a"),
              element_at(col("toks"), i + 1).as("b")))).as("p"))
          .groupBy(col("p.a"), col("p.b"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        if (best.isEmpty || best.head.getLong(2) < minFreq) done = true
        else merges += ((best.head.getString(0), best.head.getString(1)))
      }
      merges.toSeq
    } finally { vocab.unpersist(); () }
  }

  /** Ratio of punctuation characters to all characters (exact integer
    * arithmetic, single final division). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Ratio of tokens that are stopwords. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val words = split(Dedup.normalize(text), " ")
    count_in_set(words, Stopwords).cast("double") /
      greatest(size(words), lit(1))
  }

  /** Mean word length (exact int sums, one division). */
  def avgWordLen(text: Column): Column = {
    val words = split(Dedup.normalize(text), " ")
    // Σ length(w) == length of the empty-separator join — a codegen'd
    // builtin, vs the interpreted aggregate() lambda.
    length(concat_ws("", words)).cast("double") /
      greatest(size(words), lit(1))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation and a natural stopword rate. Deterministic arithmetic —
    * the exact formula matters less than it being stable and monotone in
    * the signals (C4/Gopher-style heuristic filtering). */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(5, 5000), lit(1.0)).otherwise(lit(0.2))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopOk = least(stopwordRatio(text) * 5, lit(1.0))
    round(lenOk * 0.4 + punctOk * 0.3 + stopOk * 0.3, 6)
  }

  /** Language-ID by stopword-marker voting (n-gram heuristic). Marker hits
    * are counted per language; the language with the most hits wins, ties
    * resolved in declaration order. Real pipelines plug in fastText-style
    * models via the same column contract. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  def langGuess(text: Column): Column =
    langFromWords(split(Dedup.normalize(text), " "))

  /** Whole-document fingerprint: md5 of normalized text. */
  def fingerprint(text: Column): Column = md5(Dedup.normalize(text))

  /** Winnowing-style robust fingerprint: the minimum hash over all
    * `window`-char sliding substrings of the normalized text — stable under
    * small local edits (k-gram winnowing, Schleimer et al.). Built from
    * higher-order functions, no UDF. */
  def robustFingerprint(text: Column, window: Int = 8): Column =
    graft.functions.VectorFunctions.min_window_md5(Dedup.normalize(text), window)

  /** Argmax over per-language marker hits, given the words array: lang_i
    * wins iff its count is strictly greater than every earlier lang's and
    * >= every later one's (declaration-order tie-break). The per-language
    * win conditions are mutually exclusive, so a first-match coalesce
    * chain (the P5 pattern) expresses the argmax directly — no fold
    * accumulator, no sentinel comparison (the old `acc === "unknown"`
    * seed constructed a trivially-true equals predicate that tripped
    * Spark's Column WARN on every plan build). */
  private def langFromWords(words: Column): Column = {
    val hits = LangMarkers.map { case (lang, markers) =>
      lang -> count_in_set(words, markers)
    }
    val arms = hits.zipWithIndex.map { case ((lang, cnt), i) =>
      val beatsEarlier = hits.take(i).map(_._2 < cnt)
      val tiesLater = hits.drop(i + 1).map(_._2 <= cnt)
      val isBest = (beatsEarlier ++ tiesLater :+ (cnt > 0)).reduce(_ && _)
      when(isBest, lit(lang))
    }
    coalesce(arms :+ lit("unknown"): _*)
  }

  /** Materialize the normalized word array ONCE behind an
    * explode(array(...)) Generate fence. Every downstream reference to
    * `__words` is then a bound attribute: Catalyst's projection collapsing
    * and filter pushdown substitute ALIASES into every use site (no
    * cross-reference CSE), so without the fence the normalize+split regex
    * chain is re-expanded once per reference — ~50 times per row inside
    * the language-argmax CASE ladder alone. Same trick as
    * LogParser.tokenize. */
  private def withWords(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("*"),
      explode(array(split(Dedup.normalize(col(textCol)), " "))).as("__words"))

  /** Quality formula over a materialized words column (same arithmetic as
    * [[qualityScore]], which re-derives words from the raw text). */
  private def qualityFromWords(text: Column, w: Column): Column = {
    val nw = greatest(size(w), lit(1))
    val stop = count_in_set(w, Stopwords).cast("double") / nw
    round(
      when(tokenCount(text).between(5, 5000), lit(1.0)).otherwise(lit(0.2)) * 0.4 +
        (lit(1.0) - least(punctRatio(text) * 4, lit(1.0))) * 0.3 +
        least(stop * 5, lit(1.0)) * 0.3, 6)
  }

  /** Map-only gating annotation: every input column plus (quality,
    * lang_guess), computed with the same formulas as [[profile]].
    *
    * This replaces the join-docs-back-to-profile(docs) formulation in
    * gating pipelines — that shape shuffles the whole corpus TWICE on the
    * id (once per join side) for what is a purely per-row computation; at
    * scale the exchange dominates. This shape shuffles nothing, and the
    * [[withWords]] fence keeps the text kernels at one evaluation per row
    * even under filter pushdown. */
  def annotateQualityLang(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val w = col("__words")
    withWords(docs, textCol)
      .withColumn("quality", qualityFromWords(text, w))
      .withColumn("lang_guess", langFromWords(w))
      .drop("__words")
  }

  /** One-pass document profile used by the curation queries.
    *
    * The normalize/split chain is materialized ONCE via the [[withWords]]
    * Generate fence — `withColumn` intermediates are NOT enough: Catalyst
    * collapses the projections and inlines the alias into every use site
    * (~50 re-evaluations per row inside the language argmax). Values are
    * identical to the individual helpers (same formulas, same unrounded
    * intermediates feeding qualityScore). */
  def profile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val w = col("__words")
    val nw = greatest(size(w), lit(1))
    val punct = punctRatio(text)
    val stop = count_in_set(w, Stopwords).cast("double") / nw
    withWords(docs, textCol)
      .select(col(idCol),
        tokenCount(text).as("n_tokens"),
        subwordTokenCount(text).as("n_subwords"),
        length(text).as("n_chars_actual"),
        round(punct, 6).as("punct_ratio"),
        round(stop, 6).as("stopword_ratio"),
        round(length(concat_ws("", w)).cast("double") / nw, 6).as("avg_word_len"),
        qualityFromWords(text, w).as("quality"),
        langFromWords(w).as("lang_guess"),
        md5(Dedup.normalize(text)).as("fingerprint"))
  }

  /** Green-list watermark detection (the Kirchenbauer et al. 2023
    * scheme's detector side): a watermarking generator biases each next
    * token toward a pseudorandom "green list" seeded by the previous
    * token; the detector counts, over word bigrams, how many landed
    * green (hash(prev|cur) mod 2 = 0 — a model-free hash partition
    * standing in for the scheme's seeded list) and flags documents
    * whose green excess is statistically impossible for natural text.
    * For unwatermarked text greens ~ Binomial(n, ½), so the one-sided
    * z-test  (2·greens − n) / √n > z  flags; squaring removes the
    * square root:  excess > 0  AND  100·excess² ≥ z₁₀²·n  with z₁₀ the
    * threshold in tenths — exact integer arithmetic, engine-portable.
    * Synthetic-text filtering is a first-class corpus gate now that
    * crawls contain generated text. Every doc gets a row (docs with no
    * bigrams report zeros, unflagged).
    *
    * Scale shape: one tokenize pass, per-doc combine-agg, left
    * back-join — [[bigramLmScore]]'s exact posture. Long envelope:
    * 100·excess² wraps at n ≈ 3·10⁸ bigrams in ONE doc. */
  def watermarkDetect(docs: DataFrame, z10: Long = 40L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), size(col("__w")) - 2),
          i => concat_ws(" ", element_at(col("__w"), i + 1),
            element_at(col("__w"), i + 2)))).as("b"))
    val per = bg
      .withColumn("__g",
        (pmod(Dedup.hashStr(col("b"), 71), lit(2L)) === 0L).cast("long"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__g")).as("n_green"))
      .withColumn("green_milli",
        expr("(1000 * n_green) div greatest(n_bigrams, 1)"))
      .withColumn("is_watermarked", expr(
        s"""CAST(2 * n_green - n_bigrams > 0 AND
           |  100 * (2 * n_green - n_bigrams) * (2 * n_green - n_bigrams)
           |    >= $z10 * $z10 * n_bigrams AS BIGINT)""".stripMargin))
    docs.select(col(idCol))
      .join(per, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_green"), lit(0L)).as("n_green"),
        coalesce(col("green_milli"), lit(0L)).as("green_milli"),
        coalesce(col("is_watermarked"), lit(0L)).as("is_watermarked"))
  }

  /** Unicode-script profile — step 0 of language handling at corpus
    * scale (script routes the document BEFORE any word-level language
    * ID makes sense: a CJK doc must not reach the whitespace tokenizer,
    * an Arabic doc not the Latin stopword list). Counts characters in
    * the major script ranges via `\x{…}` codepoint-class regexes — the
    * ONE escape syntax Java regex and RE2 share, so the counts replay
    * in any engine — and names the dominant script with count
    * tie-breaks by fixed script order. Pure map; every doc gets a row
    * (empty text → all zeros, dominant = 'none'). */
  def scriptProfile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ranges = Seq(
      "latin" -> "[A-Za-z]",
      "cjk" -> "[\\x{4e00}-\\x{9fff}]",
      "cyrillic" -> "[\\x{0400}-\\x{04ff}]",
      "arabic" -> "[\\x{0600}-\\x{06ff}]",
      "hangul" -> "[\\x{ac00}-\\x{d7af}]",
      "greek" -> "[\\x{0370}-\\x{03ff}]")
    val counted = docs.select(col(idCol) +: ranges.map { case (nm, re) =>
      Curation.countMatches(col(textCol), re).cast("long").as(s"n_$nm")
    }: _*)
    // dominant = max count, ties by the fixed order above (greatest()
    // would hide which script won a tie)
    val dom = ranges.map(_._1).foldRight(lit("none")) { (nm, els) =>
      when(col(s"n_$nm") > 0 &&
        ranges.map(_._1).filter(_ != nm)
          .map(o => col(s"n_$nm") >= col(s"n_$o"))
          .reduce(_ && _), lit(nm)).otherwise(els)
    }
    counted.withColumn("dominant_script", dom)
  }

  /** Code-vs-prose detection — the corpus-separation signal every mixed
    * crawl pipeline runs before deciding a document's tokenizer, mix
    * bucket, and quality rules (prose rules like [[gopherGate]]'s
    * stopword test MISFIRE on source code; code gets its own lane).
    * Rule-based and integer-exact over the RAW text (code lives in the
    * punctuation that [[graft.ops.Dedup.normalize]] strips):
    *   n_sym     — structural symbols `{}[]();=<>`
    *   n_kw      — language keyword hits (def/class/import/return/
    *               function/var/const/void, word-bounded)
    *   n_ident   — snake_case / camelCase identifiers
    *   n_words   — whitespace tokens
    * score = 1000·(4·n_kw + 2·n_ident + n_sym) div n_words (per-word
    * symbol pressure, cross-multiplied — no float ratio), is_code at
    * `threshold` (default 350 ≈ one structural symbol every third word
    * with a sprinkling of keywords). RE2-compatible patterns only, so
    * the verdict replays in any engine. Pure map, every doc gets a row. */
  def codeDetect(docs: DataFrame, threshold: Long = 350L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
        Curation.countMatches(t, "[{}\\[\\]();=<>]").cast("long").as("n_sym"),
        Curation.countMatches(t,
          "\\b(def|class|import|return|function|var|const|void)\\b")
          .cast("long").as("n_kw"),
        Curation.countMatches(t,
          "\\b[a-z]+(_[a-z0-9]+|[A-Z][a-z0-9]*)[A-Za-z0-9_]*\\b")
          .cast("long").as("n_ident"),
        greatest(size(split(trim(t), "\\s+")), lit(1)).cast("long")
          .as("n_words"))
      .withColumn("code_score",
        expr("(1000 * (4 * n_kw + 2 * n_ident + n_sym)) div n_words"))
      .withColumn("is_code",
        expr(s"CAST(code_score >= $threshold AS BIGINT)"))
  }

  /** Simpson/Herfindahl lexical concentration per document — the
    * log-free diversity companion to entropy (entropy needs
    * transcendentals; Simpson's Σp² is a rational function of the word
    * counts, so it replays exactly): concentration = unit·Σc² div n²,
    * diversity = unit − concentration. Word-soup and looping generations
    * concentrate (few types dominate → high Σp²); natural prose
    * diversifies. Ranks the same pathologies as entropy-based gates
    * while staying integer-exact. Every input doc gets a row (wordless
    * docs report 0/0 via the left back-join, the
    * [[bigramLmScore]] convention).
    *
    * Scale shape: two combine-aggs ((id, word) counts → per-doc Σc²,
    * n); the squared sums ride DECIMAL(38,0) (unit·Σc² wraps a long
    * near 3·10⁶ words in one doc). */
  def simpsonDiversity(docs: DataFrame, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val per = explodedWords(docs, idCol, textCol)
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("__c"))
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("n_words"),
        sum(col("__c") * col("__c")).as("__ss"))
      .withColumn("simpson_micro", expr(
        s"""CAST(($unit * CAST(__ss AS DECIMAL(38,0))) div
           |  (CAST(n_words AS DECIMAL(38,0)) * n_words) AS BIGINT)"""
          .stripMargin))
      .withColumn("diversity_micro", expr(s"$unit - simpson_micro"))
      .select(col("id"), col("n_words"), col("simpson_micro"),
        col("diversity_micro"))
    docs.select(col(idCol))
      .join(per, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("simpson_micro"), lit(0L)).as("simpson_micro"),
        coalesce(col("diversity_micro"), lit(0L)).as("diversity_micro"))
  }

  /** Gopher-style hard-rule quality gate (Rae et al. 2021 §A1.1 shape):
    * the pre-model document filter every large-corpus pipeline runs
    * before any learned scoring, with each rule's verdict emitted as its
    * own 0/1 flag so the DROP REASON is queryable (what fraction fell to
    * word count vs stopword absence is the first question a data audit
    * asks). Rules, all in exact integer comparisons over the normalized
    * words (no ratios, no floats — cross-multiplied thresholds):
    *   r_word_count: minWords ≤ n ≤ maxWords;
    *   r_word_len:   3·n ≤ total word chars ≤ 10·n (mean length 3..10);
    *   r_alpha:      10·n_alpha ≥ 8·n (≥80% words contain a letter);
    *   r_stopwords:  ≥ 2 DISTINCT [[Stopwords]] members present;
    * keep = every rule passes. Documents always get a row (empty text
    * fails r_word_count with n = 0), so downstream anti-joins see the
    * full corpus.
    *
    * Scale shape: pure map — one normalize/split per row, per-row array
    * ops, no shuffle, no state. */
  def gopherGate(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ws = filter(split(Dedup.normalize(col(textCol)), " "),
      w => w =!= "")
    val stopLit = array(Stopwords.map(lit(_)): _*)
    docs.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        length(concat_ws("", col("__ws"))).cast("long").as("n_wchars"),
        size(filter(col("__ws"), w => w.rlike("[a-z]"))).cast("long")
          .as("n_alpha"),
        size(array_intersect(array_distinct(col("__ws")), stopLit))
          .cast("long").as("n_stop"))
      .withColumn("r_word_count", expr(
        s"CAST(n_words >= $minWords AND n_words <= $maxWords AS BIGINT)"))
      .withColumn("r_word_len", expr(
        "CAST(3 * n_words <= n_wchars AND n_wchars <= 10 * n_words " +
          "AND n_words > 0 AS BIGINT)"))
      .withColumn("r_alpha", expr(
        "CAST(10 * n_alpha >= 8 * n_words AND n_words > 0 AS BIGINT)"))
      .withColumn("r_stopwords", expr("CAST(n_stop >= 2 AS BIGINT)"))
      .withColumn("keep", expr(
        "r_word_count * r_word_len * r_alpha * r_stopwords"))
  }

  /** Normalized words exploded to (id, w) rows, empties dropped. */
  private def explodedWords(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")

  /** Within-document repetition metrics (Gopher-style quality signals):
    * word count, distinct-word ratio, the most-frequent word's share of
    * all words, and the duplicated-bigram share. Documents whose
    * normalized text is empty yield no row (they have no words).
    *
    * Shape: explode → two-phase aggregation ((id, gram) counts combine
    * map-side, then per-doc rollup), NOT a per-row O(words²)
    * higher-order-function lambda — a 1 MB document stays linear, and the
    * wide explode never crosses an exchange un-aggregated. */
  def repetitionProfile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = explodedWords(docs, idCol, textCol)
    val wordStats = words.groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_c"))
    val bigramStats = docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol).as("id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => concat_ws(" ",
          element_at(col("__w"), i + 1), element_at(col("__w"), i + 2))))
        .as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    // left join: a one-word doc has words but no bigrams — dup share 0
    wordStats.join(bigramStats, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_words"), col("n_distinct_words"),
        round(col("n_distinct_words") / col("n_words"), 6)
          .as("distinct_word_ratio"),
        round(col("top_c") / col("n_words"), 6).as("top_word_share"),
        coalesce(
          round(lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams"), 6),
          lit(0.0)).as("dup_bigram_share"))
  }

  /** Feature-hashing ("hashing trick") document embedding: `dim` signed
    * buckets, vec[d] = Σ sign(w)·count(w) over words w with
    * hash(w) mod dim = d, sign(w) = ±1 from an independent hash bit
    * (Weinberger et al., ICML'09) — the model-free dense representation
    * that feeds coarse clustering, near-dup blocking and ANN when no
    * learned embeddings exist. Exact integer arithmetic end-to-end
    * (md5-derived hashes, signed counts), so the embedding is
    * bit-identical across engines and partitionings.
    *
    * Output is the SPARSE (id, idx, value) relation — only occupied
    * buckets emit rows (scalar rows hash-compare under the oracle gate;
    * pivot to a dense array with a groupBy + array build when a vector
    * column is needed). Shape: explode words → one combine-aggregated
    * shuffle keyed (id, bucket); the exchange carries the sparse
    * feature relation, never the text. */
  def hashEmbedding(docs: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0, "dim must be positive")
    docs.select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"),
        pmod(Dedup.hashStr(col("w"), 31), lit(dim.toLong)).as("idx"),
        (pmod(Dedup.hashStr(col("w"), 47), lit(2L)) * 2L - 1L).as("__sign"))
      .groupBy(col("id"), col("idx"))
      .agg(sum(col("__sign")).as("value"))
      .select(col("id").as(idCol), col("idx").cast("int").as("idx"),
        col("value"))
  }

  /** Dense `ArrayType(FloatType)` form of [[hashEmbedding]] — the glue
    * that feeds raw text into the embedding stack ([[Similarity]]'s
    * k-means / ANN / SemDeDup operators) with no learned model. One
    * extra per-doc aggregation over the sparse relation; the dense
    * array is built by an index lookup over a per-doc map, so the
    * result is partition-invariant like the sparse form. */
  def denseHashEmbedding(docs: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    hashEmbedding(docs, dim, idCol, textCol)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("value"))))
        .as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i.cast("int")), lit(0L))
            .cast("float")).as("embedding"))

  /** Corpus-LM document scoring — the CCNet/Gopher "language-model
    * quality" signal in an exactly-rational form. Train corpus bigram
    * counts c(w₁w₂) and first-word marginals c(w₁·); score every
    * document by the mean Laplace-smoothed conditional frequency of its
    * bigram occurrences, in integer micro-units: per occurrence
    * `unit·(c(w₁w₂)+1) div (c(w₁·)+V)` with V the first-word vocabulary
    * size, per document the floor mean. Smoothing is what makes it a
    * signal: unsmoothed, a singleton bigram with a singleton first word
    * scores a perfect c/c = 1 — gibberish would rank highest. No
    * logarithms (transcendentals aren't bit-portable across engines);
    * the arithmetic-mean surrogate keeps the keep/drop ranking of the
    * usual log-perplexity. In-distribution text built from frequent
    * continuations scores high; random word soup scores ≈ unit/V.
    *
    * Every input document gets a row: docs with no bigrams (< 2 words)
    * come back with n_bigrams = 0 and lm_micro = 0 via the left
    * back-join, so a downstream filter always sees them.
    *
    * Scale shape: the count relations are vocabulary-sized (map-side
    * combined before their exchanges); V rides along as a broadcast
    * one-row aggregate; scoring is two equi-joins of the per-doc bigram
    * relation against the counts, keyed by bigram/first word. Two
    * corpus passes (train + score) — at 100 TB the counts would be
    * persisted between jobs via [[graft.sources.Artifacts]]-style
    * parquet. `unit·(c+1)` needs headroom: with unit = 10⁶ the product
    * stays in a long up to ~9·10¹² occurrences of one bigram. */
  def bigramLmScore(docs: DataFrame, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol).as("id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => struct(
          element_at(col("__w"), i + 1).as("w1"),
          concat_ws(" ", element_at(col("__w"), i + 1),
            element_at(col("__w"), i + 2)).as("b"))))
        .as("__p"))
      .select(col("id"), col("__p.w1").as("w1"), col("__p.b").as("b"))
    // ONE corpus pass trains every count relation: the per-doc bigram
    // relation is reduced and localCheckpoint'ed first, and the corpus
    // counts, marginals, and V all derive from that materialization by
    // summing its per-doc counts — the corpus is never re-exploded
    // (b determines w1 — words carry no spaces post-normalize — so
    // (b, w1) has the same cardinality as b alone).
    val db = bg.groupBy(col("id"), col("b"), col("w1"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val cbw = db.groupBy(col("b"), col("w1")).agg(sum(col("n")).as("cb"))
      .localCheckpoint()
    val cw = cbw.groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
    val vocab = cw.agg(count(lit(1)).as("__v"))
    val scored = db.join(cbw.select(col("b"), col("cb")), Seq("b"))
      .join(cw, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__occ", expr(s"($unit * (cb + 1)) div (cw + __v)"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_bigrams"),
        expr("sum(n * __occ) div sum(n)").as("lm_micro"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
  }

  /** Trigram language-model score with interpolated backoff — the
    * KenLM-shaped upgrade of [[bigramLmScore]]: per trigram,
    * score = (4·P₃ + 2·P₂ + P₁) div 7 where each Pₖ is the
    * Laplace-smoothed order-k conditional in exact integer micro-units
    * (P₃ = unit·(c₃+1) div (ctx₂+V), P₂ over the (w2,w3) bigram,
    * P₁ the unigram), and per document the floor mean over its
    * trigrams. Fixed rational interpolation weights (4:2:1) replace
    * KenLM's tuned floats — transcendental-free, so the score replays
    * bit-exactly in any SQL engine. Rare trigrams back off smoothly:
    * an unseen trigram of a common bigram still scores near
    * 2/7·P₂-level rather than the unigram floor.
    *
    * Every count relation derives from ONE exploded trigram pass:
    * c₃ by trigram (its prefix-context marginal by prefix sum),
    * c₂₃ by the (w2,w3) suffix bigram (its w2 marginal by sum),
    * c₁ by w3, with N = Σc₁ and V = |distinct w3| riding along as a
    * broadcast one-row aggregate. Docs with < 3 words come back with
    * n_trigrams = 0, lm3_micro = 0 via the left back-join.
    *
    * Scale shape: count relations are distinct-n-gram-sized (map-side
    * combined; the trigram relation is the big one — at 100 TB it
    * would persist between jobs via [[graft.sources.Artifacts]]-style
    * parquet, exactly how KenLM materializes its count files); scoring
    * is equi-joins of the per-doc trigram relation against the counts.
    * Overflow envelope: every Pₖ ≤ unit, so the weighted sum ≤ 7·unit
    * and `unit·(c+1)` holds to ~9·10¹² occurrences of one n-gram. */
  def trigramLmScore(docs: DataFrame, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tg = trigramRelation(docs, idCol, textCol)
    // ONE corpus pass trains every order's counts: the per-doc trigram
    // relation is reduced and localCheckpoint'ed first, and every
    // count relation (each order, its marginals, V/N) derives from that
    // materialization by summing its per-doc counts — the corpus is
    // exploded exactly once, not once per count consumer
    val dt = tg.groupBy(col("id"), col("t"), col("b12"), col("b23"),
        col("w2"), col("w3"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val c3 = dt.groupBy(col("t"), col("b12")).agg(sum(col("n")).as("c3"))
      .localCheckpoint()
    val ctx2 = c3.groupBy(col("b12")).agg(sum(col("c3")).as("ctx2"))
    val c23 = dt.groupBy(col("b23"), col("w2")).agg(sum(col("n")).as("c23"))
      .localCheckpoint()
    val ctx1 = c23.groupBy(col("w2")).agg(sum(col("c23")).as("ctx1"))
    val c1 = dt.groupBy(col("w3")).agg(sum(col("n")).as("c1"))
      .localCheckpoint()
    val nv = c1.agg(sum(col("c1")).as("__n"), count(lit(1)).as("__v"))
    val scored = dt
      .join(c3.select(col("t"), col("c3")), Seq("t"))
      .join(ctx2, Seq("b12"))
      .join(c23.select(col("b23"), col("c23")), Seq("b23"))
      .join(ctx1, Seq("w2"))
      .join(c1, Seq("w3"))
      .crossJoin(broadcast(nv))
      .withColumn("__p3", expr(s"($unit * (c3 + 1)) div (ctx2 + __v)"))
      .withColumn("__p2", expr(s"($unit * (c23 + 1)) div (ctx1 + __v)"))
      .withColumn("__p1", expr(s"($unit * (c1 + 1)) div (__n + __v)"))
      .withColumn("__s", expr("(4 * __p3 + 2 * __p2 + __p1) div 7"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_trigrams"),
        expr("sum(n * __s) div sum(n)").as("lm3_micro"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lm3_micro"), lit(0L)).as("lm3_micro"))
  }

  /** Interpolated Kneser–Ney TRIGRAM scoring — [[trigramLmScore]]'s
    * Laplace interpolation replaced by the smoothing CCNet's KenLM
    * models actually use (Kneser & Ney ICASSP'95; Chen & Goodman
    * 1998's interpolated form), in exactly-rational integer
    * micro-units. Absolute discount d = 3/4 at every level; lower
    * orders use CONTINUATION counts derived from the trigram types
    * (the KenLM adjusted-count discipline — a lower-order n-gram's
    * count is the number of distinct left extensions, not its raw
    * frequency):
    *
    *   P₃(w₃|w₁w₂) = (c(w₁w₂w₃)−d)/c(w₁w₂·)
    *               + d·N₁₊(w₁w₂·)/c(w₁w₂·) · P₂(w₃|w₂)
    *   P₂(w₃|w₂)   = (N₁₊(·w₂w₃)−d)/N₁₊(·w₂·)
    *               + d·N₁₊(w₂·)/N₁₊(·w₂·) · P₁(w₃)
    *   P₁(w₃)      = N₁₊(·w₃)/N₁₊(··)
    *
    * where N₁₊(·w₂w₃) = distinct w₁ preceding the suffix bigram,
    * N₁₊(·w₂·) = trigram types with middle word w₂, N₁₊(w₂·) =
    * distinct suffix-bigram types starting at w₂, N₁₊(·w₃) = distinct
    * suffix-bigram types ending at w₃, N₁₊(··) = all suffix-bigram
    * types. Integer micro form, one floor div per level (d = 3/4
    * multiplied through — the nested products stay exact):
    *
    *   p₁ = unit·N₁₊(·w₃) div N₁₊(··)
    *   p₂ = (unit·(4·N₁₊(·w₂w₃) − 3) + 3·N₁₊(w₂·)·p₁)
    *          div (4·N₁₊(·w₂·))
    *   p₃ = (unit·(4·c₃ − 3) + 3·N₁₊(w₁w₂·)·p₂) div (4·c(w₁w₂·))
    *
    * Every count on the scoring path is ≥ 1 (an observed trigram
    * implies its own type and its suffix-bigram type), so 4c−3 ≥ 1 and
    * the max(·,0) clamp is vacuous — no negative-dividend divergence.
    * Unit-mass law (TextAnalysisSpec, dense over a toy vocabulary):
    * p ≥ 0 everywhere and Σ_{w₃∈V} P₃(w₃|h) = unit per observed
    * history up to the two floors in the chain. Per document: the
    * floor mean over trigram occurrences, n_trigrams = 0 / kn3_micro
    * = 0 for <3-word docs via the back-join.
    *
    * Overflow envelope (the [[trigramLmScore]] discipline):
    * unit·(4c−3) holds to c ≈ 2.3·10¹² occurrences of one n-gram;
    * 3·N₁₊·p ≤ 3·|V|·unit holds to |V| ≈ 3·10¹¹ types — both beyond
    * any real corpus, both in plain Long.
    *
    * Scale shape: identical to [[trigramLmScore]] — ONE exploded
    * trigram pass reduced per-doc then checkpointed; every count
    * relation (trigram types, continuation types, their marginals, the
    * type total) derives from that materialization, distinct-n-gram-
    * sized and map-side combined; scoring is equi-joins against the
    * per-doc relation plus a one-row broadcast. */
  def kneserNeyTrigramScore(docs: DataFrame, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tg = trigramRelation(docs, idCol, textCol)
    val dt = tg.groupBy(col("id"), col("t"), col("b12"), col("b23"),
        col("w2"), col("w3"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // trigram type counts (t determines b12/b23/w2/w3 — words carry no
    // spaces post-normalize, so the extra keys ride along for free)
    val c3 = dt.groupBy(col("t"), col("b12"), col("b23"), col("w2"),
        col("w3"))
      .agg(sum(col("n")).as("c3"))
      .localCheckpoint()
    val ctx3 = c3.groupBy(col("b12"))
      .agg(sum(col("c3")).as("ctx3"), count(lit(1)).as("n3"))
    // continuation counts: one pass over the TYPE relation per level
    val cont2 = c3.groupBy(col("b23"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("cc2"))
      .localCheckpoint()
    val ctx2 = cont2.groupBy(col("w2"))
      .agg(sum(col("cc2")).as("ctx2c"), count(lit(1)).as("nb2"))
    val cont1 = cont2.groupBy(col("w3")).agg(count(lit(1)).as("cc1"))
    val nb = cont2.agg(count(lit(1)).as("__nb"))
    val scored = dt
      .join(c3.select(col("t"), col("c3")), Seq("t"))
      .join(ctx3, Seq("b12"))
      .join(cont2.select(col("b23"), col("cc2")), Seq("b23"))
      .join(ctx2, Seq("w2"))
      .join(cont1, Seq("w3"))
      .crossJoin(broadcast(nb))
      .withColumn("__p1", expr(s"($unit * cc1) div __nb"))
      .withColumn("__p2", expr(
        s"($unit * (4 * cc2 - 3) + 3 * nb2 * __p1) div (4 * ctx2c)"))
      .withColumn("__p3", expr(
        s"($unit * (4 * c3 - 3) + 3 * n3 * __p2) div (4 * ctx3)"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_trigrams"),
        expr("sum(n * __p3) div sum(n)").as("kn3_micro"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("kn3_micro"), lit(0L)).as("kn3_micro"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP'95;
    * Chen & Goodman 1998's interpolated form) — the smoothing the CCNet
    * perplexity filter's KenLM models actually use, in exactly-rational
    * integer form. Unlike Laplace ([[bigramLmScore]]), the backoff mass
    * goes to the CONTINUATION distribution: per bigram occurrence
    *
    *   P_KN(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·)
    *               + d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N_types
    *
    * with absolute discount d = 3/4 (the standard "D ≈ 0.75" fixed
    * rational — tuned floats are not engine-portable). "the york" gets
    * a LOW score even though "york" is frequent, because "york" follows
    * few distinct words — the continuation insight Laplace misses.
    *
    * Integer micro form (both terms floor-div'd, d = 3/4 multiplied
    * through): occ = unit·(4c−3) div (4·c(w₁·))
    *               + unit·3·N₁₊(w₁·)·N₁₊(·w₂) div (4·c(w₁·)·N_types);
    * per document the floor mean over bigram occurrences. Observed
    * bigrams have c ≥ 1 so 4c−3 ≥ 1 — the max(·,0) clamp is vacuous on
    * the scoring path. The second term's triple product rides
    * DECIMAL(38,0) (wraps a long once N₁₊ counts pass ~10⁶ at
    * unit = 10⁶ — i.e. at real-corpus vocabulary, not at test scale).
    *
    * Every input document gets a row (n_bigrams = 0, kn_micro = 0 via
    * the left back-join). Scale shape identical to [[bigramLmScore]]:
    * one corpus explode reduced per-doc then checkpointed; all count
    * relations (bigram types, first-word marginals+fan-out, continuation
    * fan-in, type total) are vocabulary-sized, map-side combined;
    * scoring is three equi-joins plus a one-row broadcast. */
  def kneserNeyBigramScore(docs: DataFrame, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = knScoredBigramTypes(docs, unit, idCol, textCol)
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_bigrams"),
        expr("sum(n * __occ) div sum(n)").as("kn_micro"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_micro"), lit(0L)).as("kn_micro"))
  }

  /** The per-(doc, bigram-type) Kneser–Ney-scored relation
    * (id, w1, w2, n, __occ) shared by [[kneserNeyBigramScore]] and
    * [[minKProbBigram]] — identical arithmetic to the original in-line
    * form (pure extraction). */
  private def knScoredBigramTypes(docs: DataFrame, unit: Long,
      idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol).as("id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => struct(
          element_at(col("__w"), i + 1).as("w1"),
          element_at(col("__w"), i + 2).as("w2"))))
        .as("__p"))
      .select(col("id"), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val db = bg.groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val cb = db.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("cb"))
      .localCheckpoint()
    // c(w₁·) and N₁₊(w₁·) from ONE pass over the type relation
    val cw = cb.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cw"), count(lit(1)).as("n1w"))
    val n1c = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1c"))
    val nt = cb.agg(count(lit(1)).as("__nt"))
    db
      .join(cb, Seq("w1", "w2"))
      .join(cw, Seq("w1"))
      .join(n1c, Seq("w2"))
      .crossJoin(broadcast(nt))
      .withColumn("__occ", expr(
        s"($unit * (4 * cb - 3)) div (4 * cw) + " +
          s"CAST((CAST($unit AS DECIMAL(38,0)) * 3 * n1w * n1c) div " +
          "(CAST(4 AS DECIMAL(38,0)) * cw * __nt) AS BIGINT)"))
      .select(col("id"), col("w1"), col("w2"), col("n"), col("__occ"))
  }

  /** Min-K% Prob membership/contamination signal (Shi et al., ICLR 2024
    * "Detecting Pretraining Data from Large Language Models"): the mean
    * of a document's k% LOWEST token probabilities under a reference LM —
    * a memorized/contaminated document is suspiciously confident even in
    * its least-likely positions, so a HIGH min-k score flags it. Here the
    * reference LM is the corpus Kneser–Ney bigram model and the unit is
    * the bigram TYPE (the k% lowest-scored distinct bigrams per doc, ties
    * pinned by (score, w1, w2) — a deterministic, exactly-replayable
    * variant of the per-token original). kNumer/kDenom give the k
    * fraction (default 1/5 = 20%); every doc keeps at least one type.
    * Windows are doc-partitioned (never global); the scored-type relation
    * is the same one [[kneserNeyBigramScore]] aggregates. */
  def minKProbBigram(docs: DataFrame, kNumer: Int = 1, kDenom: Int = 5,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(kNumer > 0 && kDenom >= kNumer, "need 0 < kNumer/kDenom <= 1")
    val s = knScoredBigramTypes(docs, unit, idCol, textCol)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__occ"), col("w1"), col("w2"))
    val wCnt = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val mk = s
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("n_types", count(lit(1)).over(wCnt))
      .filter(col("__rn") <=
        expr(s"greatest(1, (n_types * $kNumer + ${kDenom - 1}) div $kDenom)"))
      .groupBy(col("id"))
      .agg(max(col("n_types")).as("n_types"),
        count(lit(1)).as("k_types"),
        expr("sum(__occ) div count(1)").as("min_k_micro"))
    docs.select(col(idCol).as("id"))
      .join(mk, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("k_types"), lit(0L)).as("k_types"),
        coalesce(col("min_k_micro"), lit(0L)).as("min_k_micro"))
  }

  /** The per-doc trigram relation both the inline scorer and the
    * train/serve split explode exactly once: (id, trigram, its two
    * bigrams, middle and last word). */
  private def trigramRelation(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 3)
      .select(col(idCol).as("id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 3),
        i => struct(
          concat_ws(" ", element_at(col("__w"), i + 1),
            element_at(col("__w"), i + 2),
            element_at(col("__w"), i + 3)).as("t"),
          concat_ws(" ", element_at(col("__w"), i + 1),
            element_at(col("__w"), i + 2)).as("b12"),
          concat_ws(" ", element_at(col("__w"), i + 2),
            element_at(col("__w"), i + 3)).as("b23"),
          element_at(col("__w"), i + 2).as("w2"),
          element_at(col("__w"), i + 3).as("w3"))))
        .as("__p"))
      .select(col("id"), col("__p.t").as("t"), col("__p.b12").as("b12"),
        col("__p.b23").as("b23"), col("__p.w2").as("w2"), col("__p.w3").as("w3"))

  /** Train the trigram-LM count relations on a (bounded or full) corpus
    * slice — the KenLM count-file step, one exploded pass, three
    * distinct-n-gram-sized relations out: (t, b12) → c3, (b23, w2) → c23,
    * w3 → c1. Everything the serve pass needs (context marginals, N, V)
    * derives from these three by summation, so they ARE the model —
    * persist them via [[graft.sources.Artifacts.saveLmCounts]] and score
    * any corpus anywhere ([[scoreTrigramCounts]]) without touching the
    * training corpus again. */
  def trainTrigramCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val dt = trigramRelation(docs, idCol, textCol)
      .groupBy(col("id"), col("t"), col("b12"), col("b23"),
        col("w2"), col("w3"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    (dt.groupBy(col("t"), col("b12")).agg(sum(col("n")).as("c3")),
      dt.groupBy(col("b23"), col("w2")).agg(sum(col("n")).as("c23")),
      dt.groupBy(col("w3")).agg(sum(col("n")).as("c1")))
  }

  /** Serve a trained trigram LM over ANY corpus — the score-everywhere
    * half of the train-once split. Same interpolated-backoff formula as
    * [[trigramLmScore]], but counts come from the (loaded) model
    * relations, joined LEFT so n-grams the model never saw score at
    * their Laplace floor (count 0 → (0+1) numerator) instead of
    * dropping out — the correct open-vocabulary behavior.
    *
    * Scale shape: context marginals and the (N, V) one-row broadcast
    * are re-derived from the count relations (model-sized, not
    * corpus-sized); the serve corpus is exploded once and scored by
    * vocabulary-keyed equi-joins — identical join plan to the inline
    * scorer, with the model side typically much smaller than the
    * serve corpus. */
  def scoreTrigramCounts(docs: DataFrame, c3: DataFrame, c23: DataFrame,
      c1: DataFrame, unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ctx2 = c3.groupBy(col("b12")).agg(sum(col("c3")).as("ctx2"))
    val ctx1 = c23.groupBy(col("w2")).agg(sum(col("c23")).as("ctx1"))
    val nv = c1.agg(sum(col("c1")).as("__n"), count(lit(1)).as("__v"))
    val dt = trigramRelation(docs, idCol, textCol)
      .groupBy(col("id"), col("t"), col("b12"), col("b23"),
        col("w2"), col("w3"))
      .agg(count(lit(1)).as("n"))
    val scored = dt
      .join(c3.select(col("t"), col("c3")), Seq("t"), "left")
      .join(ctx2, Seq("b12"), "left")
      .join(c23.select(col("b23"), col("c23")), Seq("b23"), "left")
      .join(ctx1, Seq("w2"), "left")
      .join(c1, Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("__c3", coalesce(col("c3"), lit(0L)))
      .withColumn("__x2", coalesce(col("ctx2"), lit(0L)))
      .withColumn("__c23", coalesce(col("c23"), lit(0L)))
      .withColumn("__x1", coalesce(col("ctx1"), lit(0L)))
      .withColumn("__c1", coalesce(col("c1"), lit(0L)))
      .withColumn("__p3", expr(s"($unit * (__c3 + 1)) div (__x2 + __v)"))
      .withColumn("__p2", expr(s"($unit * (__c23 + 1)) div (__x1 + __v)"))
      .withColumn("__p1", expr(s"($unit * (__c1 + 1)) div (__n + __v)"))
      .withColumn("__s", expr("(4 * __p3 + 2 * __p2 + __p1) div 7"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_trigrams"),
        expr("sum(n * __s) div sum(n)").as("lm3_micro"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lm3_micro"), lit(0L)).as("lm3_micro"))
  }

  /** PMI collocation mining — the phrase detector of training-data
    * pipelines (word2vec's phrase pass, "new york" → one token;
    * Mikolov et al. 2013, arXiv:1310.4546): adjacent word pairs whose
    * joint frequency beats the independence expectation. The score is
    * the PMI *ratio* in exact integer micro-units,
    * ratio_micro = (N·c₁₂·10⁶) div (c₁·c₂), where c₁₂ is the pair
    * count, c₁/c₂ the left/right bigram-position marginals, and
    * N = Σc₁₂ — the monotone transform of PMI = log(ratio) with the
    * log dropped (transcendentals aren't bit-portable across engines;
    * the ranking is identical). `minCount` suppresses the
    * singleton-pair artifact (two hapax words always score N·10⁶).
    *
    * Scale shape: ONE corpus explode produces the pair relation; the
    * (w1,w2) counts are distinct-bigram-sized and localCheckpoint'ed so
    * both marginals and N derive from the materialized counts, not a
    * corpus re-explode per consumer (the LM-count discipline). Scoring
    * is two vocabulary-sized equi-joins plus a broadcast one-row N;
    * top-k is per-task heaps (TakeOrderedAndProject). Overflow
    * envelope: N·c₁₂·10⁶ must stay below 2⁶³ — holds to N·c₁₂ ≤ 9·10¹²;
    * beyond that, downshift the unit or pre-scale counts per-mille. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, k: Int = 100,
      textCol: String = "text"): DataFrame = {
    val pairs = docs
      .withColumn("__w", split(Dedup.normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => struct(element_at(col("__w"), i + 1).as("w1"),
          element_at(col("__w"), i + 2).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val c12 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("__n"))
    c12.filter(col("c12") >= minCount)
      .join(c1, Seq("w1"))
      .join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        expr("(__n * c12 * 1000000) div (c1 * c2)").as("pmi_ratio_micro"))
      .orderBy(col("pmi_ratio_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Two-sample χ² homogeneity drift between corpus slices — the
    * distribution monitor a pipeline runs between snapshots, sources or
    * filter stages: per word, the χ² contribution of the (slice A,
    * slice B) occurrence split against the pooled expectation, in exact
    * integer micro-units. Per-word total in closed form:
    * χ²_w = (o_A·N_B − o_B·N_A)²·(N_A+N_B) / (N_A·N_B·(o_A+o_B)),
    * identical slices ⇒ 0 for every word; words private to one slice
    * rank by their mass. Exactly rational — no transcendentals, so the
    * statistic replays bit-identically in any SQL engine (a KL/G-test
    * needs logs; Pearson χ² keeps the same ranking for drift triage).
    *
    * Shape: one vocabulary-sized count relation per slice (map-side
    * combined), full outer join on word (absent ⇒ 0), slice totals ride
    * as a broadcast one-row aggregate, top-k by (χ², word) is per-task
    * heaps. Overflow envelope (DECIMAL(38,0) intermediates):
    * (o·N)²·(N_A+N_B)·10⁶ < 10³⁸ holds while o·N < 10¹⁵·√(N_A+N_B) —
    * beyond that, pre-scale counts per-mille before calling. */
  def corpusDriftChisq(a: DataFrame, b: DataFrame, k: Int,
      unit: Long = 1000000L, textCol: String = "text"): DataFrame = {
    def wordCounts(df: DataFrame, cnt: String) = df
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as(cnt))
    val ca = wordCounts(a, "o_a")
    val cb = wordCounts(b, "o_b")
    // checkpointed: both the totals aggregate and the scoring pass read
    // this vocabulary-sized relation — one materialization, not two
    // corpus re-explodes (same discipline as the LM count relations)
    val joined = ca.join(cb, Seq("word"), "full_outer")
      .select(col("word"),
        coalesce(col("o_a"), lit(0L)).as("o_a"),
        coalesce(col("o_b"), lit(0L)).as("o_b"))
      .localCheckpoint()
    val totals = joined
      .agg(sum(col("o_a")).as("__na"), sum(col("o_b")).as("__nb"))
    joined.crossJoin(broadcast(totals))
      // every operand casts to DECIMAL(38,0) BEFORE its first multiply —
      // o·N alone can pass 2^63 inside the envelope
      .withColumn("__d", expr(
        "CAST(o_a AS DECIMAL(38,0)) * CAST(__nb AS DECIMAL(38,0)) - " +
          "CAST(o_b AS DECIMAL(38,0)) * CAST(__na AS DECIMAL(38,0))"))
      .withColumn("chi2_micro", expr(
        s"CAST($unit AS DECIMAL(38,0)) * __d * __d * " +
          "CAST(__na + __nb AS DECIMAL(38,0)) div " +
          "(CAST(__na AS DECIMAL(38,0)) * CAST(__nb AS DECIMAL(38,0)) * " +
          "CAST(o_a + o_b AS DECIMAL(38,0)))"))
      .select(col("word"), col("o_a"), col("o_b"), col("chi2_micro"))
      .orderBy(col("chi2_micro").desc, col("word"))
      .limit(k)
  }

  /** Per-document top-k salient terms by tf·idf with a LINEAR idf
    * (idf = N/df, not ln(N/df)): ln() is transcendental and only
    * 1-ulp-accurate (Java Math.log vs a C libm disagree), while integer
    * ratios under IEEE division are correctly rounded everywhere — the
    * ranking keeps tf·idf's monotonicity (increasing in tf, decreasing in
    * df) and the scores are bit-reproducible across engines. Ties resolve
    * by term, so the top-k is total-order deterministic.
    *
    * Shape: (doc, term) tf counts (one shuffle, map-side combined), term
    * df derived FROM the tf relation (vocabulary-sized, not corpus-
    * sized), joined back on term, then a per-doc top-k window. The
    * corpus size N rides the same job as a broadcast one-row aggregate
    * (a column-less count — parquet answers it from row-group metadata)
    * instead of a separate driver-side count() action. */
  def tfidfTopK(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n_docs"))
    val tf = explodedWords(docs, idCol, textCol)
      .groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("w"))
    tf.join(df, Seq("w"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * (col("__n_docs") / col("df")), 6))
      .drop("__n_docs")
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("w").as("term"),
        col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Flesch reading-ease and Flesch–Kincaid grade level in exact integer
    * milli-units (readability filtering, the classic C4/Gopher-adjacent
    * quality gate). Classic heuristics, made engine-exact:
    *
    *   - words      = non-empty normalized tokens, clamped ≥ 1
    *   - sentences  = `[.!?]+` runs in the RAW text, clamped ≥ 1
    *   - syllables  = `[aeiouy]+` vowel runs in the normalized text,
    *                  plus 1 for every vowel-less word (the standard
    *                  "every word has at least one syllable" floor)
    *
    * FRE  = 206.835 − 1.015·(W/S) − 84.6·(SY/W)
    * FKGL = 0.39·(W/S) + 11.8·(SY/W) − 15.59
    *
    * Both are evaluated over the common denominator S·W as ONE integer
    * `div` in milli-units (engine-portable: `div` / `//` agree for
    * non-negative operands — negative scores clamp to 0, the usual
    * "hardest texts" floor of the 0–100 FRE scale).
    *
    * Scale shape: map-only (narrow, codegen'd regex counting — no
    * shuffle, no explode); the vowel-less-word count rides the same
    * whole-string regex pass (`[^ ]*[aeiouy][^ ]*` matches exactly the
    * words containing a vowel — a match cannot span the space
    * delimiter), not a per-element lambda. */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val norm = Dedup.normalize(col(textCol))
    docs
      .select(col(idCol),
        when(norm === "", 0L)
          .otherwise(size(split(norm, " ")).cast("long")).as("__w0"),
        size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
          .cast("long").as("__s0"),
        size(regexp_extract_all(norm, lit("[aeiouy]+"), lit(0)))
          .cast("long").as("__vruns"),
        size(regexp_extract_all(norm, lit("[^ ]*[aeiouy][^ ]*"), lit(0)))
          .cast("long").as("__wvowel"))
      .select(col(idCol),
        greatest(col("__w0"), lit(1L)).as("words"),
        greatest(col("__s0"), lit(1L)).as("sentences"),
        (col("__vruns") + greatest(col("__w0"), lit(1L)) - col("__wvowel"))
          .as("syllables"))
      .withColumn("fre_milli", greatest(lit(0L), expr(
        """(206835 * sentences * words - 1015 * words * words
          | - 84600 * syllables * sentences) div (sentences * words)"""
          .stripMargin)))
      .withColumn("fkgl_milli", greatest(lit(0L), expr(
        """(390 * words * words + 11800 * syllables * sentences
          | - 15590 * sentences * words) div (sentences * words)"""
          .stripMargin)))
  }

  /** Heaps-law vocabulary-growth curve: for each ingestion-order bucket
    * of `bucketDocs` documents, how many corpus-new bigrams that bucket
    * introduces and the cumulative vocabulary size up to it — the
    * saturation diagnostic for "is more data still adding anything?"
    * (bigrams rather than unigrams so small vocabularies don't saturate
    * in the first bucket). First occurrence is attributed to the MINIMUM
    * doc id containing the bigram, so the curve is deterministic and
    * partition-invariant.
    *
    * Scale shape: corpus → exploded bigrams → one (gram, min id)
    * aggregation (vocabulary-sized output, map-side combined), bucketed
    * by integer division; the cumulative column comes from a TRIANGULAR
    * SELF-JOIN of the tiny per-bucket relation (the [[QualityModel
    * .prCurve]] discipline) — never a global window, so nothing funnels
    * into one task. Buckets that introduce nothing still appear (doc
    * buckets left-join the new-gram counts), so the curve has no holes. */
  def vocabGrowth(docs: DataFrame, bucketDocs: Long = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bucketDocs > 0, "bucketDocs must be positive")
    val grams = docs
      .select(col(idCol).cast("long").as("__id"),
        split(Dedup.normalize(col(textCol)), " ").as("__w"))
      .select(col("__id"), explode(expr(
        """filter(zip_with(__w, slice(__w, 2, size(__w)),
          | (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"""
          .stripMargin)).as("gram"))
      .filter(col("gram") =!= " ")
    val newPerBucket = grams
      .groupBy(col("gram")).agg(min(col("__id")).as("__first"))
      .groupBy(expr(s"__first div $bucketDocs").as("bucket"))
      .agg(count(lit(1)).as("new_grams"))
    val buckets = docs
      .groupBy(expr(s"CAST($idCol AS BIGINT) div $bucketDocs").as("bucket"))
      .agg(count(lit(1)).as("docs_n"))
      .join(newPerBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("docs_n"),
        coalesce(col("new_grams"), lit(0L)).as("new_grams"))
      .localCheckpoint()
    buckets.alias("a")
      .join(buckets.alias("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(min(col("a.docs_n")).as("docs_n"),
        min(col("a.new_grams")).as("new_grams"),
        sum(col("b.new_grams")).as("cum_vocab"))
  }

  /** HTML → text extraction — the first stage of every web-corpus
    * pipeline (the trafilatura/jusText problem in its deterministic
    * regex core): drop script/style payloads and comments, strip tags,
    * decode the common entities, collapse whitespace. A pure
    * codegen'd expression chain (RE2-compatible patterns — inline
    * (?is) flags and non-greedy spans only, no lookarounds), so it
    * runs map-side at any scale AND replays verbatim in the oracle's
    * regexp_replace chain. Entity decode order is fixed and `&amp;`
    * decodes LAST, so "&amp;lt;" yields "&lt;" (the standard
    * double-escape behavior), identically in both engines.
    *
    * Deliberately structural-only: readability-class content extraction
    * (link-density scoring, main-content detection) layers on top of
    * this kernel; the 100 TB property — one narrow map stage, no parse
    * tree, no UDF — lives here. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => regexp_replace(c, k, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document novelty share — the per-doc face of [[vocabGrowth]]'s
    * corpus curve (the curriculum / data-ordering signal: which docs
    * still contribute unseen content?): for each document, the fraction
    * of its DISTINCT word bigrams whose corpus-wide first occurrence is
    * this document, in integer micro-units. First occurrence is
    * attributed to the MINIMUM doc id containing the bigram (the
    * vocabGrowth convention), so the score is deterministic and
    * partition-invariant. Every input doc gets a row — gram-less docs
    * (< 2 words) come back with zeros via the left back-join.
    *
    * Scale shape: exploded bigrams → one distinct (doc, gram) combine-
    * agg → the vocabulary-sized (gram, min id) relation → join back on
    * gram (re-uses the gram partitioning) → one per-doc count agg. No
    * window, nothing pairwise. */
  def docNovelty(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docGram = docs
      .select(col(idCol).cast("long").as("__id"),
        split(Dedup.normalize(col(textCol)), " ").as("__w"))
      .select(col("__id"), explode(expr(
        """filter(zip_with(__w, slice(__w, 2, size(__w)),
          | (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"""
          .stripMargin)).as("gram"))
      .filter(col("gram") =!= " ")
      .distinct()
    val first = docGram.groupBy(col("gram")).agg(min(col("__id")).as("__first"))
    val perDoc = docGram.join(first, Seq("gram"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select(col(idCol).cast("long").as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_micro",
        expr("(1000000 * n_novel) div greatest(n_grams, 1)"))
  }

  /** All vocabulary word pairs within edit distance 1 (typo clustering /
    * vocab normalization), via the FastSS deletion-neighborhood trick
    * (Bocek, Hunt, Stiller, "Fast Similarity Search in Large
    * Dictionaries", Univ. of Zurich TR ifi-2007.02; the same family as
    * SymSpell): two words are within one edit iff their depth-1 deletion
    * neighborhoods intersect (substitution: delete the differing char
    * from both; insert/delete: delete the extra char from the longer), so
    * candidates come from an EQUI-join on deletion variants — never a
    * vocabulary cross product — and a final `levenshtein ≤ 1` filter
    * discards the distance-2 survivors the neighborhoods admit (e.g.
    * "xa"/"ay" share variant "a"). The result is EXACT: completeness is
    * the FastSS theorem, precision is the verify filter.
    *
    * 100 TB shape: the corpus collapses to its vocabulary (the same
    * combine-agg distinct the df relations use) before anything
    * pairwise; each word fans out to ≤ maxLen+1 variant keys; variant
    * buckets are alphabet-bounded (a key of length L is reachable only
    * from its ≤ |Σ|·(L+1) single-insertion parents and itself), so no
    * hot-bucket cap is needed — the join is structurally skew-proof. */
  def fuzzyVocabPairs(docs: DataFrame, textCol: String = "text",
      minLen: Int = 2, maxLen: Int = 24): DataFrame = {
    val vocab = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")).between(minLen, maxLen))
      .distinct()
    val keyed = vocab.select(col("w"), explode(array_distinct(concat(
      array(col("w")),
      expr("transform(sequence(1, char_length(w)), " +
        "i -> concat(substr(w, 1, i-1), substr(w, i+1, char_length(w))))"))))
      .as("k"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
  }

  /** BM25 top-k retrieval over the corpus (Robertson & Walker, Okapi
    * BM25; Robertson & Zaragoza 2009 survey) — the lexical-retrieval
    * scorer of RAG / training-data search pipelines, in an exactly
    * rational form so the full ranking replays bit-identically in any
    * SQL engine.
    *
    * Standard BM25 with k₁ = 1.2, b = 0.75 is, per query term,
    *   idf(t) · tf·(k₁+1) / (tf + k₁·(1−b) + k₁·b·dl/avgdl).
    * Two transcendental-free substitutions keep it integer-exact:
    *  - idf's log is dropped, keeping its monotone rational argument
    *    (the Robertson–Spärck Jones odds (N−df+½)/(df+½), doubled to
    *    clear the halves): idf_micro = unit·(2(N−df)+1) div (2df+1) —
    *    the same log-free trick [[pmiCollocations]] uses; per-term
    *    ordering is unchanged.
    *  - avgdl = L/N stays a ratio: multiplying the tf quotient through
    *    by 10·L makes every operand integral:
    *    tf_micro = unit·22·tf·L div (10·tf·L + 3·L + 9·dl·N).
    * Per (doc, term): (idf_micro · tf_micro) div unit; per doc the sum
    * over matched query terms; top-k by (score desc, id) — total order,
    * so the LIMIT boundary is engine-stable.
    *
    * 100 TB shape: one corpus tokenize pass feeds both the per-doc
    * length relation (map-side-combined count) and the tf relation —
    * which the `isin(terms)` filter shrinks to query-matching rows
    * BEFORE its shuffle; df and the (L, N) totals are query-sized /
    * one-row broadcasts; the final top-k is a TakeOrderedAndProject
    * (per-task heaps, no global sort). Overflow envelope: the binding
    * long constraint is tf_micro's unit·22·tf·L term, tf·L ≲ 4·10¹¹ —
    * beyond that, serve from DECIMAL(38,0) or pre-reduced per-shard
    * (tf, dl) relations. The per-term product __idf·__tfp is NOT long
    * arithmetic: with df=1, idf ≈ 0.67·unit·N and tfp tops out at
    * 2.2·unit, so the product wraps a long around N ≈ 6·10⁶ docs — it
    * is therefore computed in DECIMAL(38,0) (HUGEINT in the oracle),
    * which carries it exactly to N ~ 10¹⁸ before the div-unit brings
    * the per-term score back into long range. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 50,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    val dl = words.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(sum(col("dl")).as("L"), count(lit(1)).as("N"))
    val tf = words.filter(col("w").isin(terms: _*))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("id"))
      .join(broadcast(dfRel), Seq("w"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf", expr(s"($unit * (2*(N - df) + 1)) div (2*df + 1)"))
      .withColumn("__tfp",
        expr(s"($unit * 22 * tf * L) div (10*tf*L + 3*L + 9*dl*N)"))
      .withColumn("__s", expr("(CAST(__idf AS DECIMAL(38,0)) * " +
        s"CAST(__tfp AS DECIMAL(38,0))) div $unit"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__s")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("n_terms"), col("bm25_micro"))
  }

  /** BM25 retrieval for a SET of queries — the batch-retrieval form a
    * real RAG / data-search pipeline runs (score N queries against the
    * corpus in one pass), where [[bm25TopK]] is the single-query
    * primitive. `queries` carries (query_id, terms array).
    *
    * Same rational scoring as [[bm25TopK]] (scaladoc there, overflow
    * envelope included). The multi-query shape: the distinct term
    * vocabulary across ALL queries gates the tf relation with a
    * broadcast semi-join BEFORE its shuffle (one corpus pass no matter
    * how many queries); per-corpus df comes from that same tf relation;
    * the (term → query) fan-out is a broadcast equi-join of
    * query-catalog size; and top-k is a per-query window — partitioned
    * by query_id, never global, so adding queries adds partitions, not
    * sort depth. */
  def bm25MultiQuery(docs: DataFrame, queries: DataFrame, k: Int = 10,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text", qidCol: String = "query_id",
      termsCol: String = "terms",
      wordsOpt: Option[DataFrame] = None): DataFrame = {
    val qt = queries.select(col(qidCol).as("qid"),
      explode(col(termsCol)).as("w")).distinct()
    // wordsOpt: a pre-tokenized (id, w) relation — lets a hybrid
    // retriever share ONE corpus tokenize pass across its legs
    val words = wordsOpt.getOrElse(docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= ""))
    val dl = words.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(sum(col("dl")).as("L"), count(lit(1)).as("N"))
    val tf = words
      .join(broadcast(qt.select(col("w")).distinct()), Seq("w"), "leftsemi")
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qt), Seq("w"))
      .join(dl, Seq("id"))
      .join(broadcast(dfRel), Seq("w"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf", expr(s"($unit * (2*(N - df) + 1)) div (2*df + 1)"))
      .withColumn("__tfp",
        expr(s"($unit * 22 * tf * L) div (10*tf*L + 3*L + 9*dl*N)"))
      .withColumn("__s", expr("(CAST(__idf AS DECIMAL(38,0)) * " +
        s"CAST(__tfp AS DECIMAL(38,0))) div $unit"))
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__s")).as("bm25_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("bm25_micro").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid").as(qidCol), col("id").as(idCol), col("rk"),
        col("n_terms"), col("bm25_micro"))
  }

  /** The Dirichlet-QL log argument c(w,d)·NT + μ·cf with its Long
    * envelope ENFORCED in-plan (ADVICE r15): log2Micro accepts
    * [1, 2^62), and at NT ≈ 2·10¹³ collection tokens a document with
    * c(w,d) ≳ 2.3·10⁵ would push c·NT past it — and past 2^63 the
    * non-ANSI product would wrap BEFORE the kernel's own require
    * fires. Both factors are held ≤ 2^61 (sum < 2^62), loudly —
    * [[logLogFit]]'s raise_error discipline. Evaluated only on
    * query-vocabulary-matched tf rows, never the corpus token stream. */
  private def qlLogArg(c: String, mu: Long): Column = expr(
    s"""CASE WHEN $c > ${1L << 61}L div NT OR ${mu}L * cf > ${1L << 61}L
       |  THEN raise_error(concat('dirichletQl: c(w,d)=',
       |    CAST($c AS STRING), ', NT=', CAST(NT AS STRING), ', mu*cf=',
       |    CAST(${mu}L * cf AS STRING), ' — c*NT + mu*cf outside ',
       |    'the log2Micro [1, 2^62) envelope'))
       |  ELSE $c * NT + ${mu}L * cf END""".stripMargin)

  /** The per-document length penalty argument (dl + μ)·NT under the
    * same loud ≤ 2^61-per-factor envelope as [[qlLogArg]] (a 2.3·10⁵-
    * token document at NT ≈ 2·10¹³ sits at the boundary). */
  private def qlLenArg(mu: Long): Column = expr(
    s"""CASE WHEN dl + ${mu}L > ${1L << 61}L div NT
       |  THEN raise_error(concat('dirichletQl: dl=', CAST(dl AS STRING),
       |    ', NT=', CAST(NT AS STRING),
       |    ' — (dl + mu)*NT outside the log2Micro [1, 2^62) envelope'))
       |  ELSE (dl + ${mu}L) * NT END""".stripMargin)

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
    * SIGIR 2001 — the language-modeling IR scorer next to
    * [[bm25MultiQuery]]'s probabilistic one):
    *
    *   score(q, d) = Σ_{w∈q} c(w,q) · log₂ (c(w,d)·NT + μ·cf_w)
    *                                       ⁄ ((dl_d + μ)·NT)
    *
    * in exact micro bits (numerator/denominator logs via the shared
    * fixed-point kernel — both are positive integers, so no ratio ever
    * needs representing). The standard sparse decomposition keeps the
    * corpus pass inverted-index-shaped:
    *
    *   score = Σ_match c(w,q)·(lg(c·NT + μ·cf) − lg(μ·cf))   [sparse]
    *         + Σ_{w∈q} c(w,q)·lg(μ·cf_w)                     [per query]
    *         − |q| · lg((dl_d + μ)·NT)                       [per doc]
    *
    * so missing query terms contribute their smoothed collection mass
    * without ever materializing the dense |docs|×|queries| relation.
    * Query terms absent from the collection (cf = 0) are dropped: they
    * shift every document's score by the same −∞ and rank nothing
    * (p(w|C) = 0 makes the model itself undefined on them). Only
    * documents matching ≥ 1 query term are ranked — the inverted-index
    * retrieval convention shared with BM25.
    *
    * 100 TB shape: identical to [[bm25MultiQuery]] — one corpus
    * tokenize pass, the query vocabulary gates tf below its shuffle via
    * a broadcast semi-join, cf/df/query constants are catalog-sized
    * broadcasts, top-k is a per-query window. */
  def dirichletQlMultiQuery(docs: DataFrame, queries: DataFrame,
      k: Int = 10, mu: Long = 100L, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", termsCol: String = "terms",
      wordsOpt: Option[DataFrame] = None,
      dlOpt: Option[DataFrame] = None): DataFrame = {
    require(mu >= 1L, "mu must be positive")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val qt = queries.select(col(qidCol).as("qid"),
        explode(col(termsCol)).as("w"))
      .groupBy(col("qid"), col("w")).agg(count(lit(1)).as("cq"))
    val words = wordsOpt.getOrElse(docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= ""))
    // dlOpt: a pre-built (id, dl) length relation — the RM3 loop
    // computes it once and shares it across both retrieval rounds
    val dl = dlOpt.getOrElse(
      words.groupBy(col("id")).agg(count(lit(1)).as("dl")))
    val nt = dl.agg(sum(col("dl")).as("NT"))
    val tf = words
      .join(broadcast(qt.select(col("w")).distinct()), Seq("w"), "leftsemi")
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    // collection frequency of query-vocabulary terms only (cf = 0 terms
    // never join and are thereby dropped, per the scaladoc). Kept as its
    // own gated pass over the token stream: deriving it from tf
    // (cf = Σ_d c) funnels the narrow map-side count through the wider
    // (id, w) aggregation — measured slower at sf0.1 (2.5 → 3.7 s),
    // and the exchange-reuse that would amortize it does not fire
    // across the broadcast boundary.
    val cf = words
      .join(broadcast(qt.select(col("w")).distinct()), Seq("w"), "leftsemi")
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
    // per-query constants over collection-present terms
    val qconst = qt.join(broadcast(cf), Seq("w"))
      .withColumn("__lmc", lg(expr(s"${mu}L * cf")))
      .groupBy(col("qid"))
      .agg(sum(col("cq") * col("__lmc")).as("__qc"),
        sum(col("cq")).as("__qlen"))
    val sparse = tf
      .join(broadcast(qt), Seq("w"))
      .join(broadcast(cf), Seq("w"))
      .crossJoin(broadcast(nt))
      .withColumn("__s", col("cq") *
        (lg(qlLogArg("c", mu)) - lg(expr(s"${mu}L * cf"))))
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("__s")).as("__sm"))
    val scored = sparse
      .join(dl, Seq("id"))
      .join(broadcast(qconst), Seq("qid"))
      .crossJoin(broadcast(nt))
      .withColumn("ql_micro", col("__sm") + col("__qc") -
        col("__qlen") * lg(qlLenArg(mu)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("ql_micro").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid").as(qidCol), col("id").as(idCol), col("rk"),
        col("n_matched"), col("ql_micro"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft SIGIR 2001
    * relevance models; RM3 = the Abdul-Jaleel et al. TREC'04
    * interpolation with the original query) on top of
    * [[dirichletQlMultiQuery]]: retrieve the top-`kDocs` feedback
    * documents per query, weight each by its normalized query
    * likelihood, build the relevance model over the feedback docs'
    * terms, and interpolate with the query MLE —
    *
    *   w_d    = 2^((ql_d − max_d ql)/10⁶)            (exp2Micro; the
    *            constant shift cancels in the normalization, and keeps
    *            the exponent inside the kernel's envelope)
    *   RM1(w) = ⌊Σ_d w_d·p(w|d) / Σ_d w_d⌋           (p(w|d) = MLE
    *            ⌊10⁶·c/dl⌋ — the standard feedback-model choice)
    *   RM3(w) = ⌊(λ·p(w|q) + (10⁶−λ)·RM1(w)) / 10⁶⌋  (p(w|q) = query
    *            MLE)
    *
    * all exact integers, so the expansion-term ranking replays
    * bit-for-bit. Output: top-`mTerms` terms per query by (RM3 desc,
    * term) with rm1/rm3 micro weights and an is_original flag — the
    * expanded-query definition a second retrieval round would consume.
    *
    * 100 TB shape: the feedback set is kDocs·|queries| rows (top-k via
    * a per-query window over the retrieval relation); its term relation
    * is feedback-sized, never corpus-sized — the only corpus-wide work
    * is the underlying retrieval pass, shared machinery with
    * [[dirichletQlMultiQuery]]. */
  def rm3ExpansionTerms(docs: DataFrame, queries: DataFrame,
      kDocs: Int = 5, mTerms: Int = 10, mu: Long = 100L,
      lambdaMicro: Long = 500000L, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", termsCol: String = "terms",
      dlOpt: Option[DataFrame] = None): DataFrame = {
    require(lambdaMicro >= 0L && lambdaMicro <= unit, "lambda in [0, unit]")
    val e2 = graft.functions.VectorFunctions.exp2_micro _
    val top = dirichletQlMultiQuery(docs, queries, kDocs, mu, unit,
        idCol, textCol, qidCol, termsCol, dlOpt = dlOpt)
      .select(col(qidCol).as("qid"), col(idCol).as("id"), col("ql_micro"))
      .localCheckpoint(false) // kDocs·|queries| rows; weights + terms
    val mx = top.groupBy(col("qid")).agg(max(col("ql_micro")).as("__mx"))
    val wts = top.join(broadcast(mx), Seq("qid"))
      .withColumn("__wd",
        e2(greatest(col("ql_micro") - col("__mx"), lit(-64L * unit))))
      .select(col("qid"), col("id"), col("__wd"))
    val swd = wts.groupBy(col("qid")).agg(sum(col("__wd")).as("__swd"))
    // feedback-doc term MLEs: tokenize ONLY the selected docs
    val fwords = docs
      .join(broadcast(top.select(col("id")).distinct()
        .withColumnRenamed("id", idCol)), Seq(idCol), "leftsemi")
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    val fdl = fwords.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val pw = fwords.groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
      .join(fdl, Seq("id"))
      .withColumn("__p", expr(s"($unit * c) div dl"))
    val rm1 = pw.join(broadcast(wts), Seq("id"))
      .groupBy(col("qid"), col("w"))
      .agg(sum(expr(s"CAST(__wd AS DECIMAL(38,0)) * __p")).as("__num"))
      .join(broadcast(swd), Seq("qid"))
      .withColumn("rm1_micro", expr("CAST(__num div __swd AS BIGINT)"))
      .select(col("qid"), col("w"), col("rm1_micro"))
    val qmle = queries.select(col(qidCol).as("qid"),
        explode(col(termsCol)).as("w"))
      .groupBy(col("qid"), col("w")).agg(count(lit(1)).as("cq"))
      .withColumn("__qlen", sum(col("cq")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))))
      .withColumn("qp_micro", expr(s"($unit * cq) div __qlen"))
      .select(col("qid"), col("w"), col("qp_micro"))
    val rm3 = rm1.join(qmle, Seq("qid", "w"), "full_outer")
      .withColumn("rm1_micro", coalesce(col("rm1_micro"), lit(0L)))
      .withColumn("qp_micro", coalesce(col("qp_micro"), lit(0L)))
      .withColumn("rm3_micro", expr(
        s"($lambdaMicro * qp_micro + ($unit - $lambdaMicro) * rm1_micro)" +
          s" div $unit"))
      .withColumn("is_original", col("qp_micro") > 0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("rm3_micro").desc, col("w"))
    rm3.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= mTerms)
      .select(col("qid").as(qidCol), col("rk"), col("w").as("term"),
        col("rm1_micro"), col("rm3_micro"), col("is_original"))
  }

  /** The second retrieval round of the RM3 loop: score the corpus with
    * the EXPANDED query — [[rm3ExpansionTerms]]' weighted term set fed
    * back through the Dirichlet query-likelihood scorer, with the
    * integer query-term counts generalized to micro weights:
    *
    *   score = Σ_w wμ(w) · log₂ (c(w,d)·NT + μ·cf_w) ⁄ ((dl_d + μ)·NT)
    *
    * via the same sparse decomposition as [[dirichletQlMultiQuery]]
    * (matched delta + per-query constant − Σwμ · per-doc length
    * penalty), one sign-split division by `unit` at the end (weights ×
    * logs live at micro² scale; a per-term floor would compound).
    * Expansion terms with cf = 0 are dropped at scoring exactly like
    * original cf = 0 terms — the same uniform-shift argument.
    *
    * 100 TB shape: expansion is feedback-sized; the scoring pass is
    * the [[dirichletQlMultiQuery]] exchange shape verbatim (one corpus
    * tokenize, tf gated below its shuffle by the broadcast expanded
    * vocabulary, per-query top-k window). */
  def rm3Retrieve(docs: DataFrame, queries: DataFrame, kDocs: Int = 5,
      mTerms: Int = 10, kFinal: Int = 10, mu: Long = 100L,
      lambdaMicro: Long = 500000L, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", termsCol: String = "terms"): DataFrame = {
    val lg = graft.functions.VectorFunctions.log2_micro _
    val words = docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    // doc-length relation computed ONCE and shared by BOTH retrieval
    // rounds (lazy checkpoint; |docs|-sized, the table a production
    // retriever keeps materialized) — the r15 form re-tokenized the
    // corpus for dl in each round
    val dl = words.groupBy(col("id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint(false)
    val exp = rm3ExpansionTerms(docs, queries, kDocs, mTerms, mu,
        lambdaMicro, unit, idCol, textCol, qidCol, termsCol,
        dlOpt = Some(dl))
      .filter(col("rm3_micro") > 0L)
      .select(col(qidCol).as("qid"), col("term").as("w"),
        col("rm3_micro").as("wq"))
      .localCheckpoint(false) // mTerms·|queries| rows; vocab + scoring
    val nt = dl.agg(sum(col("dl")).as("NT"))
    val tf = words
      .join(broadcast(exp.select(col("w")).distinct()), Seq("w"), "leftsemi")
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    // cf stays its own gated map-side pass (see dirichletQlMultiQuery:
    // deriving it from tf measured slower)
    val cf = words
      .join(broadcast(exp.select(col("w")).distinct()), Seq("w"), "leftsemi")
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val qconst = exp.join(broadcast(cf), Seq("w"))
      .withColumn("__lmc", lg(expr(s"${mu}L * cf")))
      .groupBy(col("qid"))
      .agg(sum(col("wq") * col("__lmc")).as("__qc"),
        sum(col("wq")).as("__wsum"))
    val sparse = tf
      .join(broadcast(exp), Seq("w"))
      .join(broadcast(cf), Seq("w"))
      .crossJoin(broadcast(nt))
      .withColumn("__s", col("wq") *
        (lg(qlLogArg("c", mu)) - lg(expr(s"${mu}L * cf"))))
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("__s")).as("__sm"))
    val scored = sparse
      .join(dl, Seq("id"))
      .join(broadcast(qconst), Seq("qid"))
      .crossJoin(broadcast(nt))
      .withColumn("__raw", col("__sm") + col("__qc") -
        col("__wsum") * lg(qlLenArg(mu)))
      .withColumn("ql_micro", expr(
        s"""CAST(CASE WHEN __raw >= 0 THEN __raw div $unit
           |  ELSE -((-__raw) div $unit) END AS BIGINT)""".stripMargin))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("ql_micro").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= kFinal)
      .select(col("qid").as(qidCol), col("id").as(idCol), col("rk"),
        col("n_matched"), col("ql_micro"))
  }

  /** Dense-hash cosine retrieval as a SPARSE inverted-index join — the
    * model-free dense leg of a hybrid retriever. Both sides go through
    * [[hashEmbedding]] (signed feature hashing, integer bucket sums);
    * instead of materializing dense arrays and crossing queries with
    * the corpus, the sparse (id, idx, value) relations equi-join on the
    * feature index, exactly like a term-at-a-time inverted index: only
    * documents sharing at least one occupied bucket with a query are
    * ever scored, and the corpus-side relation shuffles once on `idx`
    * regardless of query count.
    *
    * Exactness: all feature values are integer sign-sums, so the dot
    * product and both squared norms are exact longs, and ranking uses
    * the signed squared cosine  sign(dot)·unit·dot² div (‖q‖²·‖d‖²) —
    * a monotone image of cosine that needs no square root. The dot²
    * and norm products are computed in DECIMAL(38,0) (HUGEINT in the
    * oracle): with per-bucket sums bounded by document word count W,
    * dot² ≲ (dim·(W/dim)²)² wraps a long already at W ≈ 2·10⁴ — the
    * decimal path carries it exactly to W ~ 10⁹. Sign is applied
    * OUTSIDE the division so both engines divide non-negative operands
    * (truncating div == flooring //).
    *
    * 100 TB shape: corpus features build in one pass (map-side combined
    * on (id, idx)); the query-side feature/norm relations are
    * query-catalog-sized broadcasts; the per-(query, doc) partial dot
    * aggregates map-side; top-k is a per-query window, never global. */
  /** Sparse hash features from a pre-tokenized (id, w) relation — the
    * shared-scan form of [[hashEmbedding]]'s feature build. */
  private def hashFeaturesFromWords(words: DataFrame, dim: Int): DataFrame =
    words
      .select(col("id"),
        pmod(Dedup.hashStr(col("w"), 31), lit(dim.toLong)).as("idx"),
        (pmod(Dedup.hashStr(col("w"), 47), lit(2L)) * 2L - 1L).as("__sign"))
      .groupBy(col("id"), col("idx"))
      .agg(sum(col("__sign")).as("value"))
      .select(col("id"), col("idx").cast("int").as("idx"), col("value"))

  def hashCosineTopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      dim: Int = 64, unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text", qidCol: String = "query_id",
      qtextCol: String = "qtext",
      wordsOpt: Option[DataFrame] = None): DataFrame = {
    val cf = wordsOpt
      .map(hashFeaturesFromWords(_, dim))
      .getOrElse(hashEmbedding(docs, dim, idCol, textCol)
        .select(col(idCol).as("id"), col("idx"), col("value")))
      .select(col("id"), col("idx"), col("value").as("cv"))
      .localCheckpoint(false) // feeds both the norm agg and the dot join
    val qf = hashEmbedding(queries, dim, qidCol, qtextCol)
      .select(col(qidCol).as("qid"), col("idx"), col("value").as("qv"))
      .localCheckpoint(false)
    val cn = cf.groupBy(col("id")).agg(sum(col("cv") * col("cv")).as("cn2"))
    val qn = qf.groupBy(col("qid")).agg(sum(col("qv") * col("qv")).as("qn2"))
    val dotRel = cf.join(broadcast(qf), Seq("idx"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("qv") * col("cv")).as("dot"))
    val scored = dotRel
      .join(cn, Seq("id"))
      .join(broadcast(qn), Seq("qid"))
      // greatest(·,1): a side whose signed buckets fully cancel has a
      // zero norm WITH feature rows present — its dot is then 0 too, so
      // the clamp only replaces 0/0 (engine-divergent) with an exact 0
      .withColumn("cossq_micro", expr(
        s"""CAST(CASE WHEN dot < 0 THEN
           |  -((CAST($unit AS DECIMAL(38,0)) * dot * dot) div
           |    (CAST(greatest(cn2, 1) AS DECIMAL(38,0)) * greatest(qn2, 1)))
           |ELSE
           |  (CAST($unit AS DECIMAL(38,0)) * dot * dot) div
           |    (CAST(greatest(cn2, 1) AS DECIMAL(38,0)) * greatest(qn2, 1))
           |END AS BIGINT)""".stripMargin))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cossq_micro").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(qidCol), col("id").as(idCol), col("rank"),
        col("dot"), col("cossq_micro"))
  }

  /** Character trigrams of the normalized text (the Cavnar–Trenkle
    * feature space; spaces act as word boundaries like the paper's
    * padding). Texts shorter than 3 chars yield an empty array — the
    * guard matters because `sequence(1, 0)` would otherwise produce a
    * DESCENDING range, not an empty one. */
  private[graft] def charTrigrams(text: Column): Column = {
    val t = Dedup.normalize(text)
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array())
  }

  /** TRAINED language identification via n-gram rank profiles (Cavnar &
    * Trenkle 1994, "N-Gram-Based Text Categorization") — the classic
    * out-of-place measure, complementing the marker-voting [[langGuess]]
    * heuristic with a model learned from a labeled slice:
    *  - per language, the `profileSize` most frequent char trigrams of
    *    the training slice, ranked 1..P by (count desc, gram asc);
    *  - per document, its own top-P trigram ranks the same way;
    *  - distance(doc, lang) = Σ over the doc profile of
    *    |rank_doc − rank_lang|, with the paper's maximum penalty P for
    *    grams absent from the language profile;
    *  - prediction = argmin distance, ties to the lexicographically
    *    first language.
    * Pure integer arithmetic end to end — ranks, penalties, and the
    * argmin are all total-ordered, so the prediction replays
    * bit-identically in any engine.
    *
    * Scale shape: the language profiles are one vocabulary-sized
    * combine-agg + a per-LANGUAGE window (|langs| partitions over a
    * vocabulary-sized relation), collapsing to an |langs|·P-row
    * broadcast; doc profiles are a per-DOC window (partitioned by id,
    * never global); scoring fans each doc-profile row out ×|langs| via
    * a broadcast nested-loop over the distinct-language relation and a
    * broadcast LEFT equi-join against the profile — no corpus × corpus
    * anything, one extra shuffle total (the doc-gram agg). */
  def ctLangPredict(docs: DataFrame, train: DataFrame,
      profileSize: Int = 40, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    require(profileSize > 0, "profileSize must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val langProf = train
      .select(col(langCol).as("__plang"),
        explode(charTrigrams(col(textCol))).as("__pg"))
      .groupBy(col("__plang"), col("__pg")).agg(count(lit(1)).as("__c"))
      .withColumn("__rl", row_number().over(
        W.partitionBy(col("__plang")).orderBy(col("__c").desc, col("__pg"))))
      .filter(col("__rl") <= profileSize)
      .select(col("__plang"), col("__pg"), col("__rl"))
      .localCheckpoint(false) // |langs|·P rows; consumed by langs + join
    val langs = langProf.select(col("__plang").as("__cand")).distinct()
    val docProf = docs
      .select(col(idCol).as("__id"), col(langCol).as("__true"),
        explode(charTrigrams(col(textCol))).as("__g"))
      .groupBy(col("__id"), col("__true"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rd", row_number().over(
        W.partitionBy(col("__id")).orderBy(col("__c").desc, col("__g"))))
      .filter(col("__rd") <= profileSize)
    docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf),
        col("__cand") === col("__plang") && col("__g") === col("__pg"), "left")
      .groupBy(col("__id"), col("__true"), col("__cand"))
      .agg(sum(coalesce(abs(col("__rd") - col("__rl")),
        lit(profileSize.toLong))).as("__dist"))
      .groupBy(col("__id"), col("__true"))
      .agg(min(struct(col("__dist"), col("__cand"))).as("__m"))
      .select(col("__id").as(idCol), col("__true").as(langCol),
        col("__m").getField("__cand").as("pred_lang"),
        col("__m").getField("__dist").as("oop_dist"))
  }

  /** Importance-weighted data selection score — the DSIR / Moore–Lewis
    * family (Xie et al. 2023 "Data Selection for Language Models via
    * Importance Resampling"; Moore & Lewis 2010) in the repo's
    * rational-arithmetic form: score each document by how much its
    * hashed n-gram features look like a TARGET distribution versus the
    * raw pool. Where the papers sum per-feature LOG-likelihood ratios,
    * this sums the Laplace-smoothed ratios themselves in micro-units
    * (the same monotone log-free substitution as [[bm25TopK]]'s idf) and
    * divides by the gram count — per-gram ratio ordering is unchanged,
    * and every step is integer/decimal-exact, so the score replays
    * bit-identically in the oracle.
    *
    * Features are word unigrams + bigrams hashed into `buckets` buckets
    * (DSIR's hashed-ngram feature space, md5-addressed like every other
    * content hash here). Per bucket: ratio_micro =
    * unit·(cT+1)·(NR+B) // ((cR+1)·(NT+B)) — target counts cT over rows
    * matching `targetPred`, raw counts cR over the rest; the products
    * ride DECIMAL(38,0) (long would wrap around corpus sizes ~10⁶).
    * Per doc: (Σ ratio_micro over its grams) div n_grams.
    *
    * Scale shape: gram extraction + bucketing is map-only; the bucket
    * count relation is `buckets` rows (one map-side-combined shuffle,
    * lazily checkpointed for its two consumers); the ratio relation
    * broadcasts back; the per-doc score is ONE combine-agg keyed by id.
    * Nothing anywhere is corpus-pairwise. */
  def ngramImportanceScore(docs: DataFrame, targetPred: Column,
      buckets: Int = 1024, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val grams = docs
      .select(col(idCol).as("__id"), targetPred.as("__t"),
        split(Dedup.normalize(col(textCol)), " ").as("__w"))
      .select(col("__id"), col("__t"), explode(concat(
        filter(col("__w"), w => w =!= ""),
        // zip_with pads the shorter side with null -> concat -> null;
        // the IS NOT NULL filter leaves exactly the n-1 adjacent pairs
        // (normalize guarantees no empty interior words)
        expr("""filter(zip_with(__w, slice(__w, 2, size(__w)),
          | (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"""
          .stripMargin))).as("__g"))
      .filter(col("__g") =!= "")
      .withColumn("__b",
        conv(substring(md5(concat(lit("dsir|"), col("__g"))), 1, 15), 16, 10)
          .cast("long") % buckets)
    val counts = grams
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("cr"))
      .localCheckpoint(false) // ≤ buckets rows; consumed by totals + join
    val totals = counts.agg(sum(col("ct")).as("NT"), sum(col("cr")).as("NR"))
    val ratio = counts.crossJoin(broadcast(totals))
      .select(col("__b"), expr(
        s"""(CAST($unit AS DECIMAL(38,0)) * CAST(ct + 1 AS DECIMAL(38,0))
           |  * CAST(NR + $buckets AS DECIMAL(38,0)))
           | div (CAST(cr + 1 AS DECIMAL(38,0))
           |  * CAST(NT + $buckets AS DECIMAL(38,0)))""".stripMargin)
        .as("__r"))
    grams.join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__r")).as("__sr"))
      .select(col("__id").as(idCol), col("n_grams"),
        expr("__sr div n_grams").cast("long").as("ratio_micro"))
  }

  /** Per-document language-consistency profile from SENTENCE-level
    * language ID: number of sentences, number of adjacent-sentence
    * language switches (code-switching signal), the dominant sentence
    * language and its share in micro-units. A doc-level [[langGuess]]
    * hides mixed-language documents entirely — a half-English,
    * half-German page votes 'en' or 'de' and looks clean; the
    * sentence-level profile exposes it (high switch count, low
    * dominant share), which is what a language-routing or
    * mixed-doc-filtering stage keys on.
    *
    * Sentences split on the same `\.\s+` boundary as
    * [[Chunking.sentenceChunks]]; each sentence votes via the same
    * marker argmax as [[langGuess]] (declaration-order tie-break), so
    * both stages share one replayable definition. Dominant-language
    * ties break toward the lexicographically GREATEST language code
    * (max over (count, lang) structs — deterministic, engine-portable).
    *
    * Scale shape: one posexplode pass, a per-doc lag window + one
    * (doc, lang) combine-agg + one per-doc argmax combine-agg — two
    * shuffles on doc_id, no corpus-sized window, output one row per
    * document. */
  def sentenceLangProfile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", unit: Long = 1000000L): DataFrame = {
    val sents = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("__i", "__s")))
      .withColumn("__s", trim(col("__s")))
      .filter(col("__s") =!= "")
      .withColumn("__lang", langGuess(col("__s")))
      .localCheckpoint(false) // consumed by the switch window + the counts
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__i"))
    val switches = sents
      .withColumn("__prev", lag(col("__lang"), 1).over(wd))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("__prev").isNotNull &&
          col("__prev") =!= col("__lang"), 1L).otherwise(0L))
          .as("n_switches"))
    val dominant = sents.groupBy(col("id"), col("__lang"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("id"))
      .agg(max(struct(col("__c"), col("__lang"))).as("__m"))
      .select(col("id"), col("__m.__lang").as("dominant_lang"),
        col("__m.__c").as("__dc"))
    switches.join(dominant, Seq("id"))
      .select(col("id").as(idCol), col("n_sentences"), col("n_switches"),
        col("dominant_lang"),
        expr(s"($unit * __dc) div n_sentences").as("dominant_micro"))
  }

  /** TextTiling-style topic segmentation summary: sentences are the
    * tiles; a segment boundary falls between adjacent sentences whose
    * lexical cohesion — Jaccard over their distinct normalized word
    * sets — drops below the rational threshold num/den
    * (`inter·den < num·union`, integer cross-multiplication like every
    * similarity predicate here; Hearst 1997's block comparison reduced
    * to the exact 1-sentence-block case). Output per document:
    * sentence count, boundary count, segment count (boundaries + 1).
    * The structure signal for long-document chunking policy: a doc
    * with many low-cohesion boundaries is a concatenation (forum dump,
    * scraped listing) that sentence-budget chunking should split at
    * boundaries, not mid-topic.
    *
    * Scale shape: one posexplode pass, word sets built map-side as
    * arrays (array_distinct — no per-word explosion), ONE per-doc lag
    * window for adjacency, one combine-agg — a single shuffle on
    * doc_id; the window partitions by doc, never globally. */
  def topicSegments(docs: DataFrame, num: Int = 1, den: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(num > 0 && den > 0, "threshold must be a positive rational")
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__i"))
    docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("__i", "__s")))
      .withColumn("__s", trim(col("__s")))
      .filter(col("__s") =!= "")
      .withColumn("__ws", array_remove(
        array_distinct(split(graft.ops.Dedup.normalize(col("__s")), " ")), ""))
      .withColumn("__prev", lag(col("__ws"), 1).over(wd))
      .withColumn("__inter",
        size(array_intersect(col("__prev"), col("__ws"))).cast("long"))
      .withColumn("__uni",
        (size(col("__prev")) + size(col("__ws"))).cast("long") - col("__inter"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("__prev").isNotNull &&
          col("__inter") * den < col("__uni") * num, 1L).otherwise(0L))
          .as("n_boundaries"))
      .select(col("id").as(idCol), col("n_sentences"), col("n_boundaries"),
        (col("n_boundaries") + 1L).as("n_segments"))
  }

  /** RAKE-style keyword extraction (Rose et al. 2010), made fully
    * deterministic and corpus-driven: the stopword set is the corpus's
    * own `nStop` most frequent tokens (ties broken by token asc — no
    * hand-curated list to drift), candidate phrases are the maximal
    * stopword-free token runs of length ≤ `maxPhraseLen`, each word
    * scores deg/freq over the kept phrases (deg = Σ length of phrases
    * containing the occurrence, freq = occurrence count; integer micro
    * units), and a phrase scores the sum of its member word scores.
    * Output: the `topK` distinct phrases per document by
    * (score desc, phrase asc), with rank.
    *
    * Scale shape: one posexplode pass; the stopword relation is nStop
    * rows (broadcast); the phrase id is a per-DOC running count window
    * (never global); word scores are one corpus-level combine-agg whose
    * output is vocabulary-sized and joins back by word (broadcast at
    * real vocabulary sizes); per-doc top-k is a doc-partitioned
    * row_number. The maxPhraseLen cap bounds the per-phrase arrays —
    * a pathological no-stopword document would otherwise make one
    * phrase of the whole text. */
  def rakeKeywords(docs: DataFrame, nStop: Int = 5, topK: Int = 3,
      maxPhraseLen: Int = 4, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nStop >= 0 && topK > 0 && maxPhraseLen > 0, "bad parameters")
    val W = org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(split(Dedup.normalize(col(textCol)), " "))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .localCheckpoint()
    val stop = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(nStop)
      .select(col("w"), lit(true).as("__stop"))
    val marked = toks.join(broadcast(stop), Seq("w"), "left")
      .withColumn("__isStop", coalesce(col("__stop"), lit(false)))
      .withColumn("ph", sum(when(col("__isStop"), 1L).otherwise(0L))
        .over(W.partitionBy(col("id")).orderBy(col("pos"))))
    val phraseToks = marked.filter(!col("__isStop"))
      .select(col("id"), col("ph"), col("pos"), col("w"))
      .localCheckpoint()
    val phraseLen = phraseToks.groupBy(col("id"), col("ph"))
      .agg(count(lit(1)).as("len"))
      .filter(col("len") <= maxPhraseLen)
    val occ = phraseToks.join(phraseLen, Seq("id", "ph"))
    val wordScore = occ.groupBy(col("w"))
      .agg(sum(col("len")).as("__deg"), count(lit(1)).as("__freq"))
      .select(col("w"), expr(s"($unit * __deg) div __freq").as("ws"))
    val phrases = occ.join(wordScore, Seq("w"))
      .groupBy(col("id"), col("ph"))
      .agg(sum(col("ws")).as("score_micro"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w")), " ").as("phrase"))
    val distinctPhrases = phrases.groupBy(col("id"), col("phrase"))
      .agg(max(col("score_micro")).as("score_micro"))
    distinctPhrases
      .withColumn("rank", row_number().over(W.partitionBy(col("id"))
        .orderBy(col("score_micro").desc, col("phrase").asc)))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("rank"), col("phrase"),
        col("score_micro"))
  }

  /** Blocklist (badwords) filtering, C4-style: count each document's
    * tokens that appear in a flagged-term list and gate on the flagged
    * fraction. The list joins as a broadcast relation — NOT an `isin`
    * literal chain — so production-sized blocklists (10⁴–10⁵ terms)
    * keep a hash-join plan instead of a megabyte of generated code.
    * Exact integers: flag_frac_micro = unit·hits div n_tokens.
    *
    * Output: (id, n_tokens, n_flagged, flag_frac_micro, kept) per doc —
    * every input document appears (zero-token docs keep with 0). */
  def blocklistFilter(docs: DataFrame, terms: Seq[String],
      maxFracMicro: Long = 100000L, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxFracMicro >= 0, "maxFracMicro must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    // dedupe AFTER lowercasing — case-variant spellings of one term must
    // collapse to ONE join key, or each token match would multiply
    val bl = broadcast(terms.map(_.toLowerCase).distinct.toDF("w")
      .select(col("w"), lit(true).as("__bad")))
    docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(bl, Seq("w"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("n_flagged"))
      .join(docs.select(col(idCol).as("id")), Seq("id"), "right")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
      .withColumn("flag_frac_micro",
        expr(s"($unit * n_flagged) div greatest(n_tokens, 1)"))
      .withColumn("kept", col("flag_frac_micro") <= maxFracMicro)
  }

  /** Gazetteer phrase-span tagging: every occurrence of any dictionary
    * phrase (multi-word, exact token sequence after lowercasing) with its
    * 0-based start-token position — the entity/PII-phrase spotting
    * primitive that [[blocklistFilter]]'s boolean per-doc verdict is not
    * (spans feed redaction, entity linking, leakage audits). Overlapping
    * and nested matches are all emitted.
    *
    * Mechanics: the token array is sliced into n-grams once per DISTINCT
    * phrase LENGTH (an Aho–Corasick pass is sequential; per-length slicing
    * is the relational equivalent — the explode is |lengths|·n_tokens
    * rows, and phrase dictionaries cluster on a handful of lengths), then
    * equi-joined against the broadcast dictionary. Only the bounded
    * n-gram strings shuffle; at cluster scale the join is map-side
    * (broadcast) so the scan never exchanges at all. */
  def gazetteerSpans(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = phrases.map(_.trim.toLowerCase.split("\\s+").toSeq).distinct
    val lens = norm.map(_.size).distinct.sorted
    val dict = broadcast(norm.map(t => (t.mkString(" "), t.size))
      .toDF("phrase", "phrase_len"))
    val toks = docs.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    val grams = lens.map { l =>
      toks.filter(size(col("__toks")) >= l)
        .select(col("doc_id"),
          posexplode(expr(s"transform(sequence(0, size(__toks) - $l), " +
            s"s -> array_join(slice(__toks, s + 1, $l), ' '))")))
        .select(col("doc_id"), col("pos").as("start_token"),
          lit(l).as("phrase_len"), col("col").as("phrase"))
    }.reduce(_ unionByName _)
    grams.join(dict, Seq("phrase", "phrase_len"))
      .select(col("doc_id"), col("start_token"), col("phrase_len"),
        col("phrase"))
  }

  /** Out-of-vocabulary rate under a fixed top-V corpus vocabulary — the
    * tokenizer-coverage audit: before freezing a vocab (or shipping a
    * BPE budget), what fraction of each document's tokens fall outside
    * the `vocabSize` most frequent corpus tokens (ties broken by token
    * asc, the RAKE stopword discipline)? Docs with high OOV under the
    * corpus's own head vocabulary are the junk/format outliers.
    *
    * Scale shape: one tokenize pass; the vocabulary relation is V rows
    * broadcast (a vocab fits a broadcast by construction — that's what
    * makes it a vocab); per-doc counts are one combine-agg; zero-token
    * docs report (0, 0, 0). */
  def oovRate(docs: DataFrame, vocabSize: Int, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint()
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(true).as("__in"))
    val perDoc = toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_frac_micro",
        expr(s"($unit * n_oov) div greatest(n_tokens, 1)"))
  }

  /** TextRank extractive sentence ranking (Mihalcea & Tarau, EMNLP
    * 2004): sentences are graph nodes, edges weight lexical overlap,
    * and the per-document summary is the top-`topK` sentences by
    * weighted PageRank ([[Components.weightedPageRank]] — the same
    * integer-unit kernel as `graph_weighted_rank`, so the iteration
    * replays engine-exactly).
    *
    * Deviations from the paper, both deterministic by design: edge
    * weight is the exact rational ⌊2·10⁶·|common tokens| /
    * (|toks_a| + |toks_b|)⌋ instead of overlap/(log|a|+log|b|) (logs
    * are not integer-replayable; the Dice-style normalizer keeps the
    * same monotonicity), and sentences with NO lexical overlap inside
    * their document are absent from the graph and therefore unranked
    * (they cannot enter a summary that scores connectivity).
    *
    * Scale shape: sentence explode is map-only; the overlap join is
    * keyed (doc, token) so nothing crosses documents and a document's
    * cost is bounded by its own sentence clique — the same per-doc
    * quadratic every pairwise-sentence method carries, bounded by doc
    * length, never corpus-sized. The rank iteration runs on the union
    * of per-doc graphs at once (edge relation ∝ corpus, node ids
    * encode (doc, sentence)); top-K is a per-doc window. */
  def textRankSentences(docs: DataFrame, topK: Int, iters: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    textRankFrom(
      docs.select(col(idCol),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("sent_idx", "sentence"))),
      topK, iters, idCol)

  /** [[textRankSentences]] over a caller-built sentence relation
    * (idCol, sent_idx, sentence) — the entry point when the sentence
    * notion isn't period-delimited (fixed-token pseudo-sentences for
    * unpunctuated corpora, transcript turns, code lines). */
  def textRankFrom(sentsIn: DataFrame, topK: Int, iters: Int = 3,
      idCol: String = "doc_id"): DataFrame =
    textRankFromTokens(
      sentsIn
        .select(col(idCol), col("sent_idx"),
          explode(split(trim(lower(col("sentence"))), "\\s+")).as("tok")),
      topK, iters, idCol)

  /** Word-chunk relation shared by the unigram-tokenizer family: one
    * row per OCCURRENCE of each ≤ `maxChunkLen`-character block of each
    * normalized word. Chunking caps the Viterbi DP length (the oracle
    * unrolls exactly `maxChunkLen` steps) — SentencePiece applies the
    * same kind of input-length bound before segmenting. */
  private def unigramChunks(docs: DataFrame, idCol: String, textCol: String,
      maxChunkLen: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .select(col("id"), explode(expr(
        s"""transform(sequence(0, (length(__w) - 1) div $maxChunkLen),
           |  k -> substring(__w, k * $maxChunkLen + 1, $maxChunkLen))""".stripMargin))
        .as("chunk"))

  /** Train a unigram-LM tokenizer vocabulary (the SentencePiece family's
    * second member, next to [[trainBpeMerges]]): every ≤ `maxPieceLen`
    * substring occurrence of the chunked corpus words is counted in ONE
    * exploded pass, the top `maxVocab` pieces by (count desc, piece asc)
    * are kept, every observed single character is force-included (the
    * segmentability guarantee), and each piece scores its integer micro
    * log2-probability
    *
    *   score(p) = log2Micro(count_p) − log2Micro(Σ_vocab count)
    *
    * via the [[graft.functions.ExactMicroOps.log2Micro]] fixed-point
    * kernel, so the vocabulary — and every segmentation under it — is
    * bit-replayable by a SQL oracle. This is the frequency-scored
    * (hard-EM iteration 0) variant: full unigram EM re-estimates scores
    * from expected piece usage, a float fixpoint this engine's exactness
    * contract deliberately avoids; Viterbi-count hard-EM rounds are the
    * documented upgrade path (they need a backtrack tie-pin on top of
    * the (score, min-pieces) DP value).
    *
    * Scale shape: the substring explode is ≤ maxChunkLen·maxPieceLen
    * rows per chunk occurrence, collapsed map-side by the count
    * aggregate; only the (maxVocab + alphabet)-bounded vocabulary is
    * collected (loud `maxChars` guard), and it rides the plan as one
    * reference object ([[graft.functions.UnigramVocab]] — the
    * [[graft.functions.BpeTable]] discipline). */
  def trainUnigramVocab(docs: DataFrame, maxPieceLen: Int = 6,
      maxVocab: Int = 512, maxChunkLen: Int = 16, maxChars: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text")
      : graft.functions.UnigramVocab = {
    require(maxPieceLen >= 1 && maxPieceLen <= maxChunkLen && maxVocab >= 1,
      "need 1 <= maxPieceLen <= maxChunkLen and maxVocab >= 1")
    val counts = unigramChunks(docs, idCol, textCol, maxChunkLen)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen), l ->
           |  filter(transform(sequence(0, length(chunk) - 1), i ->
           |    CASE WHEN i + l <= length(chunk)
           |         THEN substring(chunk, i + 1, l) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy(col("piece"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // consumed by the top-k AND the single-char scan
    val top = counts
      .orderBy(col("__c").desc, col("piece"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val chars = counts.filter(length(col("piece")) === 1)
      .limit(maxChars + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(chars.length <= maxChars,
      s"trainUnigramVocab: more than $maxChars distinct characters — " +
        "not a normalized-text corpus; raise maxChars only deliberately")
    val vocab = (top ++ chars).toMap.toSeq
    val total = vocab.map(_._2).sum
    val scored = vocab.map { case (p, c) =>
      p -> (graft.functions.ExactMicroOps.log2Micro(c) -
        graft.functions.ExactMicroOps.log2Micro(total))
    }
    new graft.functions.UnigramVocab(scored, maxPieceLen)
  }

  /** Per-document unigram segmentation stats under a trained
    * [[graft.functions.UnigramVocab]]: chunk count, total Viterbi piece
    * count and score, character count, and the tokenizer-fertility
    * readout ⌊10⁶·pieces/chars⌋ — the unigram twin of
    * [[bpeFertility]]'s audit. Map-only per chunk (the DP runs inside
    * the [[graft.functions.UnigramSegmentStats]] expression against the
    * broadcast-style vocab reference object), one per-doc combine-agg,
    * docs with no alphanumeric content surface with zeros. */
  def unigramSegmentStats(docs: DataFrame,
      vocab: graft.functions.UnigramVocab, maxChunkLen: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val st = unigramChunks(docs, idCol, textCol, maxChunkLen)
      .withColumn("__st",
        graft.functions.TextFunctions.unigram_segment_stats(col("chunk"), vocab))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(expr("__st.n_pieces")).as("n_pieces"),
        sum(expr("__st.score_micro")).as("score_micro_sum"),
        sum(length(col("chunk")).cast("long")).as("n_chars"))
    docs.select(col(idCol).as("id"))
      .join(st, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("score_micro_sum"), lit(0L)).as("score_micro_sum"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .withColumn("fertility_micro",
        expr("(1000000 * n_pieces) div greatest(n_chars, 1)"))
  }

  /** Train a WordPiece vocabulary — the greedy third of the subword
    * triad ([[trainBpeMerges]], [[trainUnigramVocab]]). Candidates are
    * counted in ONE exploded pass like the unigram trainer, but with
    * the WordPiece position-kind dimension: a substring occurrence
    * starting at a word(-chunk) boundary counts as a word-INITIAL
    * piece, any other as a CONTINUATION piece (the `##`-prefixed
    * entries of a published WordPiece vocab file). The top `maxVocab`
    * (count desc, initial-before-continuation, piece asc — fully
    * pinned) are kept and every observed single character of BOTH
    * kinds is force-included, so greedy segmentation can only UNK on
    * serve-time characters the training corpus never saw.
    *
    * This is the frequency-ranked vocabulary variant: published
    * WordPiece training greedily merges by a likelihood score — a
    * float fixpoint the exactness contract avoids — and ships only the
    * final vocab; the serve-time greedy longest-match-first rule,
    * which is what distinguishes WordPiece from BPE/unigram at
    * pipeline time, is implemented exactly.
    *
    * Scale shape: the substring explode is ≤ maxChunkLen·maxPieceLen
    * rows per chunk occurrence, collapsed map-side by the count
    * aggregate; only the (maxVocab + 2·alphabet)-bounded vocabulary is
    * collected (loud `maxChars` guard) and rides the plan as one
    * reference object ([[graft.functions.WordPieceVocab]]). */
  def trainWordPieceVocab(docs: DataFrame, maxPieceLen: Int = 6,
      maxVocab: Int = 512, maxChunkLen: Int = 16, maxChars: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text")
      : graft.functions.WordPieceVocab = {
    require(maxPieceLen >= 1 && maxPieceLen <= maxChunkLen && maxVocab >= 1,
      "need 1 <= maxPieceLen <= maxChunkLen and maxVocab >= 1")
    val counts = unigramChunks(docs, idCol, textCol, maxChunkLen)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen), l ->
           |  filter(transform(sequence(0, length(chunk) - 1), i ->
           |    CASE WHEN i + l <= length(chunk)
           |         THEN named_struct(
           |           'piece', substring(chunk, i + 1, l),
           |           'cont', i > 0) END),
           |    x -> x IS NOT NULL)))""".stripMargin)).as("pc"))
      .select(expr("pc.piece").as("piece"), expr("pc.cont").as("cont"))
      .groupBy(col("piece"), col("cont"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // consumed by the top-k AND the single-char scan
    val top = counts
      .orderBy(col("__c").desc, col("cont"), col("piece"))
      .limit(maxVocab)
      .select(col("piece"), col("cont"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val chars = counts.filter(length(col("piece")) === 1)
      .select(col("piece"), col("cont"))
      .limit(2 * maxChars + 1)
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    require(chars.length <= 2 * maxChars,
      s"trainWordPieceVocab: more than $maxChars distinct characters — " +
        "not a normalized-text corpus; raise maxChars only deliberately")
    val all = (top ++ chars).distinct
    new graft.functions.WordPieceVocab(
      all.collect { case (p, false) => p },
      all.collect { case (p, true) => p }, maxPieceLen)
  }

  /** Per-document greedy WordPiece segmentation stats under a trained
    * [[graft.functions.WordPieceVocab]]: chunk count, total piece
    * count, UNK-chunk count, character count, and tokenizer fertility
    * ⌊10⁶·pieces/chars⌋ — the WordPiece row of the tokenizer-audit
    * family ([[bpeFertility]], [[unigramSegmentStats]]). Map-only per
    * chunk (the greedy walk runs inside the
    * [[graft.functions.WordPieceSegmentStats]] expression against the
    * vocab reference object), one per-doc combine-agg; UNK chunks
    * contribute their 1 [UNK] piece to n_pieces and their true length
    * to n_chars. */
  def wordPieceSegmentStats(docs: DataFrame,
      vocab: graft.functions.WordPieceVocab, maxChunkLen: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val st = unigramChunks(docs, idCol, textCol, maxChunkLen)
      .withColumn("__st",
        graft.functions.TextFunctions.wordpiece_segment_stats(col("chunk"), vocab))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(expr("__st.n_pieces")).as("n_pieces"),
        sum(expr("__st.is_unk")).as("n_unk_chunks"),
        sum(length(col("chunk")).cast("long")).as("n_chars"))
    docs.select(col(idCol).as("id"))
      .join(st, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unk_chunks"), lit(0L)).as("n_unk_chunks"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .withColumn("fertility_micro",
        expr("(1000000 * n_pieces) div greatest(n_chars, 1)"))
  }

  /** [[textRankSentences]] from a raw token relation (idCol, sent_idx,
    * tok) — the leanest entry point (a tokenizing caller skips the
    * sentence-string reassembly entirely; empty tokens are dropped
    * here, token multiplicity within a sentence is irrelevant since
    * overlap counts DISTINCT shared tokens). */
  def textRankFromTokens(toksIn: DataFrame, topK: Int, iters: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK must be positive")
    // per-sentence DISTINCT token sets + set sizes, one combine-agg;
    // node id encodes (doc, sentence) in one long — 1000 sentences per
    // doc is the documented envelope (summarization inputs are
    // documents, not books; beyond it, chunk first)
    // doc-partitioned EAGER checkpoint: the sentence token-set relation
    // feeds BOTH sides of the pair join below — without it the whole
    // tokenize + collect_set subtree ran twice (same-job consumers race
    // a lazy checkpoint, the measured r16 rule), and re-keying each
    // side (doc, node) → (doc) cost two more exchanges. Partitioning by
    // doc before the checkpoint makes the self-join exchange-free
    // (guide §2.4; localCheckpoint preserves physical partitioning).
    val sentToks = toksIn
      .select(col(idCol).cast("long").as("doc"),
        col("sent_idx").cast("long").as("idx"), col("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "" &&
        col("idx") < 1000)
      .withColumn("node", expr("doc * 1000 + idx"))
      .groupBy(col("doc"), col("node"))
      .agg(collect_set(col("tok")).as("__ts"))
      .withColumn("__nw", size(col("__ts")).cast("long"))
      .repartition(col("doc"))
      .localCheckpoint()
    // per-doc sentence-pair overlap via map-side array_intersect after
    // ONE equi-join on the doc key — the per-doc quadratic every
    // pairwise-sentence method carries, bounded by doc length, never
    // corpus-sized (and far fewer shuffles than a token-level
    // self-join: measured 6.4 s → ~3 s on the registry corpus)
    // The symmetric edge set in ONE pass: the doc-keyed self-join
    // enumerates every ORDERED pair (node ≠ nb) directly, so both
    // directions come out of one join with one intersect each — the
    // previous `node < nb` + union-of-reversed form computed the whole
    // join + array_intersect subtree TWICE (once per union branch) for
    // the same total intersect count. Weight is symmetric in (a, b),
    // so the edge set is value-identical.
    val sym = sentToks.as("a")
      .join(sentToks.select(col("doc"), col("node").as("__nb"),
        col("__ts").as("__tsb"), col("__nw").as("__nbw")), Seq("doc"))
      .filter(col("node") =!= col("__nb"))
      .select(col("node").as("src"), col("__nb").as("dst"),
        size(array_intersect(col("__ts"), col("__tsb"))).cast("long")
          .as("__ov"),
        col("__nw").as("__na"), col("__nbw"))
      .select(col("src"), col("dst"),
        expr("(2000000 * __ov) div (__na + __nbw)").as("weight"))
      .filter(col("weight") > 0)
    val pr = Components.weightedPageRankLazy(sym, iters)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pr").desc, col("sent_idx"))
    // FLOOR-division decode: `id div 1000` truncates toward zero while
    // pmod is non-negative, so a negative doc id would mis-decode under
    // div; (id − pmod) is an exact multiple of 1000, making the pair
    // (floor-quotient, pmod) consistent for any sign
    pr.select(expr("(id - pmod(id, 1000)) div 1000").as("doc_id"),
        pmod(col("id"), lit(1000L)).as("sent_idx"), col("pr"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Zipf's-law fit over the frequency head — the corpus-naturalness
    * diagnostic (natural text has log-log slope ≈ −1; generated or
    * templated corpora flatten or cliff): least-squares regression of
    * y = log2(freq) on x = log2(rank) over the top-`headWords` words,
    * entirely exact integers. Logs are the shared fixed-point
    * [[graft.functions.ExactMicroOps.log2Micro]] kernel TRUNCATED TO
    * MILLI units — the quantization that keeps the r² numerator's
    * square inside DECIMAL(38,0)/HUGEINT (x,y ≤ 2·10⁴ ⇒ num ≤ ~10¹⁵ ⇒
    * num² ≤ 10³⁰) — slope/intercept/r² are then closed-form sign-split
    * divisions of the five aggregated sums. Ranking is (count desc,
    * word asc), fully pinned.
    *
    * Scale shape: one token-count combine-agg, a TakeOrdered head cut
    * (headWords rows — the global sort never materializes), one 5-sum
    * aggregate, one-row output. The head cut is also the statistical
    * convention: the Zipf exponent is a head property, and it bounds
    * every relation after the word count at any corpus size. */
  def zipfFit(docs: DataFrame, headWords: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // 1024, not "anything bounded": logLogFit's r² squares the fit
    // numerator, and ≤1024 points × ≤52000 milli-logs is the PROVABLE
    // DECIMAL(38,0) envelope (ADVICE r13) — 10⁵ head words would
    // silently null r² on realistic corpora. The Zipf exponent is a
    // head property; 1024 ranks is statistically ample.
    require(headWords >= 3 && headWords <= 1024,
      "headWords must be in [3, 1024] — the exact-r2 envelope")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val dec = "DECIMAL(38,0)"
    val head = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(headWords)
      .localCheckpoint(false) // head-sized; feeds both triangular sides
    // rank via the triangular self-join on the BOUNDED head (the house
    // no-global-window pattern): rank = 1 + |rows strictly before in
    // (count desc, word asc) order|
    val ranked = head.as("a")
      .join(head.select(col("c").as("__c2"), col("w").as("__w2")),
        col("__c2") > col("c") ||
          (col("__c2") === col("c") && col("__w2") < col("w")), "left")
      .groupBy(col("w"), col("c")).agg(count(col("__w2")).as("__prior"))
      .withColumn("rank", col("__prior") + lit(1L))
    val xy = ranked
      .withColumn("__lx", lg(col("rank")))
      .withColumn("__ly", lg(col("c")))
      .select(expr("__lx div 1000").as("x"), expr("__ly div 1000").as("y"))
    logLogFit(xy, "n_words")
  }

  /** Exact least-squares fit over an (x, y) milli-log relation — the
    * closed-form slope/intercept/r² shared by [[zipfFit]] and
    * [[heapsFit]]: every sum exact, every division sign-split, the
    * milli quantization keeping r²'s squared numerator inside
    * DECIMAL(38,0). One aggregate (5 sums + the envelope extrema),
    * one-row output.
    *
    * Envelope, ENFORCED in-plan (ADVICE r13): with n ≤ 1024 points and
    * |x|,|y| ≤ 52000 (values < 2^52 — beyond any real corpus),
    * |num| = |n·sxy − sx·sy| ≤ 2n²·x·y < 5.7·10¹⁵, so num²·10⁶ <
    * 3.3·10³⁷ fits DECIMAL(38,0) and DuckDB's HUGEINT alike. Outside
    * it, Spark (non-ANSI) would silently null r² while the oracle
    * raises — the loud raise_error makes both engines fail the same
    * way ([[Sessions.autocorrelation]]'s maxGrid discipline). */
  private def logLogFit(xy: DataFrame, nCol: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val sums = xy.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr(s"CAST(x AS $dec) * x")).as("sxx"),
      sum(expr(s"CAST(y AS $dec) * y")).as("syy"),
      sum(expr(s"CAST(x AS $dec) * y")).as("sxy"),
      greatest(max(abs(col("x"))), max(abs(col("y")))).as("__mx"))
      .withColumn("n", expr(
        s"""CASE WHEN n > 1024 OR __mx > 52000 THEN raise_error(concat(
           |  'logLogFit: ', CAST(n AS STRING), ' points, max milli-log ',
           |  CAST(__mx AS STRING), ' — outside the exact-r2 envelope
           | (<=1024 points, milli-logs <= 52000); r2 would overflow
           | DECIMAL(38,0)')) ELSE n END""".stripMargin))
    sums.select(col("n").as(nCol),
      expr(s"""CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy""").as("__num"),
      expr(s"""CAST(n AS $dec) * sxx - CAST(sx AS $dec) * sx""").as("__dx"),
      expr(s"""CAST(n AS $dec) * syy - CAST(sy AS $dec) * sy""").as("__dy"),
      col("sx"), col("sy"))
      .select(col(nCol),
        // slope in micro: num·10⁶/dx, magnitude-then-sign (dx > 0
        // whenever there are ≥ 2 distinct x values)
        expr("""CAST(CASE WHEN __dx = 0 THEN 0
               |  WHEN __num >= 0 THEN (__num * 1000000) div __dx
               |  ELSE -((-__num * 1000000) div __dx) END AS BIGINT)"""
          .stripMargin).as("slope_micro"),
        // intercept (milli, the x/y unit): (sy − slope·sx/10⁶)/n —
        // computed as (sy·__dx − __num·sx)·sign-split / (n·__dx)
        expr(s"""CAST(CASE WHEN __dx = 0 THEN 0
               |  WHEN CAST(sy AS DECIMAL(38,0)) * __dx - __num * sx >= 0
               |  THEN (CAST(sy AS DECIMAL(38,0)) * __dx - __num * sx)
               |    div (CAST($nCol AS DECIMAL(38,0)) * __dx)
               |  ELSE -((-(CAST(sy AS DECIMAL(38,0)) * __dx - __num * sx))
               |    div (CAST($nCol AS DECIMAL(38,0)) * __dx))
               |END AS BIGINT)""".stripMargin).as("intercept_milli"),
        expr("""CAST(CASE WHEN __dx = 0 OR __dy = 0 THEN 0
               |  ELSE (__num * __num * 1000000) div (__dx * __dy)
               |END AS BIGINT)""".stripMargin).as("r2_micro"))
  }

  /** Heaps'-law fit V(N) = K·N^β over doc-bucket growth points — the
    * vocabulary-growth exponent (natural corpora: β ≈ 0.4–0.6 with a
    * straight log-log line; templated/synthetic corpora saturate,
    * reading β ≈ 0 with poor r² — the [[zipfFit]] diagnostic's
    * companion): per `bucketDocs`-sized doc bucket, cumulative token
    * count N and cumulative distinct-word count V (a word counts at its
    * FIRST doc bucket — one combine-agg, no rescan), cumulated via the
    * bucket-relation triangular self-join (bounded by the bucket count,
    * the [[vocabGrowth]] shape), then the exact milli-log least squares
    * of log V on log N. Zero-token buckets are excluded (log of 0). */
  def heapsFit(docs: DataFrame, bucketDocs: Long = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bucketDocs > 0, "bucketDocs must be positive")
    val lg = graft.functions.VectorFunctions.log2_micro _
    val words = docs
      .select(col(idCol).cast("long").as("__id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint(false) // feeds first-bucket AND token counts
    val newPerBucket = words
      .groupBy(col("w")).agg(min(col("__id")).as("__first"))
      .groupBy(expr(s"__first div $bucketDocs").as("bucket"))
      .agg(count(lit(1)).as("new_words"))
    val toksPerBucket = words
      .groupBy(expr(s"__id div $bucketDocs").as("bucket"))
      .agg(count(lit(1)).as("toks"))
    val buckets = toksPerBucket
      .join(newPerBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("toks"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
      .localCheckpoint(false) // both triangular sides
    val xy = buckets.alias("a")
      .join(buckets.select(col("bucket").as("__b2"),
        col("toks").as("__t2"), col("new_words").as("__n2")),
        col("__b2") <= col("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("__t2")).as("__ct"), sum(col("__n2")).as("__cv"))
      .filter(col("__ct") >= 1L && col("__cv") >= 1L)
      .withColumn("__lx", lg(col("__ct")))
      .withColumn("__ly", lg(col("__cv")))
      .select(expr("__lx div 1000").as("x"), expr("__ly div 1000").as("y"))
    logLogFit(xy, "n_points")
  }

  /** Good–Turing frequency spectrum (Good 1953; the raw estimator —
    * Gale & Sampson's SGT smoothing regression is deliberately NOT
    * applied, so every number is an exact corpus statistic): for each
    * observed word frequency f, the spectrum count N_f = |{w : c(w) =
    * f}| and the Turing-adjusted count f* = (f+1)·N_{f+1}/N_f in
    * floored micro (0 where N_{f+1} = 0 — the raw estimator's gap the
    * SGT regression exists to fill), plus the leave-one-out unseen
    * mass p₀ = N₁/N replicated per row. The standard open-vocabulary
    * smoothing input and the "how much probability do unseen words
    * deserve" readout.
    *
    * Shape: word counts (one combine shuffle) → spectrum counts (a
    * SECOND combine shuffle whose input is vocabulary-sized and whose
    * output is frequency-DOMAIN-sized, ≤ distinct frequencies ≈
    * O(√N)); the f+1 lookup is a self equi-join on the tiny spectrum;
    * the total rides a broadcast one-row aggregate. */
  def goodTuringSpectrum(docs: DataFrame, unit: Long = 1000000L,
      textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val spec = wc.groupBy(col("f")).agg(count(lit(1)).as("n_f"))
      .localCheckpoint(false) // frequency-domain-sized; 3 consumers
    val tot = spec.agg(sum(col("f") * col("n_f")).as("__n"),
      coalesce(sum(when(col("f") === 1L, col("n_f"))), lit(0L)).as("__n1"))
    spec
      .join(spec.select((col("f") - 1L).as("f"), col("n_f").as("__nf1")),
        Seq("f"), "left")
      .crossJoin(broadcast(tot))
      .select(col("f"), col("n_f"),
        expr(s"((f + 1) * $unit * coalesce(__nf1, 0L)) div n_f")
          .as("f_star_micro"),
        expr(s"($unit * __n1) div __n").as("p0_micro"),
        col("__n").as("n_tokens"))
      .orderBy(col("f"))
  }

  /** Per-source vocabulary coverage and richness — the "which source
    * still has unseen words to give" curation readout behind corpus
    * growth decisions: the Good–Turing missing mass p₀ = N₁/N (Good
    * 1953 — the leave-one-out probability that the NEXT token drawn
    * from this source is a word never seen in it; [[goodTuringSpectrum]]
    * reports the corpus-wide value, this is its per-source split) and
    * the bias-corrected Chao1 vocabulary-richness estimate (Chao 1984;
    * the 1987 bias-corrected form V + N₁(N₁−1)/(2(N₂+1)), defined even
    * when no doubletons exist) — how many word TYPES the source's true
    * vocabulary likely holds, observed or not. A source with high p₀ /
    * Chao1 far above its observed type count is under-sampled; one with
    * p₀ ≈ 0 is exhausted and more of it only repeats itself.
    *
    * Exact: both estimators are rational over integer counts — p₀ in
    * floored micro, Chao1 floored to whole types.
    *
    * Scale shape: (source, word) counts in one combine-agg (vocabulary-
    * sized intermediate, the [[goodTuringSpectrum]] shape), then a
    * second combine-agg down to one row per source. No windows, no
    * joins; at 100 TB it is two map-side-combined passes. */
  def missingMassBySource(docs: DataFrame, unit: Long = 1000000L,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(col(sourceCol).as("source"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    wc.groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("f") === 2L, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_singletons"), col("n_doubletons"),
        expr(s"($unit * n_singletons) div n_tokens").as("p0_micro"),
        expr("""n_types + (n_singletons * (n_singletons - 1))
               |  div (2 * (n_doubletons + 1))""".stripMargin)
          .as("chao1_types"))
  }

  /** Simple Good–Turing smoothing fit (Gale & Sampson 1995) over the
    * [[goodTuringSpectrum]]: the raw estimator's N_{f+1} gaps (every
    * unobserved frequency zeroes f*) are filled by the log-log
    * regression the paper prescribes — Z-transform each spectrum count
    * against its observed-frequency neighborhood,
    *
    *   Z_r = 2·N_r / (t − q)   (q = previous observed freq, 0 at the
    *     head; t = next observed freq, 2r − q at the tail)
    *
    * fit log Z on log f with the exact milli-log least squares
    * ([[zipfFit]]'s shared kernel), and read the smoothed estimate
    *
    *   f*_SGT = (f+1) · S(f+1)/S(f) = (f+1) · 2^(b·(log₂(f+1) − log₂ f))
    *
    * off the fitted power law alone — exp2Micro over the fitted
    * exponent, so every value replays bit-for-bit. The exponent is
    * clamped to min(b·Δ, 0) (a non-decreasing fitted spectrum means
    * SGT's validity condition b < −1 failed; the clamp keeps f* ≤ f+1
    * instead of extrapolating upward) and to exp2Micro's −64·10⁶
    * envelope floor.
    *
    * Output per observed f: (f, n_f, z_micro, sgt_star_micro) plus the
    * fit row (slope_micro = b, intercept_milli, r2_micro — r² far from
    * 10⁶ means the power-law premise itself failed) replicated.
    *
    * Shape: the spectrum is frequency-DOMAIN-sized (≈O(√N) rows,
    * checkpointed once); prev/next neighbors come from two triangular
    * self-joins on that bounded relation (the house no-global-window
    * pattern — a lag/lead window here would funnel the whole spectrum
    * into one task); the fit is one aggregate over the LOWEST ≤1024
    * frequencies (the exact-r² envelope — see the in-body note); the
    * smoothed rows cover every observed frequency via a broadcast of
    * the 1-row fit. */
  def sgtFit(docs: DataFrame, unit: Long = 1000000L,
      textCol: String = "text"): DataFrame = {
    val lg = graft.functions.VectorFunctions.log2_micro _
    val e2 = graft.functions.VectorFunctions.exp2_micro _
    val dec = "DECIMAL(38,0)"
    val spec = docs
      .select(explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n_f"))
      .localCheckpoint(false) // freq-domain-sized; 3 consumers
    val nbr = spec
      .join(spec.select(col("f").as("__fp")), col("__fp") < col("f"), "left")
      .groupBy(col("f"), col("n_f")).agg(max(col("__fp")).as("__q0"))
      .join(spec.select(col("f").as("__fn")), col("__fn") > col("f"), "left")
      .groupBy(col("f"), col("n_f"), col("__q0"))
      .agg(min(col("__fn")).as("__t0"))
      .withColumn("__q", coalesce(col("__q0"), lit(0L)))
      .withColumn("__t", coalesce(col("__t0"), lit(2L) * col("f") - col("__q")))
      // ≥1 clamp (the psiFromCounts contract): a frequency gap wider
      // than 2·unit would floor Z to 0 and feed lg(0)
      .withColumn("z_micro",
        expr(s"greatest((2 * n_f * $unit) div (__t - __q), 1L)"))
      .localCheckpoint(false) // feeds the fit AND the smoothed rows
    // Fit envelope (ADVICE r15): the spectrum grows ≈O(√N) distinct
    // frequencies, so past sf0.1-scale it would cross logLogFit's
    // 1024-point exact-r² ceiling and raise mid-job. The regression is
    // therefore fit on the LOWEST ≤1024 observed frequencies — a
    // deterministic TakeOrderedAndProject cut, replayed by the oracle's
    // ORDER BY f LIMIT 1024 — which is where SGT's smoothing operates
    // anyway (high-f spectrum cells are singletons whose raw counts the
    // estimator trusts; Gale & Sampson's own tables stop far below
    // 1024 ranks). The smoothed f*_SGT rows still cover EVERY observed
    // frequency: only the fit input is capped.
    val fit = logLogFit(nbr
      .orderBy(col("f")).limit(1024)
      .withColumn("__lx", lg(col("f")))
      .withColumn("__ly", lg(col("z_micro")))
      .select(expr("__lx div 1000").as("x"),
        expr("__ly div 1000").as("y")), "n_freqs")
    nbr.crossJoin(broadcast(fit))
      .withColumn("__d", lg(col("f") + 1L) - lg(col("f")))
      .withColumn("__be", expr(
        s"""greatest(least(CAST(CAST(slope_micro AS $dec) * __d
           |  div $unit AS BIGINT), 0L), ${-64L * unit}L)""".stripMargin))
      .withColumn("__e2", e2(col("__be")))
      .select(col("f"), col("n_f"), col("z_micro"),
        expr(s"CAST(CAST(f + 1 AS $dec) * __e2 AS BIGINT)")
          .as("sgt_star_micro"),
        col("n_freqs"), col("slope_micro"), col("intercept_milli"),
        col("r2_micro"))
      .orderBy(col("f"))
  }

  /** Word burstiness (Church & Gale 1995: real words are BURSTY — a
    * word's corpus frequency concentrates in few documents, where a
    * Poisson process would spread it): per word with df ≥ `minDf`,
    * corpus frequency cf, document frequency df, and burstiness =
    * cf/df in floored micro (mean occurrences per document that
    * contains the word — 10⁶ = perfectly spread, higher = burstier).
    * Top `topK` burstiest (ties to the lexicographically lower word) —
    * the content-word/function-word separator and the classic
    * keyword-ness signal that pure frequency misses.
    *
    * Shape: ONE (word, doc) combine-agg collapses the token stream;
    * cf/df both derive from it map-side; the cut is orderBy+limit =
    * TakeOrderedAndProject. */
  def wordBurstiness(docs: DataFrame, minDf: Long = 3, topK: Int = 100,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(topK >= 1 && topK <= 100000, "topK in [1, 100000]")
    docs
      .select(col(idCol).as("id"),
        explode(split(Dedup.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"), col("id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("w"))
      .agg(sum(col("__c")).as("cf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("burstiness_micro", expr(s"($unit * cf) div df"))
      .orderBy(col("burstiness_micro").desc, col("w"))
      .limit(topK)
  }
}
