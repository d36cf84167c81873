package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (SURVEY §2.10):
  * exact (hash group-by), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale shapes:
  *  - exact: one shuffle on the 128-bit content hash; map-side combine
  *    collapses most duplicates before the exchange.
  *  - MinHash+LSH: signatures are one groupBy over exploded shingles
  *    (shuffle keyed by doc — shingle rows combine map-side); candidate
  *    generation is an equi-join on band keys (shuffle keyed by band
  *    value), never an O(n²) cross product; only candidates pay the exact
  *    Jaccard verification.
  *  - SimHash: one aggregation per doc; near-pair search is a pigeonhole
  *    band join (hamming ≤ d guarantees ≥1 of d+1 bands equal).
  *
  * Hashing is md5-based everywhere — deterministic, seed-stable across
  * engines and runs (no JVM-hash or RNG dependence).
  */
object Dedup {

  /** Text normalization for content hashing: lowercase, strip
    * non-alphanumerics (keep spaces), collapse whitespace. A single-pass
    * codegen kernel ([[graft.functions.NormalizeText]]) semantically
    * identical to the two-regex formulation
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "), " +", " "))`
    * it replaces (equivalence is property-tested in NormalizeSpec). */
  def normalize(text: Column): Column =
    graft.functions.TextFunctions.normalize_text(text)

  /** Deterministic 60-bit hash of a string under seed `i`. */
  def hashStr(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed|"), c)), 1, 15), 16, 10).cast("long")

  /** Exact dedup by content key: one row per duplicate *group* with the
    * surviving (minimum) id and member count. `keyOf` defaults to md5 of
    * the normalized full text. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", keyOf: Column => Column = c => md5(c)): DataFrame =
    docs
      .select(col(idCol), keyOf(normalize(col(textCol))).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Exact dedup: keep the minimum-id member of each content group. */
  def dropExactDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("__key", md5(normalize(col(textCol))))
    val keep = keyed.groupBy(col("__key")).agg(min(col(idCol)).as(idCol))
    keyed.join(keep, Seq("__key", idCol), "left_semi").drop("__key")
  }

  /** Exact dedup in one pass: row_number over (content key, id) keeps the
    * minimum-id member without the groupBy + semi-join back-join — the
    * input subtree is evaluated once, which matters when it is an
    * expensive derived relation (e.g. a profile join). Same result as
    * [[dropExactDuplicates]]; same single shuffle, but a per-key sort run
    * instead of a map-side-combined aggregate — prefer the agg+semi-join
    * form when the input is a cheap scan with high duplication. */
  def dropExactDuplicatesOnePass(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(normalize(col(textCol)))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct word-unigram shingle set, exploded to (id, gram) rows. */
  def explodedShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(split(normalize(col(textCol)), " "))).as("gram"))
      .filter(col("gram") =!= "")

  /** Distinct word n-gram shingles, exploded to (id, gram) rows. Documents
    * with fewer than `n` normalized words yield no shingles (and so no
    * rows). */
  def wordShingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__w", split(normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= n)
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("__w")) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(col("__w"), i + j + 1)): _*))))
          .as("gram"))

  /** Position-resolved repeated-substring detection — the ExactSubstr
    * shape (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better") at word-shingle granularity: find, for every
    * document, the MAXIMAL runs of positions whose `w`-word shingle
    * occurs at least `minCount` times anywhere in the corpus (within- or
    * cross-document — any repeat is training-loss double-counting). A
    * run of `s` consecutive shared shingle positions certifies a
    * repeated substring of `s + w − 1` words, so the output
    * (doc, start_word, len_words) names the exact spans a cutter would
    * remove — [[crossDocSpanShare]] scores documents; this one locates
    * the text. The suffix-array construction the paper uses is
    * single-machine; shingle-position marking is its distributed
    * approximation (repeats shorter than `w` words are invisible — the
    * deliberate resolution floor).
    *
    * Scale shape: positional shingles hash to longs before any shuffle
    * (the exchange carries (id, pos, hash), never text); occurrence
    * counts are one map-side-combined agg; marking is a semi-join back
    * on the hash; run-merging is ONE per-document window over the
    * marked minority (repeated positions only). The classic
    * consecutive-run trick (group key = pos − rank) keeps merging a
    * pure expression. */
  def repeatedSubstringRuns(docs: DataFrame, w: Int = 8,
      minCount: Long = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(w >= 2 && minCount >= 2, "need shingle width >= 2, minCount >= 2")
    val sh = docs
      .withColumn("__w", split(normalize(col(textCol)), " "))
      .filter(size(col("__w")) >= w)
      .select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), size(col("__w")) - w),
          i => hashStr(concat_ws(" ",
            (0 until w).map(j => element_at(col("__w"), i + j + 1)): _*), 53)))
          .as(Seq("pos", "h")))
      .localCheckpoint(false) // feeds the count agg AND the semi-join probe
    val shared = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col("h"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    sh.join(shared, Seq("h"), "leftsemi")
      .withColumn("__grp", col("pos") - row_number().over(wd))
      .groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).as("start_word"), count(lit(1)).as("n_shingles"))
      .withColumn("len_words", col("n_shingles") + lit((w - 1).toLong))
      .select(col("id").as(idCol), col("start_word"), col("len_words"),
        col("n_shingles"))
  }

  /** Cross-document duplicated-span scoring — the repeated-substring
    * dedup signal (RefinedWeb/C4 style), approximated at word-shingle
    * granularity: for each document, the share of its distinct word
    * n-gram shingles that also occur in at least one OTHER document,
    * plus a keep/drop verdict at `dropAbove`.
    *
    * Scale shape: explode distinct shingles (map-side) → document
    * frequency per shingle (shuffle keyed by shingle, map-side combined)
    * → keep only shingles with df ≥ 2 — the duplicated minority, usually
    * a small fraction of the shingle vocabulary — and join that reduced
    * relation back to the shingle rows before the per-doc count (second
    * shuffle keyed by doc). Documents with zero duplicated shingles never
    * reach the join; the final left join restores them at fraction 0.
    *
    * df counts *documents* (shingles are distinct within a doc), so a
    * span repeated many times inside one document does not flag it —
    * that within-doc signal is [[TextAnalysis.repetitionProfile]]. */
  def shingleDupStats(docs: DataFrame, n: Int = 5, dropAbove: Double = 0.7,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shingles = wordShingles(docs, n, idCol, textCol)
    val dupShingles = shingles.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("gram"))
    val perDocTotal = shingles.groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
    val perDocDup = shingles.join(dupShingles, Seq("gram"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup_shingles"))
    perDocTotal.join(perDocDup, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"))
      .withColumn("dup_fraction",
        round(col("n_dup_shingles") / col("n_shingles"), 6))
      .withColumn("keep", col("dup_fraction") <= dropAbove)
  }

  /** MinHash signatures: numHashes columns h0..h{n-1}, each the min seeded
    * hash over the doc's shingle set. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(hashStr(col("gram"), i)).as(s"h$i"))
    explodedShingles(docs, idCol, textCol)
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, band_key) rows from a signature relation — one explode,
    * shared by the self-join ([[lshCandidates]]) and cross-corpus
    * ([[crossCorpusPairs]]) band joins. */
  private def bandRows(signatures: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val bandArr = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
          .as("band_key"))
    }: _*)
    signatures
      .select(col("id"), explode(bandArr).as("__bk"))
      .select(col("id"), col("__bk").getField("band").as("band"),
        col("__bk").getField("band_key").as("band_key"))
  }

  /** LSH candidate pairs: docs sharing at least one band of `rowsPerBand`
    * consecutive signature components. Output (id_a < id_b) distinct.
    *
    * The per-band rows come from ONE explode over the signature relation —
    * not a union of per-band projections. A union gives every branch a
    * different projection under its exchange, so nothing is reusable and
    * the (shuffle-heavy) signature aggregation re-executes once per band
    * per join side — 8 corpus passes at numHashes=8. With the explode the
    * signature subtree appears once per join side (2 passes max), and when
    * the planner shuffles both sides symmetrically (sort-merge at scale)
    * exchange reuse collapses that to a single pass.
    *
    * Hot buckets are the quadratic failure mode at corpus scale: a
    * boilerplate cluster of a million near-identical documents lands in
    * ONE band bucket and would emit 10^12 candidate pairs. `maxBucket`
    * > 0 drops buckets with more members than that bound before
    * pairing (one count aggregation + anti-join on the band relation).
    * Members of a dropped bucket can still pair through their OTHER,
    * less degenerate bands; fully-boilerplate clusters are exact or
    * near-exact duplicates — [[exactGroups]]' hash dedup catches those
    * for a linear cost, which is why dropping them HERE is sound
    * pipeline design, not silent recall loss. 0 = unguarded (exact
    * band semantics, what the DuckDB oracle mirrors). */
  def lshCandidates(signatures: DataFrame, numHashes: Int = 8,
      rowsPerBand: Int = 2, maxBucket: Int = 0): DataFrame = {
    val bands = capBuckets(bandRows(signatures, numHashes, rowsPerBand),
      Seq("band", "band_key"), maxBucket)
    val l = bands.select(col("band"), col("band_key"), col("id").as("id_a"))
    val r = bands.select(col("band"), col("band_key"), col("id").as("id_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Drop key-group buckets holding more than `maxBucket` members
    * before a bucket self-join. No-op when maxBucket <= 0. (Shared with
    * [[Similarity.knnGraph]]'s bucket blocking.) */
  private[graft] def capBuckets(rows: DataFrame, keys: Seq[String],
      maxBucket: Int): DataFrame =
    if (maxBucket <= 0) rows
    else {
      val hot = rows.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") > maxBucket)
        .drop("__c")
      rows.join(hot, keys, "left_anti")
    }

  /** Exact Jaccard over shingle sets for the given candidate pairs only.
    *
    * The shingle relation is deliberately NOT cached: it is an exploded
    * (≈10×) copy of the corpus text, so at scale materializing it costs
    * far more than recomputing the narrow normalize+split+explode stage
    * per consumer — and Spark recomputes it inside each shuffle's map
    * side, never holding it whole. */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = explodedShingles(docs, idCol, textCol)
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(grams.select(col("id").as("id_a"), col("gram")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("gram").as("gram_b")), Seq("id_b"))
      .filter(col("gram") === col("gram_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → band candidates →
    * exact-Jaccard verification ≥ threshold. */
  def minHashLshPairs(docs: DataFrame, threshold: Double, numHashes: Int = 8,
      rowsPerBand: Int = 2, idCol: String = "doc_id",
      textCol: String = "text", maxBucket: Int = 0): DataFrame =
    jaccardVerify(docs,
      lshCandidates(minhashSignatures(docs, numHashes, idCol, textCol),
        numHashes, rowsPerBand, maxBucket),
      idCol, textCol)
      .filter(col("jaccard") >= threshold)

  /** b-bit minwise hashing (Li & König, WWW 2010 / CACM 2011): store
    * only the lowest `b` bits of each of `numHashes` minhash
    * components and recover resemblance from the b-bit collision rate
    * — the signature-width scale path. At 100 TB a 64-bit × K
    * signature store is itself tens of TB; b = 2 cuts the stored and
    * shuffled signature bytes 32× while the paper's estimator keeps
    * the estimate usable: collisions now happen by chance with
    * probability ~1/2^b, so the raw rate P_b overstates resemblance
    * and the unbiased form divides the excess out,
    *
    *   R̂ = (P_b − 1/2^b) / (1 − 1/2^b)
    *
    * (the paper's Theorem 1 in its r₁, r₂ → 0 limit — the sparse
    * regime where each doc's shingle set is vanishingly small against
    * the shingle universe, which md5-hashed word shingles satisfy; the
    * full C₁/C₂ correction needs the universe-relative set sizes and
    * collapses to this form there). Negative excess clamps to 0.
    *
    * For each candidate pair this emits the b-bit estimate NEXT TO the
    * plain minhash estimate (k_full/K) and the exact shingle Jaccard,
    * all in floored micro over exact integer counts — the calibration
    * readout that says whether b bits suffice at the corpus's actual
    * similarity levels (the `dedup_lsh_calibration` posture
    * ([[lshBandPlanCurveSql]]), one level down the compression
    * ladder).
    *
    * Scale shape: signatures are ONE combine-agg ([[minhashSignatures]]);
    * the per-perm long relation joins the bounded candidate-pair set
    * (broadcast) keyed by doc id, so the corpus is never paired with
    * itself; the exact-Jaccard verify reuses [[jaccardVerify]]'s
    * bounded inter/size joins. */
  def bBitMinhashEstimate(docs: DataFrame, pairs: DataFrame, b: Int = 2,
      numHashes: Int = 16, unit: Long = 1000000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(b >= 1 && b <= 16, s"b=$b out of [1, 16]")
    require(numHashes >= 2 && numHashes <= 64, "numHashes in [2, 64]")
    val mask = 1L << b
    val sig = minhashSignatures(docs, numHashes, idCol, textCol)
    val long = sig.select(col("id"), explode(array((0 until numHashes).map(
        i => struct(lit(i).as("perm"), col(s"h$i").as("hv"))): _*)).as("__s"))
      .select(col("id"), col("__s.perm").as("perm"), col("__s.hv").as("hv"))
    val pr = broadcast(pairs.select(col("id_a"), col("id_b")))
    val matches = long.join(pr, long("id") === pr("id_a"))
      .select(col("id_a"), col("id_b"), col("perm"), col("hv").as("__ha"))
      .join(long.select(col("id").as("id_b"), col("perm"),
        col("hv").as("__hb")), Seq("id_b", "perm"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("__ha") === col("__hb"), 1L).otherwise(0L))
          .as("k_full"),
        sum(when(col("__ha") % mask === col("__hb") % mask, 1L)
          .otherwise(0L)).as("k_bbit"))
    val grams = explodedShingles(docs, idCol, textCol)
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val jac = pr
      .join(grams.select(col("id").as("id_a"), col("gram")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("gram")),
        Seq("id_b", "gram"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__i"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("__sa")),
        Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("__sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr(s"($unit * __i) div (__sa + __sb - __i)").as("jaccard_micro"))
    matches.join(jac, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("k_full"), col("k_bbit"),
        expr(s"($unit * k_full) div $numHashes").as("minhash_est_micro"),
        expr(s"""CASE WHEN $mask * k_bbit <= $numHashes THEN 0L
               |  ELSE ($unit * ($mask * k_bbit - $numHashes))
               |    div (${numHashes}L * ${mask - 1}L) END""".stripMargin)
          .as("bbit_est_micro"),
        coalesce(col("jaccard_micro"), lit(0L)).as("jaccard_micro"))
  }

  /** SimHash signature (default 16 bits): bit j is the sign of the sum of
    * ±1 votes from each distinct word's hash bit j. */
  def simhashSignatures(docs: DataFrame, bits: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = explodedShingles(docs, idCol, textCol)
      .withColumn("h", hashStr(col("gram"), 999))
    val votes = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$j"))
    val sig = (0 until bits).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    grams.groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, found via
    * pigeonhole banding: split the signature into maxHamming+1 chunks; any
    * pair within distance shares ≥1 identical chunk, so an equi-join on
    * (chunk index, chunk value) finds all of them without O(n²).
    * `maxBucket` bounds degenerate chunk buckets exactly as in
    * [[lshCandidates]]. */
  def simhashNearPairs(signatures: DataFrame, bits: Int = 16,
      maxHamming: Int = 3, maxBucket: Int = 0): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = bits / nChunks
    val mask = (1L << chunkBits) - 1
    // one explode, not a union of per-chunk projections — same reasoning
    // as lshCandidates: keep the signature aggregation in the plan once
    // per join side instead of once per chunk per side
    val chunkArr = array((0 until nChunks).map(i =>
      struct(lit(i).as("chunk"),
        shiftright(col("simhash"), i * chunkBits).bitwiseAND(lit(mask))
          .as("ck"))): _*)
    val chunks = capBuckets(
      signatures
        .select(col("id"), col("simhash"), explode(chunkArr).as("__c"))
        .select(col("id"), col("simhash"),
          col("__c").getField("chunk").as("chunk"),
          col("__c").getField("ck").as("ck")),
      Seq("chunk", "ck"), maxBucket)
    val l = chunks.select(col("chunk"), col("ck"), col("id").as("id_a"),
      col("simhash").as("sig_a"))
    val r = chunks.select(col("chunk"), col("ck"), col("id").as("id_b"),
      col("simhash").as("sig_b"))
    l.join(r, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Edit-distance (Levenshtein) near-dup pairs under a hard bound
    * `maxDist`, verified by Spark's codegen `levenshtein(l, r, threshold)`
    * kernel — the threshold form is O(len·maxDist) banded DP with early
    * exit, not the full O(len²) matrix, so verification cost scales with
    * the bound, not the text.
    *
    * Candidates come from LOSSLESS length blocking (the first filter of
    * Ed-Join/PassJoin, Xiao et al. VLDB'08): |len(a)−len(b)| > maxDist
    * implies dist > maxDist, so docs are bucketed by `floor(len/W)` with
    * W > maxDist and each doc is exploded to buckets {b, b+1} — any
    * qualifying pair then shares ≥1 bucket key, and the pair relation is
    * a bucket equi-join (never all-pairs). Length blocking alone leaves
    * same-length clusters quadratic at corpus scale: compose with a
    * content blocker for production (feed [[lshCandidates]] /
    * [[simhashNearPairs]] output through the same verify join), or set
    * `maxBucket` > 0 to drop degenerate length buckets exactly as in
    * [[lshCandidates]]. Candidates are distinct id pairs only — texts
    * join back for the single verify pass, so nothing wide is shuffled
    * twice. Output (id_a < id_b, len_a, len_b, edit_dist ≤ maxDist). */
  def editDistancePairs(docs: DataFrame, maxDist: Int, bucketWidth: Int = 0,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = 0): DataFrame = {
    val w = if (bucketWidth > 0) bucketWidth else maxDist + 1
    require(w > maxDist,
      s"bucketWidth=$w must exceed maxDist=$maxDist for lossless blocking")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("len", length(col("t")))
    val bucket = floor(col("len") / lit(w)).cast("long")
    val keyed = capBuckets(
      base.select(col("id"), col("len"),
        explode(array(bucket, bucket + 1)).as("k")),
      Seq("k"), maxBucket)
    val l = keyed.select(col("k"), col("id").as("id_a"), col("len").as("len_a"))
    val r = keyed.select(col("k"), col("id").as("id_b"), col("len").as("len_b"))
    val cand = l.join(r, Seq("k"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select(col("id_a"), col("id_b"))
      .distinct()
    levenshteinVerify(base, cand, maxDist)
  }

  /** Join texts back onto distinct (id_a, id_b) candidates and keep the
    * pairs within `maxDist` by the threshold-banded levenshtein kernel
    * (returns -1 above the bound — O(len·maxDist) early-exit codegen).
    * `base` = (id, t, len). Shared verify tail of [[editDistancePairs]]
    * and [[editPassJoinPairs]].
    *
    * A LOSSLESS character-histogram prune runs before the text join:
    * every edit operation moves the a–z count histogram by at most 2 in
    * L1 (substitution: −1/+1; insert/delete: 1), so
    * ed(a,b) ≥ L1(hist_a, hist_b)/2 — candidates with L1 > 2·maxDist
    * cannot verify and are dropped while still carrying only their
    * 26-int histograms (the full text never shuffles for them; measured
    * at sf0.1 the bound kills 83% of length-block candidates). The
    * projection to a–z only weakens the bound (subset L1 ≤ full L1), so
    * losslessness is independent of the corpus alphabet. */
  private def levenshteinVerify(base: DataFrame, cand: DataFrame,
      maxDist: Int): DataFrame = {
    val hists = base.select(col("id"),
      expr("transform(sequence(97, 122), " +
        "c -> length(t) - length(replace(t, chr(c), '')))").as("__h"))
    cand
      .join(hists.select(col("id").as("id_a"), col("__h").as("__ha")),
        Seq("id_a"))
      .join(hists.select(col("id").as("id_b"), col("__h").as("__hb")),
        Seq("id_b"))
      .filter(expr("aggregate(zip_with(__ha, __hb, (x, y) -> abs(x - y)), " +
        "0, (acc, v) -> acc + v)") <= lit(2 * maxDist))
      .select(col("id_a"), col("id_b"))
      .join(base.select(col("id").as("id_a"), col("t").as("__ta"),
        col("len").as("len_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("t").as("__tb"),
        col("len").as("len_b")), Seq("id_b"))
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select(col("id_a"), col("id_b"), col("len_a"), col("len_b"),
        col("edit_dist"))
  }

  /** PassJoin edit-distance self-join (Li/Deng/Feng, PVLDB 5(3) 2011):
    * the corpus-scale LOSSLESS content blocker that [[editDistancePairs]]'
    * length blocking is not. Each doc is partitioned into k = maxDist+1
    * segments (first k−(len mod k) of length ⌊len/k⌋, the rest one
    * longer); by pigeonhole, ed(r,s) ≤ maxDist means at least one
    * segment of the SHORTER string survives untouched and appears
    * verbatim in the longer one, shifted by δ with
    * |δ| + |Δ−δ| ≤ maxDist (Δ = length gap: edits strictly before the
    * surviving segment number ≥ |δ|, strictly after ≥ |Δ−δ|). So
    * candidates are an EQUI-JOIN between the segment relation keyed
    * (len, segment#, segment) and a probe-substring relation built from
    * the STATIC (Δ, segment#, δ) grid — a broadcast k-row relation
    * (≤ (maxDist+1)³ rows, e.g. 729 at maxDist=8), never a cartesian on
    * data. Probe volume is O(maxDist²) short substrings per doc — the
    * published cost — and candidates shrink from length-block's
    * same-length-cluster quadratic to near-output-size (36 candidates
    * for 25 true pairs on the registry fixture vs 12,140 length-block
    * candidates). Docs shorter than k characters are excluded (k
    * non-empty segments need k chars; strings that short are cheaper
    * under [[editDistancePairs]]). `maxBucket` caps degenerate segment
    * buckets (boilerplate clusters) exactly as in [[lshCandidates]].
    * Output: (id_a < id_b, len_a, len_b, edit_dist ≤ maxDist) —
    * identical relation to [[editDistancePairs]] at the same bound. */
  def editPassJoinPairs(docs: DataFrame, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = 0): DataFrame = {
    val d = maxDist
    val k = d + 1
    val ss = docs.sparkSession
    import ss.implicits._
    val grid = (for {
      dl <- 0 to d; i <- 0 until k; de <- -d to d
      if math.abs(de) + math.abs(dl - de) <= d
    } yield (dl, i, de)).toDF("dl", "i", "de")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("len", length(col("t")))
    val hosts = base.filter(col("len") >= k)
    // the k-segment partition of every doc, in its own length's scheme
    val b0 = floor(col("len") / k).cast("int")
    val a0 = (col("len") % k).cast("int")
    def start0(i: Int) = lit(i) * b0 + greatest(lit(0), lit(i) - (lit(k) - a0))
    def slen0(i: Int) = b0 + when(lit(i) >= lit(k) - a0, 1).otherwise(0)
    val segs = capBuckets(
      hosts.select(col("id").as("id_r"), col("len").as("lp"),
        explode(array((0 until k).map(i => struct(lit(i).as("i"),
          col("t").substr(start0(i) + 1, slen0(i)).as("seg"))): _*)).as("__s"))
        .select(col("id_r"), col("lp"), col("__s.i").as("i"),
          col("__s.seg").as("seg")),
      Seq("lp", "i", "seg"), maxBucket)
    // probe substrings of every doc, in each possible partner-length
    // scheme lp = len − Δ, shifted by δ — static grid, broadcast
    val lp = col("len") - col("dl")
    val b1 = floor(lp / k).cast("int")
    val a1 = (lp % k).cast("int")
    val p1 = col("i") * b1 + greatest(lit(0), col("i") - (lit(k) - a1))
    val sl1 = b1 + when(col("i") >= lit(k) - a1, 1).otherwise(0)
    val pos = p1 + col("de") + 1 // 1-based
    val probes = hosts.crossJoin(broadcast(grid))
      .filter(lp >= k && pos >= 1 && pos + sl1 - lit(1) <= col("len"))
      .select(col("id"), lp.as("lp"), col("i"),
        col("t").substr(pos, sl1).as("seg"))
    val cand = segs.join(probes, Seq("lp", "i", "seg"))
      .filter(col("id_r") =!= col("id"))
      .select(least(col("id_r"), col("id")).as("id_a"),
        greatest(col("id_r"), col("id")).as("id_b"))
      .distinct()
    levenshteinVerify(base, cand, maxDist)
  }

  /** Near-dedup a corpus end-to-end: drop the higher-id member of every
    * verified MinHash-LSH pair. Greedy (not connected components): for a
    * chain a~b~c it keeps `a` and may keep `c` if (a,c) itself is below the
    * threshold — the standard one-pass policy used by large-scale text
    * dedup, avoiding an iterative graph computation. */
  def dropNearDuplicates(docs: DataFrame, threshold: Double,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val drops = minHashLshPairs(docs, threshold, numHashes, rowsPerBand, idCol, textCol)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** Cluster-complete near-dedup: transitive closure over the verified
    * pairs (connected components), keeping exactly the minimum-id
    * representative of each near-dup cluster. For a chain a~b~c where
    * (a,c) itself scores below the threshold, the greedy
    * [[dropNearDuplicates]] keeps BOTH a and c; this keeps only a. Costs
    * the component iteration on the pair graph — which is orders of
    * magnitude smaller than the corpus — on top of the same pair
    * generation. */
  def dropNearDuplicatesConnected(docs: DataFrame, threshold: Double,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = minHashLshPairs(docs, threshold, numHashes, rowsPerBand, idCol, textCol)
    val losers = Components.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("component")) // non-representative members
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dropNearDuplicatesConnected]] keeping the BEST-scoring member of
    * each near-dup cluster instead of the minimum id — what a production
    * pipeline actually wants (keep the longest / highest-quality copy,
    * drop the rest): representative = argmax (`scoreCol`, −id) per
    * component, one combine `max(struct)` over the component relation
    * (never a window). `scoreCol` must be integral (quality margins,
    * n_chars, token counts — the repo's scores all are); ties break to
    * the lowest id, so the survivor set is deterministic.
    *
    * Same scale shape as the min-id form plus two component-relation-
    * sized joins (the component relation is pair-graph-sized — orders
    * of magnitude under the corpus). */
  def dropNearDuplicatesConnectedBest(docs: DataFrame, threshold: Double,
      scoreCol: String, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = minHashLshPairs(docs, threshold, numHashes, rowsPerBand,
      idCol, textCol)
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
      .localCheckpoint(false) // pair-graph-sized; consumed twice below
    val scored = comp.join(
      docs.select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("long").as("__s")), Seq("id"))
    val reps = scored.groupBy(col("component"))
      .agg(max(struct(col("__s"), (-col("id")).as("__ni"))).as("__m"))
      .select((-col("__m").getField("__ni")).as("id"))
    val losers = comp.select(col("id"))
      .join(reps, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Character n-gram Jaccard between candidate pairs (brute within a
    * bounded slice; use MinHash-LSH for open-ended corpora). */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substring($textCol, i, $n))")))
          .as("gram"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("id").as("id_a"), col("gram"))
      .join(grams.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Cross-corpus near-duplicate pairs: (corpus_id, probe_id, jaccard)
    * for every corpus document whose shingle-set Jaccard against some
    * probe document reaches `threshold` — the train/test DECONTAMINATION
    * primitive (flag training docs that near-duplicate an eval-set
    * document). Same signature→band→verify pipeline as
    * [[minHashLshPairs]], but the band join is corpus × probes instead
    * of a self-join, so cost scales with the probe set: the probe side
    * of the band join and the verification joins is |probes|-sized
    * (eval sets are tiny next to a training corpus — Catalyst/AQE
    * broadcasts it), and the corpus is never self-paired. */
  def crossCorpusPairs(corpus: DataFrame, probes: DataFrame,
      threshold: Double, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cBands = bandRows(minhashSignatures(corpus, numHashes, idCol, textCol),
      numHashes, rowsPerBand)
    val pBands = bandRows(minhashSignatures(probes, numHashes, idCol, textCol),
      numHashes, rowsPerBand)
    val cand = cBands
      .select(col("band"), col("band_key"), col("id").as("corpus_id"))
      .join(pBands.select(col("band"), col("band_key"), col("id").as("probe_id")),
        Seq("band", "band_key"))
      .select(col("corpus_id"), col("probe_id"))
      .distinct()
    val cGrams = explodedShingles(corpus, idCol, textCol)
    val pGrams = explodedShingles(probes, idCol, textCol)
    val cSizes = cGrams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val pSizes = pGrams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(cGrams.select(col("id").as("corpus_id"), col("gram")), Seq("corpus_id"))
      .join(pGrams.select(col("id").as("probe_id"), col("gram").as("gram_b")),
        Seq("probe_id"))
      .filter(col("gram") === col("gram_b"))
      .groupBy(col("corpus_id"), col("probe_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cSizes.select(col("id").as("corpus_id"), col("sz").as("sz_a")),
        Seq("corpus_id"))
      .join(pSizes.select(col("id").as("probe_id"), col("sz").as("sz_b")),
        Seq("probe_id"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("probe_id"), col("jaccard"))
  }

  /** Containment-based decontamination pairs: for every (corpus doc,
    * probe doc) sharing word n-gram shingles,
    * containment = |shingles(corpus) ∩ shingles(probe)| / |shingles(probe)|
    * — the asymmetric criterion that catches a SHORT eval probe embedded
    * in a long training document, where the symmetric Jaccard of
    * [[crossCorpusPairs]] vanishes (the standard benchmark-contamination
    * rule: n-gram overlap measured against the probe, not the union).
    *
    * Scale shape: candidates come straight from the shared-shingle
    * equi-join of the probe shingle relation (probe-sized) against the
    * corpus shingle relation; |∩| falls out of that join with a
    * combine-agg keyed (corpus, probe), probe sizes join back from a
    * probe-sized aggregate, and the corpus is never self-paired. Word
    * n-gram shingles are high-entropy join keys, so the gram join has no
    * hot keys — the reason this blocks on n-grams and never unigrams. */
  def crossCorpusContainment(corpus: DataFrame, probes: DataFrame,
      threshold: Double, n: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cG = wordShingles(corpus, n, idCol, textCol)
      .select(col("id").as("corpus_id"), col("gram"))
    val pG = wordShingles(probes, n, idCol, textCol)
      .select(col("id").as("probe_id"), col("gram"))
    val pSizes = pG.groupBy(col("probe_id")).agg(count(lit(1)).as("__psz"))
    cG.join(pG, Seq("gram"))
      .groupBy(col("corpus_id"), col("probe_id"))
      .agg(count(lit(1)).as("inter"))
      .join(pSizes, Seq("probe_id"))
      .withColumn("containment", col("inter") / col("__psz"))
      .filter(col("containment") >= threshold)
      .select(col("corpus_id"), col("probe_id"), col("inter"),
        col("containment"))
  }

  /** Decontaminate a training corpus against an eval/benchmark probe
    * set: drop every corpus document flagged by [[crossCorpusPairs]].
    * The probe set itself is never modified. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
      threshold: Double, numHashes: Int = 8, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val contaminated = crossCorpusPairs(corpus, probes, threshold,
        numHashes, rowsPerBand, idCol, textCol)
      .select(col("corpus_id").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]]'s containment twin: drop every corpus document
    * containing at least `threshold` of ANY probe's shingles — the
    * benchmark-decontamination removal pass run before training. */
  def decontaminateContainment(corpus: DataFrame, probes: DataFrame,
      threshold: Double, n: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val contaminated = crossCorpusContainment(corpus, probes, threshold, n,
        idCol, textCol)
      .select(col("corpus_id").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[crossCorpusContainment]] with a BLOOM semi-join reduction — the
    * 100 TB form. The probe gram set is tiny (eval sets are thousands of
    * docs) but the corpus gram relation is corpus-sized, and the plain
    * gram equi-join shuffles ALL of it. Here a bloom filter over the
    * probe grams (built distributedly, collected driver-side like a
    * broadcast dimension, shipped as one reference object) drops
    * non-probe corpus grams MAP-SIDE, so the exchange carries roughly
    * |corpus grams ∩ probe grams| (+fpp of the rest) instead of every
    * corpus gram. Bloom filters have no false negatives and the exact
    * equi-join still verifies every survivor, so the result is
    * IDENTICAL to the ungated operator — only the shuffled volume
    * changes (DedupSpec asserts the equality).
    *
    * Driver memory bound: the filter costs ~1.2·|probe grams|·ln(1/fpp)
    * bits — `maxBloomBytes` fails loudly if a mis-sized probe set would
    * materialize a multi-GB filter on the driver. */
  def crossCorpusContainmentBloom(corpus: DataFrame, probes: DataFrame,
      threshold: Double, n: Int = 5, fpp: Double = 0.01,
      idCol: String = "doc_id", textCol: String = "text",
      maxBloomBytes: Long = 256L << 20): DataFrame = {
    // probe grams feed the size aggregate, the bloom build, and the join:
    // checkpoint the (probe-sized) relation so wordShingles runs once
    val pG = wordShingles(probes, n, idCol, textCol)
      .select(col("id").as("probe_id"), col("gram"))
      .localCheckpoint()
    val nGrams = math.max(pG.count(), 1L)
    val bloom = pG.stat.bloomFilter(hashStr(col("gram"), 91), nGrams, fpp)
    require(bloom.bitSize() / 8 <= maxBloomBytes,
      s"crossCorpusContainmentBloom: ${bloom.bitSize() / 8} bloom bytes for " +
        s"$nGrams probe grams exceeds maxBloomBytes=$maxBloomBytes — " +
        "shrink the probe set, raise fpp, or raise the cap")
    val cG = wordShingles(corpus, n, idCol, textCol)
      .select(col("id").as("corpus_id"), col("gram"))
      .filter(graft.functions.BloomFunctions.bloom_might_contain(
        hashStr(col("gram"), 91), bloom))
    val pSizes = pG.groupBy(col("probe_id")).agg(count(lit(1)).as("__psz"))
    cG.join(pG, Seq("gram"))
      .groupBy(col("corpus_id"), col("probe_id"))
      .agg(count(lit(1)).as("inter"))
      .join(pSizes, Seq("probe_id"))
      .withColumn("containment", col("inter") / col("__psz"))
      .filter(col("containment") >= threshold)
      .select(col("corpus_id"), col("probe_id"), col("inter"),
        col("containment"))
  }

  /** Content fingerprint ledger: one row per distinct normalized-content
    * md5 — the persisted "what have we already ingested" artifact of an
    * INCREMENTAL dedup pipeline (write it per snapshot; the next
    * snapshot's batch anti-joins against it instead of re-scanning every
    * previous snapshot). Vocabulary-of-contents-sized, map-side combined. */
  def fingerprintLedger(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(md5(normalize(col(textCol))).as("fingerprint")).distinct()

  /** Incremental-snapshot dedup: from a NEW batch, keep only documents
    * whose content was neither seen in the `ledger` (fingerprints of all
    * previous snapshots, [[fingerprintLedger]]) nor duplicated earlier in
    * the batch itself (min-id survivor, as everywhere in this module).
    *
    * Scale shape: one map-side fingerprint per row, a broadcast-friendly
    * anti-join against the ledger (ledger rows are distinct md5 strings —
    * far smaller than the corpus that produced them), and the standard
    * one-pass in-batch window. This is the daily-increment shape: the
    * full historical corpus is never re-read, only its ledger. */
  def dropSeenDocs(newDocs: DataFrame, ledger: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keyed = newDocs.withColumn("__fp", md5(normalize(col(textCol))))
    val unseen = keyed.join(
      ledger.select(col("fingerprint").as("__fp")), Seq("__fp"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col(idCol))
    unseen
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** [[dropSeenDocs]] as a STREAMING `foreachBatch` body: dedup the
    * micro-batch against the ledger at `ledgerPath` (absent on the first
    * batch = empty ledger), append the survivors' fingerprints back, and
    * return the survivors for the caller's sink. Turns incremental-
    * snapshot dedup into a live pipeline — each arriving batch sees
    * everything any earlier batch kept.
    *
    * Crash semantics: a retry after appending but before the sink commit
    * re-appends the same fingerprints — DUPLICATE LEDGER ROWS ARE
    * HARMLESS (the anti-join is idempotent in the ledger's multiplicity),
    * but the retried batch's survivors are then dropped as "seen", so
    * the sink must be idempotent at batch granularity, the standard
    * foreachBatch contract. Compact the ledger (distinct rewrite)
    * whenever duplicate mass grows noticeable. */
  def dedupBatchAgainstLedger(batch: DataFrame, ledgerPath: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    val ledger =
      try spark.read.parquet(ledgerPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(
                "fingerprint", org.apache.spark.sql.types.StringType))))
      }
    val fresh = dropSeenDocs(batch, ledger, idCol, textCol)
      .localCheckpoint() // survivors feed the append AND the caller's sink
    fingerprintLedger(fresh, textCol)
      .write.mode("append").parquet(ledgerPath)
    fresh
  }

  /** Fixed word-window span segmentation of the normalized text:
    * (id, span_idx, span) rows, where span `i` is words
    * `[i*spanWords, (i+1)*spanWords)` joined by single spaces. The last
    * span of a document may be shorter. Map-only (normalize + split +
    * posexplode; no shuffle). */
  def spanSegments(docs: DataFrame, spanWords: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__w", split(normalize(col(textCol)), " "))
      .select(col(idCol).as("id"),
        posexplode(transform(
          sequence(lit(1), size(col("__w")), lit(spanWords)),
          off => array_join(slice(col("__w"), off, lit(spanWords)), " "))))
      .select(col("id"), col("pos").cast("int").as("span_idx"),
        col("col").as("span"))

  /** Span-level exact dedup with reassembly (the C4/RefinedWeb
    * repeated-span REMOVAL policy, at fixed word-window granularity):
    * drop every span whose normalized content occurs in at least `minDf`
    * distinct documents — from ALL of them — and reassemble each
    * document from its surviving spans in order. Unlike
    * [[shingleDupStats]] (which only scores documents), this rewrites
    * the text, keeping the unique remainder of partially-boilerplate
    * documents instead of dropping or keeping them whole.
    *
    * Spans repeated only WITHIN one document (df = 1) are kept — that
    * signal is [[TextAnalysis.repetitionProfile]]'s.
    *
    * Scale shape: spans are map-only; df is a distinct-(key, doc) pass
    * then a count per key (shuffles keyed by the 128-bit span hash,
    * map-side combined); only the df ≥ minDf minority — boilerplate is
    * a small fraction of the span vocabulary — joins back to the span
    * rows; reassembly is one shuffle keyed by doc. The span text itself
    * never shuffles twice: the df relation carries only hashes. */
  def dropDuplicateSpans(docs: DataFrame, spanWords: Int = 20,
      minDf: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = spanSegments(docs, spanWords, idCol, textCol)
      .withColumn("__key", md5(col("span")))
    val dupKeys = spans.select(col("__key"), col("id")).distinct()
      .groupBy(col("__key")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("__key"), lit(true).as("__dup"))
    spans.join(dupKeys, Seq("__key"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
          when(col("__dup").isNull,
            struct(col("span_idx"), col("span"))))),
          s => s.getField("span")), " ").as("kept_text"))
      .select(col("id").as(idCol), col("n_spans"), col("n_dropped"),
        col("kept_text"))
  }

  /** WITHIN-document repeated-span removal: keep the FIRST occurrence
    * of each distinct span inside a document, drop later repeats — the
    * repetition-trimming cleanup for degenerate generation loops and
    * template stutter. Cross-document boilerplate is
    * [[dropDuplicateSpans]]'s job; the two compose.
    *
    * Shape: one aggregation keyed (doc, span hash) with map-side
    * combine — first occurrence is just min(span_idx) — then the
    * reassembly aggregation keyed by doc. No joins at all. */
  def dropRepeatedSpansWithinDoc(docs: DataFrame, spanWords: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    spanSegments(docs, spanWords, idCol, textCol)
      .withColumn("__key", md5(col("span")))
      .groupBy(col("id"), col("__key"))
      .agg(min(col("span_idx")).as("first_idx"),
        first(col("span")).as("span"), // one key ↔ one span text
        count(lit(1)).as("occ"))
      .groupBy(col("id"))
      .agg(sum(col("occ")).as("n_spans"),
        sum(col("occ") - 1).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
          struct(col("first_idx"), col("span")))),
          s => s.getField("span")), " ").as("kept_text"))
      .select(col("id").as(idCol), col("n_spans"), col("n_dropped"),
        col("kept_text"))

  /** Streaming exact dedup: drop re-arrivals of the same content key while
    * it is inside the watermark window. State is bounded — the key expires
    * once the watermark passes its event time (unbounded-state streaming
    * dedup dies at corpus scale; the watermark bound is what makes this a
    * production shape). The key is the md5 content hash, so replays and
    * byte-identical re-crawls are dropped, not just identical rows.
    *
    * Input must carry an event-time column; output is the deduplicated
    * stream with the content key attached. */
  def streamingDropDuplicates(docs: DataFrame, tsCol: String,
      watermark: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_key", md5(normalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_key")

  /** Band-miss recall of the MinHash-LSH pipeline against exhaustive
    * Jaccard ground truth on a BOUNDED slice — the dedup counterpart of
    * [[Similarity.recallAtK]]: verified LSH pairs are a subset of the
    * exact relation by construction (every candidate is re-checked with
    * exact Jaccard), so precision is 1 and the number that matters is
    * recall — the fraction of true ≥-threshold pairs the banding scheme
    * surfaces, i.e. the knob check for (numHashes, rowsPerBand) against
    * a given threshold. Ground truth is a brute shingle-sharing
    * self-join: bounded-slice-only by design, like
    * [[ngramJaccardPairs]] (production corpora tune on a slice, then
    * run the banded pipeline everywhere). Output is one row:
    * (n_exact, n_lsh, recall_micro). */
  def lshRecallEval(docs: DataFrame, threshold: Double, numHashes: Int = 8,
      rowsPerBand: Int = 2, idCol: String = "doc_id",
      textCol: String = "text", unit: Long = 1000000L): DataFrame = {
    val grams = explodedShingles(docs, idCol, textCol)
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val exact = grams.select(col("id").as("id_a"), col("gram"))
      .join(grams.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sa")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sb")), Seq("id_b"))
      .filter(col("i") / (col("sa") + col("sb") - col("i")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val lsh = minHashLshPairs(docs, threshold, numHashes, rowsPerBand,
        idCol, textCol)
      .select(col("id_a"), col("id_b"), lit(1L).as("__hit"))
    exact.join(lsh, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_lsh"))
      .select(col("n_exact"), col("n_lsh"),
        expr(s"($unit * n_lsh) div greatest(n_exact, 1)").as("recall_micro"))
  }

  /** Row-local minhash signature key — the same seeded 60-bit hashes as
    * [[minhashSignatures]], but computed as a pure column expression
    * (array_min over the row's shingle set per seed, no aggregation),
    * which is what makes it usable as a streaming dedup key. Empty
    * shingle sets (docs that normalize to nothing) fall back to the
    * exact content hash so they never all collide on one key. */
  def signatureKey(textCol: Column, numHashes: Int = 8): Column = {
    val grams = filter(array_distinct(split(normalize(textCol), " ")),
      g => g =!= "")
    val sig = (0 until numHashes)
      .map(i => array_min(transform(grams, g => hashStr(g, i))))
    when(size(grams) === 0, concat(lit("e:"), md5(normalize(textCol))))
      .otherwise(concat_ws(",", sig: _*))
  }

  /** Streaming NEAR-dup dedup: drop arrivals whose full minhash
    * signature collides with an earlier document inside the watermark
    * window — the streaming counterpart of the MinHash batch pipeline,
    * with the band-join replaced by signature-key state lookup (state is
    * watermark-bounded exactly like [[streamingDropDuplicates]]).
    *
    * Matching on the FULL signature is the conservative end of the LSH
    * dial: two documents collide only when every one of the `numHashes`
    * minima agrees — certain for identical shingle SETS (reorderings,
    * duplicated words, whitespace/punctuation variants), probability
    * ≈ J^numHashes for Jaccard-J pairs, so false drops are vanishingly
    * rare. Recall for partial overlaps is deliberately traded away;
    * batch band-LSH remains the thorough pass, this gate stops the
    * (overwhelmingly common) trivial-rewrite floods in flight. */
  def streamingDropNearDuplicates(docs: DataFrame, tsCol: String,
      watermark: String, numHashes: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("sig_key", signatureKey(col(textCol), numHashes))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("sig_key")

  /** Corpus-level similarity matrix between sources via bottom-k
    * sketches (Broder 1997's minwise estimator in its bottom-k form;
    * Cohen & Kaplan 2007) — the dedup-triage view ABOVE the document
    * level: which pairs of crawl sources / dumps / snapshots share so
    * much shingle mass that cross-source dedup should run between them
    * at all. Estimating all P² source overlaps from per-source sketches
    * costs a fraction of one document-level dedup pass.
    *
    * Per source: the k smallest distinct 60-bit shingle hashes (its
    * bottom-k sketch). Per source pair: merge the two sketches, keep
    * the k' = min(k, |union|) smallest of the union, and count members
    * present in BOTH sketches — j_micro = unit·|both ∩ bottom-k'(∪)|
    * div k', an unbiased Jaccard estimate. Every step is integer /
    * hash arithmetic on md5 values, so the oracle replays it exactly.
    *
    * Scale shape: the corpus collapses to distinct (source, hash) in
    * one map-side-combined pass; per-source bottom-k is a window over
    * that distinct relation (partitioned by source — never global);
    * everything after operates on the P·k-row sketch relation. The
    * source inventory is collected to the driver to enumerate pairs —
    * bounded by definition (it is the stratum inventory, same class as
    * [[Curation.stratifiedSample]]'s rates dim; SCALING.md). Pair
    * expansion is two equi-joins of the pair list against the sketch
    * relation — no cross join, no theta join.
    *
    * `maxSources` is the named quadratic-corner guard (SCALING.md
    * principle 6, same class as `maxBloomBytes` above): the broadcast
    * pair list is P·(P−1)/2 rows, so a mis-pointed `srcCol` (e.g. a
    * doc-id column with 10k distinct values) would silently build a
    * 50M-row broadcast. Fail loudly instead; a catalog genuinely wider
    * than the default needs the caller to raise the cap consciously. */
  def sourceBottomKSim(docs: DataFrame, n: Int = 3, k: Int = 128,
      srcCol: String = "source", textCol: String = "text",
      unit: Long = 1000000L, maxSources: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashes = wordShingles(docs, n, idCol = srcCol)
      .select(col("id").as("source"), hashStr(col("gram"), 0).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"))
    val sk = hashes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
      .localCheckpoint()
    // bounded stratum inventory (see scaladoc) — enumerate ordered pairs
    val sources = sk.select(col("source")).distinct()
      .as[String].collect().sorted
    require(sources.length <= maxSources,
      s"sourceBottomKSim: ${sources.length} distinct '$srcCol' values " +
        s"exceeds maxSources=$maxSources — the pair list is P*(P-1)/2 " +
        s"rows and would broadcast ${sources.length.toLong * (sources.length - 1) / 2} " +
        "pairs; check srcCol points at a source/dump column (not an id), " +
        "or raise maxSources explicitly")
    val pairs = broadcast(
      (for { a <- sources; b <- sources if a < b } yield (a, b))
        .toSeq.toDF("s1", "s2"))
    val merged = pairs
      .join(sk.select(col("source").as("s1"), col("h")), Seq("s1"))
      .select(col("s1"), col("s2"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs
        .join(sk.select(col("source").as("s2"), col("h")), Seq("s2"))
        .select(col("s1"), col("s2"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(max(col("in_a")).as("a"), max(col("in_b")).as("b"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s1"), col("s2")).orderBy(col("h"))
    merged.withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= k)
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("k_eff"),
        sum(col("a") * col("b")).as("n_both"))
      .select(col("s1"), col("s2"),
        expr(s"($unit * n_both) div k_eff").as("j_micro"))
  }

  /** Exact word-set-Jaccard self-join via PREFIX FILTERING (the
    * SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 / Xiao et al.
    * WWW'08): all pairs with Jaccard(words(a), words(b)) ≥ num/den,
    * without LSH's false negatives and without the all-pairs join
    * [[ngramJaccardPairs]] pays.
    *
    * Why it is exact: if J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉ (because
    * |A∪B| ≥ |A|), so at most |A| − ⌈t·|A|⌉ members of A fall outside
    * the intersection; ordering every set by one GLOBAL token order and
    * keeping each set's first |X| − ⌈t·|X|⌉ + 1 tokens (its prefix),
    * any qualifying pair must collide on at least one prefix token.
    * The candidate join therefore loses nothing, and the verification
    * step keeps exactly the qualifying pairs.
    *
    * The global order is ascending document frequency (ties by token),
    * so prefixes hold each document's RAREST tokens — the candidate
    * join's key distribution is the df ordering's tail, which is what
    * makes the filter selective: frequent tokens (huge buckets) never
    * appear in a prefix unless a set is almost all stopwords.
    *
    * Two further LOSSLESS prunes run inside the candidate join, both
    * from the PPJoin paper:
    *  - length filter: J ≥ t forces den·|B| ≥ num·|A| and vice versa —
    *    a join-condition conjunct, so mismatched-length pairs never
    *    leave the probe.
    *  - positional filter: both sets are sorted by the SAME global
    *    order, so at a pair's FIRST shared prefix token (ranks i, j)
    *    nothing earlier matched, and overlap ≤ 1 + min(|A|−i, |B|−j).
    *    Requiring that bound to reach the overlap threshold
    *    α = ⌈num·(|A|+|B|) / (num+den)⌉ for AT LEAST ONE shared
    *    occurrence is lossless (a qualifying pair's minimal occurrence
    *    witnesses it) and kills the hot-bucket corner: pairs meeting
    *    only at a LATE prefix position — exactly what a shared
    *    semi-common token produces — fail the bound. Measured on the
    *    sf0.1 slice: 1.8M raw candidates → 512k after both prunes.
    *
    * All arithmetic is integer: the threshold is the rational num/den,
    * prefix length is n − ((num·n + den − 1) div den) + 1, and the
    * verification predicate is c·den ≥ num·(n_a + n_b − c) — no float
    * division, so a SQL oracle replays it bit-exactly.
    *
    * Two further LOSSLESS structural optimizations (round 10):
    *
    *  - IDENTICAL-SET COLLAPSE. Documents with the exact same token SET
    *    have pairwise J = 1 ≥ any threshold; the candidate machinery
    *    never needs to see more than ONE representative per distinct
    *    set. Sets are grouped by the sorted token array ITSELF (no hash
    *    signature — collision-free by construction), within-group pairs
    *    are emitted directly (inter = uni = n), and qualifying
    *    representative pairs are expanded back through the membership
    *    relation with least/greatest id normalization. Candidate-join
    *    work drops quadratically in the duplication factor.
    *
    *  - MAP-SIDE PREFIXES. Each set's tokens are sorted ONCE by the
    *    global (df, token) order inside the per-doc aggregation
    *    (sort_array over (df, token) structs); the prefix is then just
    *    slice + posexplode over the stored array — no per-doc
    *    row_number window, no join back to sizes. Removes two shuffles
    *    and the window exchange from the hot path.
    *
    * Scale shape: one tokenize+distinct pass (shuffle on (id, token)),
    * one map-side-combined df aggregation (token-sized relation, joined
    * back to order tokens), one per-id array aggregation, one
    * array-keyed group collapse, then the pruned candidate equi-join on
    * prefix tokens and verification as the textbook PPJoin step:
    * candidates equi-join the per-set SORTED TOKEN ARRAY relation (one
    * row per distinct set) and intersect map-side — no per-token
    * explosion, no |candidates|·|tokens| shuffle. Membership expansion
    * is two more equi-joins sized by the OUTPUT. No cross join
    * anywhere. */
  def prefixFilterJaccardPairs(docs: DataFrame, num: Int, den: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(num > 0 && num <= den,
      s"prefixFilterJaccardPairs: threshold $num/$den must be in (0, 1]")
    val words = docs.select(col(idCol).as("id"),
        explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .localCheckpoint() // 2 consumers: df relation, per-doc arrays
    val dfRel = words.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // Per-doc token array sorted by the GLOBAL (df, token) order — the
    // sort happens once here; prefixes and verification both reuse it.
    val docSets = words.join(dfRel, Seq("w"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("dws"))
      .select(col("id"), expr("transform(dws, x -> x.w)").as("ws"))
    // Collapse identical token sets: group key is the sorted array
    // itself (collision-free). gid = min member id stands in for the
    // whole group during candidate generation + verification.
    // wsl re-sorts the set lexically (UTF8 binary order): the verify
    // merge-intersect kernel ([[graft.functions.TextOps.sortedIntersectCount]])
    // requires sortedness under STRING comparison, which the (df, w)
    // global order does not provide.
    val groups = docSets.groupBy(col("ws"))
      .agg(min(col("id")).as("gid"), collect_list(col("id")).as("ids"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("wsl", sort_array(col("ws")))
      .localCheckpoint() // consumers: within-pairs, prefixes, verify, expand
    // Identical sets: J = 1, qualifies at any threshold ≤ 1. All pair
    // generation is map-side over the stored member array.
    val within = groups.filter(size(col("ids")) >= 2)
      .select(col("n"), explode(col("ids")).as("id_a"), col("ids"))
      .select(col("n"), col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("n").as("inter"),
        col("n").as("uni"))
    // Prefix = first (n − ⌈t·n⌉ + 1) tokens of the stored global-order
    // array; rank comes free from posexplode. Map-side, no window.
    val prefixes = groups
      .select(col("gid"), col("n"),
        posexplode(slice(col("ws"), lit(1),
          (col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1)
            .cast("int"))))
      .select(col("gid"), col("col").as("w"), (col("pos") + 1).as("rk"),
        col("n"))
    val cand = prefixes
      .select(col("gid").as("gid_a"), col("w"), col("rk").as("rk_a"),
        col("n").as("n_a"))
      .join(prefixes.select(col("gid").as("gid_b"), col("w"),
          col("rk").as("rk_b"), col("n").as("n_b")),
        Seq("w"))
      .filter(col("gid_a") < col("gid_b") &&
        col("n_b") * den >= col("n_a") * num &&
        col("n_a") * den >= col("n_b") * num)
      .filter(lit(1) + least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b")) >=
        expr(s"($num * (n_a + n_b) + ${num + den - 1}) div ${num + den}"))
      .select(col("gid_a"), col("gid_b"))
      .distinct()
    val verified = cand
      .join(groups.select(col("gid").as("gid_a"), col("wsl").as("ws_a"),
        col("n").as("n_a")), Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), col("wsl").as("ws_b"),
        col("n").as("n_b")), Seq("gid_b"))
      // The optimizer inlines the qualifying filter into the join
      // condition and duplicates the intersect; the merge-count kernel
      // keeps each (possibly triplicated) eval allocation-free.
      .withColumn("inter", graft.functions.TextFunctions
        .sorted_intersect_count(col("ws_a"), col("ws_b")))
      .filter(col("inter") * den >= (col("n_a") + col("n_b") - col("inter")) * num)
      .select(col("gid_a"), col("gid_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("uni"))
    // Expand representative pairs through group membership; member ids
    // of different groups interleave, so normalize with least/greatest.
    val cross = verified
      .join(groups.select(col("gid").as("gid_a"), explode(col("ids")).as("ia")),
        Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), explode(col("ids")).as("ib")),
        Seq("gid_b"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("inter"), col("uni"))
    within.unionByName(cross)
  }

  /** Snapshot-over-snapshot diff: per document id, whether the new
    * crawl/corpus snapshot ADDED, REMOVED, CHANGED, or left the
    * document unchanged relative to the old one — change detection by
    * normalized-content hash, the gate for incremental reprocessing
    * (only `added`/`changed` docs re-enter the dedup/quality/embedding
    * pipeline; `removed` ids propagate deletions downstream).
    *
    * Scale shape: each side collapses to (id, 128-bit content hash)
    * map-side BEFORE the exchange — the full-outer equi-join on id
    * shuffles 16-byte digests, never text. One shuffle total; status
    * is a map-side case over the joined hashes. At 100 TB the two
    * snapshots are bucketed by id on write ([[graft.sources.Layout]])
    * and the join is zero-exchange. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      md5(normalize(col(textCol))).as("__h_old"))
    val n = newSnap.select(col(idCol).as("id"),
      md5(normalize(col(textCol))).as("__h_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed"))
      .select(col("id"), col("status"))
  }

  /** Content-defined chunking dedup profile (the gear/Rabin CDC family,
    * token-granular): a token ends a chunk iff its content hash ≡ 0
    * mod `divisor` — boundaries move WITH the content, so an insertion
    * early in a document shifts only its own chunk, and every other
    * chunk still hashes identically (the property fixed-width
    * [[spanSegments]] spans lack; this is how backup/dedup stores and
    * long-doc near-dup pipelines localize edits). Expected chunk length
    * = `divisor` tokens.
    *
    * Output, per document: n_tokens, n_chunks, n_shared_chunks (chunks
    * whose content key also appears in ≥ 1 OTHER document),
    * shared_frac_micro. Zero-token docs report (0, 0, 0, 0).
    *
    * Scale shape: one posexplode pass; the chunk id is a per-DOC
    * running-sum window; chunk keys aggregate by (md5 of the joined
    * chunk text); sharing is one combine-agg over the chunk-key
    * relation (distinct-doc count per key) joined back by key. No
    * cross products, nothing global. */
  def cdcChunkProfile(docs: DataFrame, divisor: Int = 8, seed: Int = 31,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(divisor >= 1, "divisor must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(split(normalize(col(textCol)), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .withColumn("__b",
        when(pmod(hashStr(col("w"), seed), lit(divisor.toLong)) === 0, 1L)
          .otherwise(0L))
      // exclusive prefix sum: a boundary token is the LAST of its chunk
      .withColumn("chunk",
        sum(col("__b")).over(W.partitionBy(col("id")).orderBy(col("pos")))
          - col("__b"))
    val chunks = toks.groupBy(col("id"), col("chunk"))
      .agg(count(lit(1)).as("clen"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w")), " ")).as("ckey"))
      .localCheckpoint()
    val sharing = chunks.groupBy(col("ckey"))
      .agg(countDistinct(col("id")).as("__ndocs"))
    val perDoc = chunks.join(sharing, Seq("ckey"))
      .groupBy(col("id"))
      .agg(sum(col("clen")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("__ndocs") > 1, 1L).otherwise(0L))
          .as("n_shared_chunks"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_shared_chunks"), lit(0L)).as("n_shared_chunks"))
      .withColumn("shared_frac_micro",
        expr(s"($unit * n_shared_chunks) div greatest(n_chunks, 1)"))
  }

  /** C4-style line/sentence-level dedup (Raffel et al. 2020 §2.2): any
    * sentence whose normalized form occurs in at least `minOccurrences`
    * DOCUMENTS corpus-wide is boilerplate (cookie banners, nav bars,
    * license headers) and is dropped from every document; the document
    * survives with its remaining sentences in original order. This is
    * the between-doc LINE granularity the span/chunk families don't
    * cover (spans are fixed word windows; chunks are hash-bounded runs).
    *
    * Output per document: n_sentences, n_dropped, kept_text (the
    * surviving sentences re-joined with ". "), and the md5 of the kept
    * text for cheap downstream exact-dedup. Sentence split: on `.`
    * followed by whitespace — the [[graft.ops.Chunking]] convention.
    *
    * Scale shape: one posexplode pass; the repeated-sentence relation
    * is one combine-agg on the sentence's md5 (distinct-doc counts —
    * NEVER the sentence text after the hash is taken); the drop test
    * joins back on the hash; reassembly is one per-doc combine-agg with
    * a pos-sorted bounded buffer (sentences of ONE doc). */
  def lineDedup(docs: DataFrame, minOccurrences: Int = 3,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences must be at least 2")
    val sent = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\.\\s+")).as(Seq("pos", "s")))
      .withColumn("s", trim(col("s")))
      .filter(col("s") =!= "")
      .withColumn("__h", md5(normalize(col("s"))))
      .localCheckpoint()
    val freq = sent.groupBy(col("__h"))
      .agg(countDistinct(col("id")).as("__nd"))
    val marked = sent.join(freq, Seq("__h"))
      .withColumn("__drop", col("__nd") >= minOccurrences)
    val perDoc = marked.groupBy(col("id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(!col("__drop"),
            struct(col("pos"), col("s"))))),
          x => x.getField("s")), ". ").as("kept_text"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .withColumn("dropped_frac_micro",
        expr(s"($unit * n_dropped) div greatest(n_sentences, 1)"))
      .withColumn("kept_md5", md5(col("kept_text")))
  }

  /** Exact-dedup token-impact rollup per stratum — the "what does dedup
    * actually SAVE" readout that justifies the pipeline stage: per
    * stratum, document and whitespace-token totals, how many of each
    * sit in non-canonical exact duplicates (the rows dedup removes),
    * and the token savings rate in micro units. Token counting is the
    * [[graft.ops.TextAnalysis.tokenCount]] whitespace convention.
    *
    * Scale shape: one content-hash combine-agg (min id per key — the
    * [[exactGroups]] relation), a hash-keyed join back, one
    * stratum-sized output agg. */
  def dedupTokenImpact(docs: DataFrame, strataCol: String,
      unit: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(strataCol),
      graft.ops.TextAnalysis.tokenCount(col(textCol)).cast("long")
        .as("__tok"),
      md5(normalize(col(textCol))).as("__k"))
    val keeper = keyed.groupBy(col("__k")).agg(min(col("id")).as("__keep"))
    keyed.join(keeper, Seq("__k"))
      .withColumn("__dup", col("id") =!= col("__keep"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("__tok")).as("total_tokens"),
        sum(when(col("__dup"), col("__tok")).otherwise(0L))
          .as("dup_tokens"))
      .withColumn("savings_micro",
        expr(s"($unit * dup_tokens) div greatest(total_tokens, 1)"))
  }

  /** Exponentiation by an exact power-of-two exponent as a squaring
    * chain (`x², (x²)², …`) — log₂(e) IEEE multiplications in a fixed
    * order, so Spark and any other IEEE-double engine that evaluates
    * the same chain produce bit-identical results. `Math.pow`/libm
    * `pow` are NOT correctly rounded and may differ in the last ulp
    * between engines; the chain sidesteps that by construction. */
  private def powChain(x: Column, e: Int): Column = {
    require(e >= 1 && (e & (e - 1)) == 0, s"exponent $e must be a power of two")
    var c = x
    var k = 1
    while (k < e) { c = c * c; k *= 2 }
    c
  }

  /** The SQL mirror of [[powChain]]: the same squaring chain spelled as
    * a nested expression (subexpression duplication is value-identical
    * to the reused temporary). */
  private[graft] def powChainSql(x: String, e: Int): String = {
    require(e >= 1 && (e & (e - 1)) == 0, s"exponent $e must be a power of two")
    var c = x
    var k = 1
    while (k < e) { c = s"($c * $c)"; k *= 2 }
    c
  }

  /** MinHash-LSH band-plan calibration (Leskovec–Rajaraman–Ullman, MMDS
    * ch. 3): for every (bands b, rows-per-band r) plan and every Jaccard
    * similarity on the grid s = i/gridDen, the band-collision
    * probability p(s) = 1 − (1 − s^r)^b — the S-curve that decides how
    * a signature budget b·r is split before a corpus-sized dedup run.
    * Steeper r sharpens the curve around the plan's threshold
    * (≈ (1/b)^(1/r)); more bands shift it left (higher recall, more
    * candidate pairs to verify).
    *
    * Engine portability: s is one IEEE division (i/gridDen), s^r and
    * (1 − s^r)^b are [[powChain]] squaring chains (r and b restricted
    * to powers of two), and the final probability rounds to micro
    * units — every step is a fixed sequence of IEEE-double operations
    * both engines evaluate identically, so the curve oracle-replays
    * exactly without trusting `pow`.
    *
    * Output: (b, r, s_micro, p_micro), |plans|·(gridDen−1) rows — a
    * constant-size audit relation (it reads no corpus; it PLANS the run
    * that will). */
  def lshBandPlanCurve(spark: org.apache.spark.sql.SparkSession,
      plans: Seq[(Int, Int)] = Seq((32, 2), (16, 4), (8, 8)),
      gridDen: Int = 20, unit: Long = 1000000L): DataFrame = {
    import spark.implicits._
    plans.map { case (b, r) =>
      (1 until gridDen).map(i => (b, r, i)).toDF("b", "r", "i")
        .withColumn("s_micro", expr(s"CAST(i AS BIGINT) * $unit div $gridDen"))
        .withColumn("__s", col("i").cast("double") / lit(gridDen.toDouble))
        .withColumn("__p",
          lit(1.0) - powChain(lit(1.0) - powChain(col("__s"), r), b))
        .select(col("b"), col("r"), col("s_micro"),
          round(col("__p") * unit, 0).cast("long").as("p_micro"))
    }.reduce(_ unionByName _)
  }

  /** Exact duplicated-substring spans (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — the
    * ExactSubstr method): every maximal contiguous character region of
    * a document covered by length-`minLen` substrings that occur at
    * least `minOcc` times across the corpus (positions counted
    * globally, so within-document repetition counts — the paper's
    * semantics). One row per merged span: (id, span_start 1-based,
    * span_end, span_len, n_windows).
    *
    * Equivalence to the suffix-array formulation: a substring of
    * length ≥ L repeats iff every one of its L-windows repeats, and a
    * character is inside SOME duplicated substring of length ≥ L iff
    * some duplicated L-window covers it — so duplicated-L-window
    * coverage, merged into maximal runs, is EXACTLY the byte set
    * ExactSubstr's suffix array marks for removal (up to md5 window
    * collisions, the same 128-bit caveat as [[exactDedup]]). The paper
    * builds a suffix array because a single machine can afford n log n
    * pointers; relationally the same rendezvous is ONE hash shuffle of
    * the n window keys — no log n prefix-doubling rounds, no global
    * sort.
    *
    * Scale shape: the window relation is corpus-CHARACTER-sized (the
    * suffix array's own scale), built by a map-only explode; one
    * combine-agg on the window hash (duplicate keys collapse map-side),
    * one semi-join back, one per-document window for the interval
    * merge (never global). At 100 TB, run it on token ids instead of
    * characters (n/5 rows) and swap md5 for a 128-bit rolling hash —
    * both change constants, not shape. */
  def exactSubstringSpans(docs: DataFrame, minLen: Int = 20,
      minOcc: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    require(minOcc >= 2, "minOcc must be at least 2")
    val starts = windowHashes(docs, minLen, idCol, textCol)
    val dup = starts.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minOcc)
      .select(col("g"))
    mergeWindowRuns(starts.join(dup, Seq("g"), "left_semi"), minLen)
      .withColumnRenamed("id", idCol)
  }

  /** Exact-substring DECONTAMINATION (the [[exactSubstringSpans]]
    * machinery pointed across a corpus boundary — the Carlini/Lee
    * exact-memorization probe the Jaccard/containment decon family
    * approximates): for every eval document, the maximal character
    * regions covered by length-`minLen` windows that occur ANYWHERE in
    * the training corpus, aggregated to a per-document coverage
    * fraction. An eval item with high exact coverage is IN the
    * training set in the only sense that matters for a leaderboard.
    *
    * Output per eval doc (all eval docs, zero rows back-joined):
    * (id, n_spans, covered_chars, n_chars, coverage_micro).
    *
    * Scale shape: train side is one distinct-window combine-agg (its
    * windows collapse map-side); the rendezvous is one equi-join keyed
    * by window hash, sized by the EVAL side (benchmarks, not corpora).
    * With `bloomGate = true` the `decon_bloom_gate` posture applies:
    * a driver bloom over the eval window hashes drops non-matching
    * train windows BELOW the exchange (the 100 TB shape — the train
    * corpus never shuffles its non-candidate windows), under
    * [[crossCorpusContainmentBloom]]'s `maxBloomBytes` discipline.
    * Unlike the containment gate, the bloom here is RESULT-EXACT, not
    * approximate: false positives only admit extra train windows into
    * the distinct set, and the exact hash equi-join scrubs them — the
    * gated and ungated plans return identical rows (the differential
    * twin `decon_exact_substring_bloom` pins it). */
  def exactSubstringContamination(evalDocs: DataFrame, trainDocs: DataFrame,
      minLen: Int = 20, idCol: String = "doc_id",
      textCol: String = "text", bloomGate: Boolean = false,
      fpp: Double = 0.01, maxBloomBytes: Long = 256L << 20): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    val evalW0 = windowHashes(evalDocs, minLen, idCol, textCol)
    val evalW = if (bloomGate) evalW0.localCheckpoint() else evalW0
    val trainW0 = windowHashes(trainDocs, minLen, idCol, textCol)
    val trainPre = if (bloomGate) {
      val nW = math.max(evalW.count(), 1L)
      // xxhash64 over the BINARY window key (not hashStr, which would
      // re-hex the 16 bytes just to md5 them again): build and probe
      // use the same codegen'd long derivation, which is all the bloom
      // contract needs
      val bloom = evalW.stat.bloomFilter(
        xxhash64(lit(91), col("g")), nW, fpp)
      require(bloom.bitSize() / 8 <= maxBloomBytes,
        s"exactSubstringContamination: ${bloom.bitSize() / 8} bloom bytes " +
          s"for $nW eval windows exceeds maxBloomBytes=$maxBloomBytes — " +
          "shrink the eval set, raise fpp, or raise the cap")
      trainW0.filter(graft.functions.BloomFunctions.bloom_might_contain(
        xxhash64(lit(91), col("g")), bloom))
    } else trainW0
    val trainW = trainPre.select(col("g")).distinct()
    contaminationCoverage(evalDocs, evalW, trainW, minLen, idCol, textCol)
  }

  /** The shared decon tail: eval windows semi-joined against a distinct
    * train-window set, merged into spans, rolled up to per-eval-doc
    * coverage with zero-coverage docs back-joined — factored out so the
    * scan path ([[exactSubstringContamination]]) and the ledger path
    * ([[exactSubstringContaminationLedger]]) are the same code. */
  private def contaminationCoverage(evalDocs: DataFrame, evalW: DataFrame,
      trainW: DataFrame, minLen: Int, idCol: String,
      textCol: String): DataFrame = {
    val spans = mergeWindowRuns(evalW.join(trainW, Seq("g"), "left_semi"),
      minLen)
    val perDoc = spans.groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("covered_chars"))
    evalDocs.select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        col("n_chars"),
        expr("(1000000 * coalesce(covered_chars, 0L)) div greatest(n_chars, 1L)")
          .as("coverage_micro"))
  }

  /** [[exactSubstringSpans]] over TOKEN windows — the scale form the
    * character operator's scaladoc promises ("at 100 TB, run it on
    * token ids instead of characters"): windows are `minLen`
    * consecutive post-normalize words, so the corpus-sized relation
    * carries ONE row per token (≈n/5 of the character form's rows at
    * English token lengths) and the span resolution coarsens to word
    * boundaries — exactly the Lee et al. trade made by every
    * production ExactSubstr run (the paper itself dedups token
    * sequences, not bytes). One row per merged span, positions in
    * TOKEN units: (id, span_start, span_end, span_len, n_windows).
    * Same combine-agg + semi-join + per-doc merge shape as the
    * character form; [[mergeWindowRuns]] is shared verbatim (the merge
    * is position-algebra, blind to the unit). */
  def exactSubstringSpansTokens(docs: DataFrame, minLen: Int = 6,
      minOcc: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    require(minOcc >= 2, "minOcc must be at least 2")
    val starts = tokenWindowHashes(docs, minLen, idCol, textCol)
    val dup = starts.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minOcc)
      .select(col("g"))
    mergeWindowRuns(starts.join(dup, Seq("g"), "left_semi"), minLen)
      .withColumnRenamed("id", idCol)
  }

  /** One row per length-`L` TOKEN window: (id, s 1-based token start,
    * g = binary md5 of the space-joined window) — the token-unit
    * sibling of [[windowHashes]]. Corpus-TOKEN-sized; map-only. */
  private def tokenWindowHashes(docs: DataFrame, L: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        filter(split(normalize(col(textCol)), " "), w => w =!= "")
          .as("__w"))
      .withColumn("__n", size(col("__w")).cast("long") - lit(L - 1L))
      .filter(col("__n") >= 1L)
      .select(col("id"), explode(sequence(lit(1L), col("__n"))).as("s"),
        col("__w"))
      .select(col("id"), col("s"),
        unhex(md5(concat_ws(" ",
          slice(col("__w"), col("s").cast("int"), lit(L))))).as("g"))

  /** Exact-substring decontamination over TOKEN windows — the n-gram
    * overlap decon run by the GPT-3 (Brown et al. 2020, appendix C:
    * 13-gram dedup against benchmarks) and PaLM training pipelines:
    * for every eval document, the maximal TOKEN regions covered by
    * length-`minLen` word windows that occur anywhere in the training
    * corpus, rolled up to per-doc token coverage. The token twin of
    * [[exactSubstringContamination]] exactly as
    * [[exactSubstringSpansTokens]] twins [[exactSubstringSpans]]:
    * same combine-agg + semi-join + per-doc merge shape, positions
    * and the denominator in post-[[normalize]] word units.
    *
    * Output per eval doc (all eval docs, zero rows back-joined):
    * (id, n_spans, covered_tokens, n_tokens, coverage_micro).
    *
    * Scale shape: the train side is ONE distinct-window combine-agg
    * over a corpus-TOKEN-sized map-only explode (≈n/5 of the
    * character form's rows); the rendezvous equi-join is sized by the
    * EVAL side (benchmarks, not corpora). Docs shorter than `minLen`
    * words contribute no windows but still report their n_tokens. */
  def exactSubstringContaminationTokens(evalDocs: DataFrame,
      trainDocs: DataFrame, minLen: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    val evalW = tokenWindowHashes(evalDocs, minLen, idCol, textCol)
    val trainW = tokenWindowHashes(trainDocs, minLen, idCol, textCol)
      .select(col("g")).distinct()
    val spans = mergeWindowRuns(evalW.join(trainW, Seq("g"), "left_semi"),
      minLen)
    val perDoc = spans.groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("covered_tokens"))
    evalDocs.select(col(idCol).as("id"),
        size(filter(split(normalize(col(textCol)), " "), w => w =!= ""))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        col("n_tokens"),
        expr("(1000000 * coalesce(covered_tokens, 0L)) " +
          "div greatest(n_tokens, 1L)").as("coverage_micro"))
  }

  /** The distinct train-window hash set of one corpus snapshot — the
    * WINDOW-level ledger for incremental exact-substring
    * decontamination ([[fingerprintLedger]]'s posture one level down:
    * that ledger remembers whole-document fingerprints, this one
    * remembers every length-`minLen` window, so it answers the
    * Carlini/Lee exact-memorization probe without the train corpus).
    * One row per distinct window: (window_hash BINARY(16)).
    *
    * Production contract: build once per snapshot (the ONE
    * corpus-character-sized pass over that snapshot), persist, and
    * [[appendSubstringLedger]] on snapshot append — after which every
    * new benchmark decons against the ledger alone
    * ([[exactSubstringContaminationLedger]]): the 100 TB train corpus
    * is read once per snapshot, ever, not once per benchmark. The
    * ledger is distinct-window-sized — the corpus's duplicated mass
    * collapses, and it only grows with NOVEL text. */
  def substringWindowLedger(docs: DataFrame, minLen: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    windowHashes(docs, minLen, idCol, textCol)
      .select(col("g").as("window_hash")).distinct()
  }

  /** Extend a persisted window ledger with a NEW snapshot: append the
    * snapshot's distinct windows at `ledgerPath`. Duplicate ledger rows
    * (windows already present from earlier snapshots, or a crash-retry
    * re-append) are HARMLESS — the decon probe semi-joins, which is
    * idempotent in ledger multiplicity ([[dedupBatchAgainstLedger]]'s
    * crash contract); compact with a distinct rewrite when duplicate
    * mass grows noticeable. Only the snapshot is scanned — never the
    * corpus behind the existing ledger. */
  def appendSubstringLedger(snapshot: DataFrame, ledgerPath: String,
      minLen: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    substringWindowLedger(snapshot, minLen, idCol, textCol)
      .write.mode("append").parquet(ledgerPath)

  /** Exact-substring decontamination AGAINST A LEDGER
    * ([[exactSubstringContamination]] with the train side replaced by
    * a persisted [[substringWindowLedger]]): per eval doc, the maximal
    * regions covered by length-`minLen` windows present in the ledger,
    * rolled up to coverage — value-identical to the scan form over the
    * corpus the ledger was built from (same distinct window set, same
    * semi-join; DedupSpec pins the equivalence).
    *
    * Scale shape: the only corpus-character-sized relation is the EVAL
    * side's window explode (benchmarks, not corpora); the ledger joins
    * by window hash with no derivation — the probe plan never touches
    * a train document (PlanSpec pins scan provenance). `minLen` is the
    * caller's contract with the ledger build. */
  def exactSubstringContaminationLedger(evalDocs: DataFrame,
      ledger: DataFrame, minLen: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minLen >= 2 && minLen <= 10000, "minLen in [2, 10000]")
    val evalW = windowHashes(evalDocs, minLen, idCol, textCol)
    // distinct is load-bearing for multiplicity-tolerance: appended
    // snapshots may re-list a window, and left_semi would be correct
    // anyway, but the distinct keeps the join's build side minimal
    val trainW = ledger.select(col("window_hash").as("g")).distinct()
    contaminationCoverage(evalDocs, evalW, trainW, minLen, idCol, textCol)
  }

  /** Exact duplicated-substring REMOVAL — the end product of the Lee
    * et al. ExactSubstr pipeline: every character covered by a
    * duplicated window ≥ `minLen` is dropped and the survivors are
    * stitched back in order. (The fixed-window analogue is
    * [[dropDuplicateSpans]]; this is the maximal-span exact form —
    * removal boundaries land exactly at the duplicated region's edges,
    * not at word-window quanta.)
    *
    * Output per document (ALL documents — span-free docs pass through
    * whole): (id, n_chars, removed_chars, kept_chars, kept_text).
    *
    * Shape: [[exactSubstringSpans]] + one per-doc window pass to turn
    * spans into KEPT segments (lag of span_end, plus the tail segment
    * from the per-doc span aggregate), one equi-join back to the text,
    * and a per-doc ordered reassembly (collect_list → array_sort →
    * concat — bounded by the doc's own segment count, the
    * [[dropDuplicateSpans]] reassembly discipline). */
  def removeDuplicateSubstrings(docs: DataFrame, minLen: Int = 20,
      minOcc: Int = 2, idCol: String = "doc_id",
      textCol: String = "text",
      spansOpt: Option[DataFrame] = None): DataFrame = {
    // spansOpt: a precomputed [[exactSubstringSpans]] relation (same
    // docs/minLen/minOcc — caller's contract) so a session fixture can
    // share the corpus-character-sized window pipeline across consumers
    val spans = spansOpt
      .getOrElse(exactSubstringSpans(docs, minLen, minOcc, idCol, textCol))
      .withColumnRenamed(idCol, "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("span_start"))
    // kept segment BEFORE each span: [prev_end+1, start-1] (head: from 1)
    val mids = spans
      .withColumn("__gs", coalesce(lag(col("span_end"), 1).over(w), lit(0L)) + 1L)
      .select(col("id"), col("__gs"), (col("span_start") - 1L).as("__ge"))
    // tail segment AFTER the last span: [max_end+1, len]
    val tails = spans.groupBy(col("id"))
      .agg(max(col("span_end")).as("__last"),
        sum(col("span_len")).as("__removed"))
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__t"),
      length(col(textCol)).cast("long").as("__len"))
    val segs = mids
      .unionByName(base.join(tails, Seq("id"))
        .select(col("id"), (col("__last") + 1L).as("__gs"),
          col("__len").as("__ge")))
      .filter(col("__ge") >= col("__gs"))
    val kept = segs.join(base, Seq("id"))
      .select(col("id"), col("__gs"),
        expr("substring(__t, CAST(__gs AS INT), CAST(__ge - __gs + 1 AS INT))")
          .as("__seg"))
      .groupBy(col("id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("__gs"), col("__seg")))),
        s => s.getField("__seg"))).as("kept_text"))
    base
      .join(tails, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("__len").as("n_chars"),
        coalesce(col("__removed"), lit(0L)).as("removed_chars"),
        (col("__len") - coalesce(col("__removed"), lit(0L))).as("kept_chars"),
        // span-free docs keep their text whole; docs removed ENTIRELY
        // (one span covering everything) keep the empty string
        when(col("__removed").isNull, col("__t"))
          .otherwise(coalesce(col("kept_text"), lit(""))).as("kept_text"))
  }

  /** One row per length-`L` character window: (id, s 1-based start,
    * g = BINARY md5 of the window, 16 bytes) — the shared relation of
    * the exact-substring family. Corpus-character-sized by
    * construction (the suffix array's own scale); map-only. The key is
    * unhex'd to binary BEFORE the exchange (VERDICT r15 item 2): this
    * relation feeds the family's dominant shuffle, and the 32-char hex
    * form was exactly 2× the bytes of the same 128-bit value — the
    * oracle never sees g (spans/coverage are the compared outputs), so
    * the cut is representation-only. */
  private def windowHashes(docs: DataFrame, L: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("__n", length(col("__t")).cast("long") - lit(L - 1L))
      .filter(col("__n") >= 1L)
      .select(col("id"), explode(sequence(lit(1L), col("__n"))).as("s"),
        col("__t"))
      .select(col("id"), col("s"),
        expr(s"unhex(md5(substring(__t, CAST(s AS INT), $L)))").as("g"))

  /** Merge hit windows (id, s) into maximal contiguous covered runs:
    * one per-id window pass (lag gap-flag + running run id), then one
    * combine-agg per run → (id, span_start, span_end, span_len,
    * n_windows). Never a global window. */
  private def mergeWindowRuns(hits: DataFrame, L: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("s"))
    hits
      .withColumn("__prev", lag(col("s"), 1).over(w))
      // new run iff the previous window's span [prev, prev+L-1] does
      // not reach or touch this one: s > prev + L (adjacent merges —
      // coverage is contiguous across abutting windows)
      .withColumn("__new",
        when(col("__prev").isNull || col("s") > col("__prev") + L, 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col("id"), col("__run"))
      .agg(min(col("s")).as("span_start"),
        (max(col("s")) + lit(L - 1L)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1L)
      .select(col("id"), col("span_start"), col("span_end"),
        col("span_len"), col("n_windows"))
  }

  /** DuckDB mirror of [[lshBandPlanCurve]] (same plans, grid, squaring
    * chains, micro rounding). */
  def lshBandPlanCurveSql(
      plans: Seq[(Int, Int)] = Seq((32, 2), (16, 4), (8, 8)),
      gridDen: Int = 20, unit: Long = 1000000L): String = {
    val perPlan = plans.map { case (b, r) =>
      val s = s"(CAST(i AS DOUBLE) / $gridDen)"
      val p = s"(1.0 - ${powChainSql(s"(1.0 - ${powChainSql(s, r)})", b)})"
      s"""SELECT $b AS b, $r AS r,
         |  CAST(i AS BIGINT) * $unit // $gridDen AS s_micro,
         |  CAST(round($p * $unit) AS BIGINT) AS p_micro
         |FROM range(1, $gridDen) t(i)""".stripMargin
    }
    perPlan.mkString("", "\nUNION ALL\n", "\nORDER BY b, r, s_micro")
  }
}
