package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.T

/** Round-13 extension registry: exact time-series autocorrelation, the
  * WordPiece tokenizer (completing the BPE / unigram-LM / WordPiece
  * subword triad), the exp2Micro-powered exact training ops (integer
  * logistic GD → dataset cartography; DoReMi domain reweighting), each
  * with a full DuckDB replay oracle.
  */
object LlmQueries14 {

  /** Sample ACF of the hourly event-count series per event_type at lags
    * 1..4 ([[graft.ops.Sessions.autocorrelation]]): the seasonality /
    * burstiness readout. Exact: the estimator is multiplied through by
    * n² so both sums are integer products of centered counts
    * (n·x_t − S), ridden in DECIMAL(38,0), and acf_micro is one
    * sign-split integral division. */
  def eventAutocorr(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sessions.autocorrelation(
        T.par(spark, T.t(spark, dir, "events")), maxLag = 4)
      .orderBy(col("event_type"), col("lag"))

  /** WordPiece tokenizer, trained and served under the gate
    * ([[graft.ops.TextAnalysis.trainWordPieceVocab]] →
    * [[graft.ops.TextAnalysis.wordPieceSegmentStats]]) — the greedy
    * longest-match-first third of the subword triad. The oracle replays
    * everything: position-kind candidate counting (word-initial vs
    * continuation), the pinned (count desc, initial-first, piece)
    * top-512 ∪ single-chars vocabulary, and the greedy walk as 16
    * unrolled steps — each advancing every unfinished chunk by its
    * longest matching piece — so per-doc piece/UNK counts and fertility
    * match bit-for-bit. */
  def textWordpieceSegment(spark: SparkSession, dir: String): DataFrame = {
    val docs = T.par(spark, T.t(spark, dir, "documents"))
    val vocab = graft.ops.TextAnalysis.trainWordPieceVocab(docs)
    graft.ops.TextAnalysis.wordPieceSegmentStats(docs, vocab)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_autocorr" -> (eventAutocorr _),
    "text_wordpiece_segment" -> (textWordpieceSegment _),
  )

  /** Unrolled SQL replay of the WordPiece tokenizer — normalized words
    * → 16-char chunks (the unigram oracle's shared shape) → (piece,
    * cont) candidate counts → pinned top-512 ∪ single-chars vocab →
    * per-distinct-chunk greedy walk as 16 unrolled steps (state =
    * (pos, n_pieces, unk); each step joins the longest matching piece
    * of the position's kind, a stuck chunk becomes one [UNK]) → per-doc
    * aggregates. Mirrors
    * [[graft.ops.TextAnalysis.wordPieceSegmentStats]] exactly. */
  private def wordpieceOracle: String = {
    val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
      "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    val steps = (1 to 16).map { k =>
      s"""wm$k AS (SELECT g.chunk, g.pos, max(l.l) AS ml
         |  FROM wg${k - 1} g
         |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, 6)) AS l) l
         |  JOIN wvoc v ON v.piece =
         |      substr(g.chunk, CAST(g.pos + 1 AS INTEGER), CAST(l.l AS INTEGER))
         |    AND v.cont = (g.pos > 0)
         |  WHERE g.unk = 0 AND g.pos < length(g.chunk)
         |    AND g.pos + l.l <= length(g.chunk)
         |  GROUP BY 1, 2),
         |wg$k AS MATERIALIZED (SELECT g.chunk,
         |    CASE WHEN g.unk = 1 OR g.pos >= length(g.chunk)
         |           OR m.ml IS NULL THEN g.pos
         |         ELSE g.pos + m.ml END AS pos,
         |    CASE WHEN g.unk = 1 OR g.pos >= length(g.chunk) THEN g.np
         |         WHEN m.ml IS NULL THEN CAST(1 AS BIGINT)
         |         ELSE g.np + 1 END AS np,
         |    CASE WHEN g.unk = 1 THEN 1
         |         WHEN g.pos >= length(g.chunk) THEN 0
         |         WHEN m.ml IS NULL THEN 1 ELSE 0 END AS unk
         |  FROM wg${k - 1} g
         |  LEFT JOIN wm$k m ON m.chunk = g.chunk AND m.pos = g.pos)""".stripMargin
    }.mkString(",\n")
    s"""WITH wz AS (SELECT doc_id, string_split($norm, ' ') AS ws
       |  FROM documents),
       |w AS (SELECT doc_id AS id, ws[CAST(r.i + 1 AS INTEGER)] AS word
       |  FROM wz CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(0, len(ws) - 1)) AS i) r
       |  WHERE ws[CAST(r.i + 1 AS INTEGER)] <> ''),
       |ch AS MATERIALIZED (SELECT id,
       |    substr(word, CAST(k.k * 16 + 1 AS INTEGER), 16) AS chunk
       |  FROM w CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(0, (length(word) - 1) // 16)) AS k) k),
       |wpc AS MATERIALIZED (SELECT
       |    substr(chunk, CAST(i.i + 1 AS INTEGER), CAST(l.l AS INTEGER)) AS piece,
       |    i.i > 0 AS cont, CAST(count(*) AS BIGINT) AS c
       |  FROM ch
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, 6)) AS l) l
       |  CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(0, length(chunk) - 1)) AS i) i
       |  WHERE i.i + l.l <= length(chunk)
       |  GROUP BY 1, 2),
       |wtop AS (SELECT piece, cont FROM (SELECT piece, cont,
       |    row_number() OVER (ORDER BY c DESC, cont, piece) AS rn FROM wpc)
       |  WHERE rn <= 512),
       |wchr AS (SELECT piece, cont FROM wpc WHERE length(piece) = 1),
       |wvoc AS MATERIALIZED (SELECT DISTINCT piece, cont FROM
       |  (SELECT * FROM wtop UNION ALL SELECT * FROM wchr)),
       |wdch AS MATERIALIZED (SELECT DISTINCT chunk FROM ch),
       |wg0 AS (SELECT chunk, CAST(0 AS BIGINT) AS pos,
       |    CAST(0 AS BIGINT) AS np, 0 AS unk FROM wdch),
       |$steps,
       |wfin AS MATERIALIZED (SELECT chunk, np, CAST(unk AS BIGINT) AS unk
       |  FROM wg16),
       |wst AS (SELECT ch.id, CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(f.np) AS BIGINT) AS n_pieces,
       |    CAST(sum(f.unk) AS BIGINT) AS n_unk_chunks,
       |    CAST(sum(length(ch.chunk)) AS BIGINT) AS n_chars
       |  FROM ch JOIN wfin f ON f.chunk = ch.chunk GROUP BY ch.id)
       |SELECT d.doc_id,
       |  coalesce(wst.n_chunks, 0) AS n_chunks,
       |  coalesce(wst.n_pieces, 0) AS n_pieces,
       |  coalesce(wst.n_unk_chunks, 0) AS n_unk_chunks,
       |  coalesce(wst.n_chars, 0) AS n_chars,
       |  (1000000 * coalesce(wst.n_pieces, 0))
       |    // greatest(coalesce(wst.n_chars, 0), 1) AS fertility_micro
       |FROM documents d LEFT JOIN wst ON wst.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "text_wordpiece_segment" -> wordpieceOracle,
    "event_autocorr" ->
      """WITH cnt AS (
        |  SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT g, min(h) AS h0, max(h) AS h1,
        |    CAST(sum(x) AS HUGEINT) AS s, max(h) - min(h) + 1 AS n
        |  FROM cnt GROUP BY g),
        |grid AS (SELECT g, n, s, h0,
        |    unnest(generate_series(h0, h1)) AS h FROM span),
        |dense AS (SELECT gr.g, gr.n, gr.h - gr.h0 AS t,
        |    CAST(gr.n AS HUGEINT) * coalesce(c.x, 0) - gr.s AS c
        |  FROM grid gr LEFT JOIN cnt c ON c.g = gr.g AND c.h = gr.h),
        |den AS (SELECT g, max(n) AS n, sum(c * c) AS d
        |  FROM dense GROUP BY g),
        |pr AS (SELECT a.g, l.lag, sum(a.c * b.c) AS num
        |  FROM dense a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS lag) l
        |  JOIN dense b ON b.g = a.g AND b.t = a.t + l.lag
        |  GROUP BY a.g, l.lag)
        |SELECT pr.g AS event_type, CAST(pr.lag AS BIGINT) AS lag, den.n,
        |  CAST(CASE WHEN den.d = 0 THEN 0
        |       WHEN num >= 0 THEN (num * 1000000) // den.d
        |       ELSE -((-num * 1000000) // den.d) END AS BIGINT) AS acf_micro
        |FROM pr JOIN den ON den.g = pr.g
        |ORDER BY event_type, lag""".stripMargin,
  )
}
