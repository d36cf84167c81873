package graft.queries

/** DuckDB mirror of [[graft.ops.TextAnalysis.trainBpeMerges]] +
  * [[graft.ops.TextAnalysis.bpeTokenCount]] — the full BPE training and
  * serving trajectory in SQL, making `text_bpe_train` oracle-checkable.
  *
  * The trick that makes the dynamic lowest-rank-first merge loop
  * expressible: a word's tokenization is encoded as a delimited string
  * (`|t1||t2||t3|`), where applying one merge (a, b) is EXACTLY
  * `replace(s, '|a||b|', '|ab|')` — the full delimiters make false
  * matches impossible (tokens contain no `|` post-normalize) and
  * left-to-right non-overlapping replacement is precisely the kernel's
  * single-pass merge ([[graft.functions.BpeTable]]). Each tokenization
  * pass iterates `L` times: pick the minimum-rank table pair present
  * (a join against the merge relation), apply it everywhere, repeat —
  * reaching the fixpoint because every iteration strictly reduces token
  * count, so L ≥ maxWordLen−1 iterations always suffice (the corpus
  * bound is spec-asserted in TextAnalysisSpec).
  *
  * Training replays the kernel exactly: per round, re-tokenize the
  * vocabulary under the merges so far, count adjacent pairs weighted by
  * word frequency, and take the (count desc, a, b) argmax if it reaches
  * minFreq — the same unrolled-round discipline as `graph_pagerank` and
  * `KmeansSql`. CTEs are MATERIALIZED: the iteration chain references
  * each state twice, and un-materialized CTE inlining would expand the
  * plan exponentially.
  */
private[queries] object BpeSql {

  /** Tokenization-fixpoint iterations per pass. Words start as ≤
    * maxWordLen tokens and every iteration merges at least one pair, so
    * maxWordLen−1 always reaches the fixpoint; the synthetic corpus has
    * maxWordLen = 8 at every scale factor (spec-asserted bound ≤ 9). */
  private val L = 8

  /** One tokenization pass of the word relation `s0`(w, freq, s) under
    * the merge relation `mrel`(rank, a, b); returns (ctes, finalName). */
  private def passCtes(tag: String, mrel: String): (String, String) = {
    val sb = Seq.newBuilder[String]
    var prev = "s0"
    for (i <- 1 to L) {
      val cur = s"t${tag}_$i"
      sb += s"""tp${tag}_$i AS MATERIALIZED (
         |  SELECT t.w, min(m.rank) AS best
         |  FROM $prev t JOIN $mrel m
         |    ON contains(t.s, '|' || m.a || '||' || m.b || '|')
         |  GROUP BY t.w),
         |$cur AS MATERIALIZED (
         |  SELECT t.w, t.freq,
         |    CASE WHEN p.best IS NULL THEN t.s
         |         ELSE replace(t.s, '|' || mb.a || '||' || mb.b || '|',
         |                      '|' || mb.a || mb.b || '|') END AS s
         |  FROM $prev t
         |  LEFT JOIN tp${tag}_$i p ON p.w = t.w
         |  LEFT JOIN $mrel mb ON mb.rank = p.best)""".stripMargin
      prev = cur
    }
    (sb.result().mkString(",\n"), prev)
  }

  /** The complete `text_bpe_train` oracle: train `k` merges (minFreq 2)
    * on the corpus vocabulary, serve token counts corpus-wide. */
  def textBpeTrainSql(normSql: String, k: Int): String =
    "WITH " + trainServeCtes(normSql, k) + s"""
       |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS INTEGER) AS n_bpe_tokens
       |FROM documents d LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Per-language tokenizer fertility from the same trained merges:
    * fertility_micro = unit·Σ(bpe tokens) div Σ(words) per lang. */
  def textBpeFertilitySql(normSql: String, k: Int): String =
    "WITH " + trainServeCtes(normSql, k) + s""",
       |wcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw
       |  FROM dw GROUP BY doc_id)
       |SELECT d.lang,
       |  CAST(sum(coalesce(agg.n, 0)) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(coalesce(wcnt.nw, 0)) AS BIGINT) AS n_words,
       |  CAST((1000000 * sum(coalesce(agg.n, 0)))
       |       // greatest(sum(coalesce(wcnt.nw, 0)), 1) AS BIGINT)
       |    AS fertility_micro
       |FROM documents d LEFT JOIN agg USING (doc_id)
       |  LEFT JOIN wcnt USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  /** Shared train + serve chain, ending at `agg`(doc_id, n) = per-doc
    * BPE token counts, with `dw`(doc_id, wd) also in scope. */
  private def trainServeCtes(normSql: String, k: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""v AS MATERIALIZED (
       |  SELECT wd AS w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split($normSql, ' ')) AS wd FROM documents)
       |  WHERE wd <> '' GROUP BY wd),
       |s0 AS MATERIALIZED (SELECT w, freq,
       |  '|' || array_to_string(string_split(w, ''), '||') || '|' AS s
       |  FROM v),
       |m0 AS (SELECT CAST(NULL AS INTEGER) AS rank,
       |  CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b
       |  WHERE false)""".stripMargin
    for (r <- 1 to k) {
      val (frag, fin) = passCtes(s"r$r", s"m${r - 1}")
      parts += frag
      parts += s"""p$r AS (
         |  SELECT toks[i.range + 1] AS a, toks[i.range + 2] AS b,
         |    CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq,
         |          string_split(substring(s, 2, length(s) - 2), '||') AS toks
         |        FROM $fin) CROSS JOIN range(16) i
         |  WHERE i.range + 2 <= len(toks)
         |  GROUP BY 1, 2),
         |best$r AS (SELECT a, b FROM p$r WHERE n >= 2
         |  ORDER BY n DESC, a, b LIMIT 1),
         |m$r AS MATERIALIZED (SELECT * FROM m${r - 1}
         |  UNION ALL SELECT $r, a, b FROM best$r)""".stripMargin
    }
    val (ffrag, ffin) = passCtes("f", s"m$k")
    parts += ffrag
    parts += s"""wc AS (SELECT w,
       |  CAST((length(s) - length(replace(s, '||', '|')) + 1) AS BIGINT) AS nt
       |  FROM $ffin),
       |dw AS (SELECT doc_id, wd FROM (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS wd
       |  FROM documents) WHERE wd <> ''),
       |agg AS (SELECT dw.doc_id, CAST(sum(wc.nt) AS BIGINT) AS n
       |  FROM dw JOIN wc ON wc.w = dw.wd GROUP BY dw.doc_id)""".stripMargin
    parts.result().mkString(",\n")
  }
}
