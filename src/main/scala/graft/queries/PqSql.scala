package graft.queries

/** DuckDB mirror of [[graft.ops.Pq]]: unrolled fixed-iteration product-
  * quantization training, encoding, and ADC ranking in exact integer
  * micro-units.
  *
  * The Spark side quantizes elements to floor(x·10⁶) longs, assigns each
  * (vector, subspace) by exact-integer L2 argmin (ties to the lowest
  * cell), and updates centroids with exact integer means (offset
  * division) — so the whole trajectory replays bit-identically in SQL:
  *  - `seeds`: the k lowest-md5(id) vectors, cells numbered in hash order
  *    (exactly the Spark seeding, shared with `KmeansSql`);
  *  - `vm`: the flattened (vid, sub, i, micro) element relation;
  *  - per iteration: argmin assignment over summed integer squared
  *    diffs, then per-(sub, cell, i) integer mean with the +10⁹ offset
  *    making DuckDB's flooring `//` equal Spark's truncating division;
  *    empty cells carry the previous centroid forward (the coalesce);
  *  - `enc`: final-book assignment = the PQ codes.
  *
  * CTEs the iteration chain references more than once are MATERIALIZED
  * (the `BpeSql` lesson: plain CTE inlining expands the chain
  * exponentially). Same unrolled-oracle discipline as `KmeansSql` /
  * `graph_pagerank`.
  */
private[queries] object PqSql {

  /** CTE chain `{p}tr`, `{p}seeds`, `{p}vm`, `{p}b0`..`{p}b<iters>`,
    * `{p}enc`; requires a CTE `src`(vid BIGINT, v DOUBLE[]) in scope —
    * OR, when `vmFrom` names a relation (vid, sub, i, x) of
    * already-micro elements (the residual-PQ case), trains on THAT
    * instead of slicing `src`. `{p}vm` is the micro-unit element
    * relation; `{p}b<iters>` the trained codebook (sub, cell, i, c);
    * `{p}enc`(vid, sub, code) the corpus codes. `prefix` keeps the
    * names disjoint from other generators' chains (KmeansSql also
    * defines tr/seeds) when both are spliced into one oracle. */
  def trainCtes(k: Int, iters: Int, m: Int, subDim: Int,
      prefix: String = "", vmFrom: String = ""): String = {
    val p = prefix
    val sliceMicro =
      s"CAST(floor(v[CAST(s.range * $subDim + i.range + 1 AS INTEGER)] " +
        "* 1000000) AS BIGINT)"
    val iterCtes = (1 to iters).map { j =>
      s"""${p}d$j AS (SELECT vm.vid, vm.sub, b.cell,
         |    sum((vm.x - b.c) * (vm.x - b.c)) AS d
         |  FROM ${p}vm vm JOIN ${p}b${j - 1} b ON b.sub = vm.sub AND b.i = vm.i
         |  GROUP BY vm.vid, vm.sub, b.cell),
         |${p}a$j AS (SELECT vid, sub, cell FROM (
         |    SELECT vid, sub, cell,
         |      row_number() OVER (PARTITION BY vid, sub ORDER BY d, cell) AS rn
         |    FROM ${p}d$j) WHERE rn = 1),
         |${p}u$j AS (SELECT a.sub, a.cell, vm.i, count(*) AS n,
         |    sum(vm.x + 1000000000) AS sm
         |  FROM ${p}a$j a JOIN ${p}vm vm ON vm.vid = a.vid AND vm.sub = a.sub
         |  GROUP BY a.sub, a.cell, vm.i),
         |${p}b$j AS MATERIALIZED (SELECT pp.sub, pp.cell, pp.i,
         |    CAST(coalesce(u.sm // u.n - 1000000000, pp.c) AS BIGINT) AS c
         |  FROM ${p}b${j - 1} pp
         |  LEFT JOIN ${p}u$j u ON u.sub = pp.sub AND u.cell = pp.cell AND u.i = pp.i)"""
        .stripMargin
    }.mkString(",\n")
    val head = if (vmFrom.isEmpty)
      s"""${p}tr AS (SELECT vid, v FROM src),
         |${p}seeds AS (
         |  SELECT row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) - 1 AS cell, v
         |  FROM ${p}tr
         |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) <= $k),
         |${p}vm AS MATERIALIZED (SELECT vid, s.range AS sub, i.range AS i, $sliceMicro AS x
         |  FROM ${p}tr CROSS JOIN range($m) s CROSS JOIN range($subDim) i),
         |${p}b0 AS MATERIALIZED (SELECT cell, s.range AS sub, i.range AS i, $sliceMicro AS c
         |  FROM ${p}seeds CROSS JOIN range($m) s CROSS JOIN range($subDim) i)"""
        .stripMargin
    else
      // residual path: elements come pre-micro from `vmFrom`(vid, sub,
      // i, x); seeds keep the SAME k-lowest-md5(vid) rule, with b0
      // drawn from the element relation itself.
      s"""${p}tr AS (SELECT DISTINCT vid FROM $vmFrom),
         |${p}seeds AS (
         |  SELECT row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) - 1 AS cell, vid
         |  FROM ${p}tr
         |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) <= $k),
         |${p}vm AS MATERIALIZED (SELECT vid, sub, i, x FROM $vmFrom),
         |${p}b0 AS MATERIALIZED (SELECT s.cell, vm.sub, vm.i, vm.x AS c
         |  FROM ${p}seeds s JOIN ${p}vm vm ON vm.vid = s.vid)"""
        .stripMargin
    s"""$head,
       |$iterCtes,
       |${p}denc AS (SELECT vm.vid, vm.sub, b.cell,
       |    sum((vm.x - b.c) * (vm.x - b.c)) AS d
       |  FROM ${p}vm vm JOIN ${p}b$iters b ON b.sub = vm.sub AND b.i = vm.i
       |  GROUP BY vm.vid, vm.sub, b.cell),
       |${p}enc AS MATERIALIZED (SELECT vid, sub, cell AS code FROM (
       |    SELECT vid, sub, cell,
       |      row_number() OVER (PARTITION BY vid, sub ORDER BY d, cell) AS rn
       |    FROM ${p}denc) WHERE rn = 1)""".stripMargin
  }

  /** Residual-space ADC ranking (the IVFADC serve): requires in scope
    *  - `cand`(qid, nid, cell): probe-restricted candidate pairs WITH
    *    the probed cell (the query residual depends on it),
    *  - `qrm`(qid, cell, sub, i, x): the query's micro residual
    *    elements against each probed cell's coarse centroid,
    *  - `{p}enc` / `{p}b<iters>` from a residual-trained [[trainCtes]].
    * Distance = Σ over (sub, i) of (query residual − addressed residual
    * centroid)², ranked asc, ties to the lowest neighbor id. */
  def residualAdcTopKSql(iters: Int, topK: Int, prefix: String = ""): String = {
    val p = prefix
    s"""adcd AS (SELECT c.qid AS query_id, c.nid AS neighbor_id,
       |    sum((q.x - b.c) * (q.x - b.c)) AS d
       |  FROM cand c
       |  JOIN qrm q ON q.qid = c.qid AND q.cell = c.cell
       |  JOIN ${p}enc e ON e.vid = c.nid AND e.sub = q.sub
       |  JOIN ${p}b$iters b ON b.sub = q.sub AND b.cell = e.code AND b.i = q.i
       |  GROUP BY c.qid, c.nid)
       |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist, rank
       |FROM (
       |  SELECT query_id, neighbor_id, d AS adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d, neighbor_id) AS rank
       |  FROM adcd) WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** ADC ranking of queries (`qPred` over vm's vid) against the encoded
    * corpus: exact integer Σ over subspaces of (query micro − addressed
    * centroid)², ranked asc with ties to the lowest neighbor id.
    * `candJoin` optionally restricts (query, neighbor) pairs to an extra
    * join clause (e.g. an IVF probe-cell candidate relation). */
  def adcTopKSql(iters: Int, qPred: String, topK: Int,
      prefix: String = "", candJoin: String = ""): String = {
    val p = prefix
    s"""adcd AS (SELECT qm.vid AS query_id, e.vid AS neighbor_id,
       |    sum((qm.x - b.c) * (qm.x - b.c)) AS d
       |  FROM ${p}vm qm
       |  JOIN ${p}enc e ON e.sub = qm.sub AND e.vid <> qm.vid
       |  JOIN ${p}b$iters b ON b.sub = e.sub AND b.cell = e.code AND b.i = qm.i
       |  $candJoin
       |  WHERE $qPred
       |  GROUP BY qm.vid, e.vid)
       |SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist, rank
       |FROM (
       |  SELECT query_id, neighbor_id, d AS adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d, neighbor_id) AS rank
       |  FROM adcd) WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }
}
