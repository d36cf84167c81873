package graft.queries

/** DuckDB mirror of [[graft.ops.Similarity.trainIvfCentroidsMicro]]:
  * unrolled fixed-iteration spherical k-means in integer micro-units.
  *
  * The Spark side quantizes every trained centroid element to
  * floor(x·10⁶) longs and updates them with exact integer means (offset
  * division), so the whole training trajectory — seeds, per-iteration
  * assignments, centroid updates — is bit-reproducible in SQL:
  *  - `seeds`: the k lowest-md5(id) vectors, cells numbered in hash
  *    order (exactly the Spark seeding);
  *  - per iteration: rounded-cosine argmax assignment (ties to the
  *    lowest cell — the [[graft.functions.IvfIndex]] contract), then
  *    per-(cell, dim) integer mean with the +10⁹ offset making DuckDB's
  *    flooring `//` equal Spark's truncating driver-side division;
  *  - empty cells carry the previous centroid forward (the coalesce).
  *
  * This is the same unrolled-iteration oracle discipline as
  * `graph_pagerank`'s three-iteration CTE chain.
  */
private[queries] object KmeansSql {

  /** Rounded cosine between a DOUBLE[] vector expr and a BIGINT[]
    * micro-unit centroid expr (cosine is scale-invariant, so micro
    * coordinates compare identically to the means they encode). */
  def cosMicro(v: String, cm: String): String =
    s"round(list_dot_product($v, CAST($cm AS DOUBLE[])) / " +
      s"(sqrt(list_dot_product($v, $v)) * " +
      s"sqrt(list_dot_product(CAST($cm AS DOUBLE[]), CAST($cm AS DOUBLE[])))), 6)"

  /** CTE chain `tr`, `seeds`, `c0`..`c<iters>`; requires a CTE
    * `src`(vid BIGINT, v DOUBLE[]) in scope. The trained centroid
    * relation is `c<iters>`(cell BIGINT, cm BIGINT[]). */
  def trainCtes(src: String, trainPred: String, k: Int, iters: Int,
      dim: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (SELECT vid, cell FROM (
         |    SELECT t.vid, c.cell,
         |      row_number() OVER (PARTITION BY t.vid
         |        ORDER BY ${cosMicro("t.v", "c.cm")} DESC, c.cell) AS rn
         |    FROM tr t CROSS JOIN c${i - 1} c) WHERE rn = 1),
         |u$i AS (SELECT a.cell, r.range AS idx, count(*) AS n,
         |    CAST(sum(CAST(floor(t.v[CAST(r.range + 1 AS INTEGER)] * 1000000)
         |      AS BIGINT) + 1000000000) AS BIGINT) AS sm
         |  FROM a$i a JOIN tr t USING (vid) CROSS JOIN range($dim) r
         |  GROUP BY a.cell, r.range),
         |c$i AS (SELECT p.cell, coalesce(u.cm, p.cm) AS cm
         |  FROM c${i - 1} p LEFT JOIN (
         |    SELECT cell,
         |      list(CAST(sm // n - 1000000000 AS BIGINT) ORDER BY idx) AS cm
         |    FROM u$i GROUP BY cell) u USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""tr AS (SELECT vid, v FROM $src WHERE $trainPred),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) - 1 AS cell, v
       |  FROM tr
       |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) <= $k),
       |c0 AS (SELECT cell,
       |         list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS cm
       |       FROM seeds)${if (iters > 0) ",\n" + iterCtes else ""}""".stripMargin
  }

  /** Serve-time nearest-cell assignment of every `src` row against the
    * centroid relation `cents`(cell, cm). */
  def assignSql(src: String, cents: String): String =
    s"""SELECT vid, cell FROM (
       |    SELECT s.vid, c.cell,
       |      row_number() OVER (PARTITION BY s.vid
       |        ORDER BY ${cosMicro("s.v", "c.cm")} DESC, c.cell) AS rn
       |    FROM $src s CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
}
