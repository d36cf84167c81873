package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing, canonicalization, and host-level rollups — the web-corpus
  * curation primitives (C4 / RefinedWeb style): crawl snapshots carry the
  * same page under many URL spellings (case-varied hosts, fragments,
  * tracking params, trailing slashes), and URL-level dedup plus per-host
  * quality profiling are the first, cheapest passes before any content
  * dedup runs.
  *
  * Everything is regexp/array expressions over the URL string — pure
  * per-row projections (no UDF, fully codegen'd, trivially mirrored in
  * the DuckDB oracle). No shuffle until the caller aggregates.
  *
  * Spark's own `parse_url` is not used: its query-param semantics and
  * null behavior differ from DuckDB's available primitives, and the
  * canonicalization below needs the parts under one deterministic
  * grammar anyway.
  */
object UrlOps {

  /** RFC-3986-lite part extraction, added as columns:
    * scheme (lowercased), host (raw), path, query (no '?'), fragment
    * (no '#'), plus registered_domain (last two host labels, lowercased,
    * port stripped), path_depth (count of non-empty segments) and
    * n_params (count of non-empty '&'-separated query params). */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    df
      .withColumn("scheme",
        lower(regexp_extract(col(urlCol), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("host",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("path",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("query", regexp_extract(col(urlCol), "\\?([^#]*)", 1))
      .withColumn("fragment", regexp_extract(col(urlCol), "#(.*)$", 1))
      .withColumn("registered_domain", expr(
        // last two host labels; a single-label host (e.g. localhost) is
        // its own registered domain — guarded so ANSI element_at(-2)
        // cannot fault on it
        """CASE WHEN size(split(regexp_replace(lower(host), ':[0-9]+$', ''),
          |               '\\.')) < 2
          | THEN regexp_replace(lower(host), ':[0-9]+$', '')
          | ELSE element_at(split(regexp_replace(lower(host), ':[0-9]+$', ''),
          |        '\\.'), -2) || '.' ||
          |      element_at(split(regexp_replace(lower(host), ':[0-9]+$', ''),
          |        '\\.'), -1)
          |END""".stripMargin))
      .withColumn("path_depth",
        size(filter(split(col("path"), "/"), s => s =!= "")))
      .withColumn("n_params",
        size(filter(split(col("query"), "&"), s => s =!= "")))
  }

  /** Canonical URL: lowercase scheme+host, strip a leading `www.` label
    * and default ports, drop the fragment, drop `utm_*` tracking params,
    * sort the surviving params, strip trailing slashes from the path.
    * Two spellings canonicalize equal iff they address the same resource
    * under these (standard crawl-dedup) rules. */
  def canonicalUrl(urlCol: Column): Column = {
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        ":(443|80)$", ""),
      "^www\\.", "")
    val scheme = lower(regexp_extract(urlCol, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val path = regexp_replace(
      regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val q = array_join(
      array_sort(filter(split(regexp_extract(urlCol, "\\?([^#]*)", 1), "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** URL-level dedup: one keeper per canonical URL (minimum id — the
    * usual first-crawled representative). Output: (id, canonical_url,
    * keeper_id, is_canonical) per input row.
    *
    * Scale shape: one combine-agg keyed by canonical string (min id),
    * broadcast-friendly join back. The canonical relation is distinct
    * URLs — always far smaller than the row set under real crawl
    * duplication. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.select(col(idCol),
      canonicalUrl(col(urlCol)).as("canonical_url"))
    val keeper = canon.groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id"))
    canon.join(keeper, Seq("canonical_url"))
      .select(col(idCol), col("canonical_url"), col("keeper_id"),
        (col(idCol) === col("keeper_id")).as("is_canonical"))
  }

  /** Per-registered-domain crawl profile: row count, distinct canonical
    * URLs, the URL-duplication ratio in micro units, and total content
    * chars — the host-level triage table ("which domains are mostly
    * duplicate spellings / boilerplate mirrors") that decides per-host
    * crawl budgets. One aggregation, |domains| rows out. */
  def hostRollup(df: DataFrame, urlCol: String,
      charsCol: String, unit: Long = 1000000L): DataFrame = {
    withUrlParts(df, urlCol)
      .withColumn("__canon", canonicalUrl(col(urlCol)))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__canon")).as("n_canonical"),
        sum(col(charsCol).cast("long")).as("total_chars"))
      .withColumn("dup_ratio_micro",
        expr(s"($unit * (n_docs - n_canonical)) div n_docs"))
  }
}
