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

  /** The common multi-label public suffixes (the high-traffic subset of
    * the Mozilla Public Suffix List): hosts under these need the LAST
    * THREE labels to form a registered domain — a naive last-two rule
    * would merge every site under e.g. `co.uk` into one "domain". A
    * bounded inline list (not the full 9k-entry PSL) keeps the
    * expression pure/codegen-able; anything rarer falls back to the
    * two-label rule, which [[hostRollup]]'s scaladoc flags. */
  private val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
    "com.tr", "com.sa", "com.eg",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "co.za", "org.za", "co.kr", "or.kr",
    "com.sg", "com.my", "com.hk", "com.tw", "com.ph", "com.vn",
    "co.th", "co.id", "or.id", "com.pk", "com.bd")

  /** RFC-3986-lite part extraction, added as columns:
    * scheme (lowercased), host (raw), path, query (no '?'), fragment
    * (no '#'), plus registered_domain (lowercased, port stripped: last
    * two host labels, or last THREE when the two-label tail is a known
    * multi-label public suffix — [[MultiLabelSuffixes]]), path_depth
    * (count of non-empty segments) and n_params (count of non-empty
    * '&'-separated query params). */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    // registered_domain pieces: CASE branches evaluate lazily, so the
    // negative element_at indexes cannot fault under ANSI — each is
    // guarded by its branch's label-count condition.
    val base = regexp_replace(lower(col("host")), ":[0-9]+$", "")
    val parts = split(base, "\\.")
    val last2 = concat(element_at(parts, -2), lit("."), element_at(parts, -1))
    val last3 = concat(element_at(parts, -3), lit("."), last2)
    df
      .withColumn("scheme",
        lower(regexp_extract(col(urlCol), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("host",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("path",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("query", regexp_extract(col(urlCol), "\\?([^#]*)", 1))
      .withColumn("fragment", regexp_extract(col(urlCol), "#(.*)$", 1))
      .withColumn("registered_domain",
        // a single-label host (e.g. localhost) is its own registered
        // domain
        when(size(parts) < 2, base)
          .when(size(parts) >= 3 &&
            last2.isin(MultiLabelSuffixes: _*), last3)
          .otherwise(last2))
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
    val scheme = lower(regexp_extract(urlCol, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost =
      lower(regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // Strip only the port that is the DEFAULT for the URL's own scheme:
    // http://host:443/x is a real non-default port (a different
    // resource than http://host/x) and must survive — an unconditional
    // ":(443|80)" strip collided those.
    val portStripped = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val host = regexp_replace(portStripped, "^www\\.", "")
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
    * crawl budgets. One aggregation, |domains| rows out.
    *
    * Domain granularity caveat: registered_domain covers the common
    * multi-label public suffixes via [[MultiLabelSuffixes]]; hosts under
    * a RARER multi-label suffix fall back to the last-two-labels rule
    * and may merge unrelated sites into one row. For strict PSL
    * semantics, join a full public-suffix table (it broadcasts — ~9k
    * rows) and group by its registered domain instead. */
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
