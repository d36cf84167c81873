package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.{ParserConf, RuleConf, SensorConf}
import graft.timefmt.GoTimeFormat

/** The parse/classify hot path (reference: core/sensor.go:80-110,
  * core/parser.go:64-80, core/rule.go:23-31), re-expressed as narrow
  * DataFrame transformations: everything here fuses into a single
  * whole-stage-codegen pipeline with zero shuffles — one pass over the raw
  * lines regardless of sensor/rule count. Regex patterns are literals, so
  * Catalyst compiles each `Pattern` once per task.
  */
object LogParser {

  /** The raw-line input column (what `spark.read.text` produces). */
  val LineCol = "value"

  /** P1/P2: per-sensor regex tokenizer. A line that doesn't match the parser
    * expression is dropped (reference: core/parser.go:65 — FindStringSubmatch
    * returns nil ⇒ no event). Produces one StringType column per configured
    * token; schema is fixed at plan-build time from config.
    *
    * One regex pass per line via the codegen'd [[graft.functions.RegexGroups]]
    * expression — stock `rlike` + N×`regexp_extract` would re-match the
    * (backtracking-heavy) parser pattern N+1 times per row.
    */
  def tokenize(lines: DataFrame, parser: ParserConf,
      currYear: Int = java.time.Year.now.getValue): DataFrame = {
    val groups = graft.functions.RegexFunctions
      .regex_groups(col(LineCol), parser.normalizedExpression)
    // explode(array(...)) is a deliberate optimizer fence: a Generate's
    // output can't be substituted into pushed-down predicates or collapsed
    // into downstream projections, so the (expensive) regex matches exactly
    // once per row — a plain column alias gets re-expanded once per token
    // plus once in the null filter (4 evals/row for the ssh parser).
    val withTokens = parser.tokens.toSeq.sortBy(_._2).foldLeft(
      lines.select(col("*"), explode(array(groups)).as("__groups"))
        .filter(col("__groups").isNotNull)) {
      case (df, (name, idx)) =>
        df.withColumn(name, coalesce(get(col("__groups"), lit(idx - 1)), lit("")))
    }.drop("__groups")
    // P7 year repair (core/parser.go:55-62,72-74): applied to the datetime
    // token only, when no year in [currYear-5, currYear] appears.
    if (parser.tokens.contains("datetime")) {
      val hasYear = col("datetime").rlike(GoTimeFormat.yearAlternation(currYear))
      withTokens.withColumn("datetime",
        when(hasYear, col("datetime"))
          .otherwise(concat(lit(s"$currYear "), col("datetime"))))
    } else withTokens
  }

  /** P4/P5: ordered first-match-wins rule classification
    * (core/sensor.go:88-106 — `break` after first match ⇒ ≤1 event/line).
    * Compiles to one lazily-evaluated CASE WHEN chain: codegen emits an
    * early-exit branch per rule, preserving the reference's short-circuit.
    * Rules are case-sensitive (core/rule.go:19). Rows matching no rule get
    * NULL and are filtered by [[pipeline]].
    */
  def classifyColumn(rules: Seq[RuleConf]): Column =
    rules.foldLeft(lit(null).cast("string")) { (acc, r) =>
      coalesce(acc, when(col(r.token).rlike(r.expression), lit(r.name)))
    }

  /** "Matches any rule" — one combined alternation regex per target token
    * instead of the full per-rule CASE chain. Used as the pipeline's drop
    * filter so the (expensive, ordered) [[classifyColumn]] chain runs only
    * on surviving rows: a filter on `classifyColumn(...).isNotNull` would
    * make Catalyst evaluate every rule regex twice per row (once in the
    * pushed-down predicate, once in the projection — no cross-operator
    * subexpression elimination in codegen). OR across tokens is
    * order-insensitive, so the per-token grouping is safe. */
  def anyRuleMatch(rules: Seq[RuleConf]): Column =
    rules.groupBy(_.token).toSeq.sortBy(_._1).map { case (token, rs) =>
      col(token).rlike(rs.map(r => s"(?:${r.expression})").mkString("|"))
    }.reduce(_ || _)

  /** P6: parse the (year-repaired) datetime token with the sensor's Go
    * layout. `try_to_timestamp` nulls on failure — the reference emits the
    * event anyway with zero time and routes the error to a side channel
    * (core/sensor.go:98-101); [[malformedDatetimes]] is that side output. */
  def datetimeColumn(parser: ParserConf): Column = {
    val t = GoTimeFormat.translate(
      if (GoTimeFormat.hasYearField(parser.datetimeFormat)) parser.datetimeFormat
      else "2006 " + parser.datetimeFormat)
    val src =
      if (t.normalizeSpaces) regexp_replace(col("datetime"), " +", " ")
      else col("datetime")
    try_to_timestamp(src, lit(t.pattern))
  }

  /** Full per-sensor pipeline (reference §3.1 stages 1-3 + P9 column
    * injection): lines -> events with the reference's table schema
    * (models/event.go:7-20). `detectedAt` is injectable for reproducible
    * golden tests; None means wall-clock `current_timestamp()`.
    */
  def pipeline(lines: DataFrame, sensor: SensorConf, nodeName: String,
      detectedAt: Option[java.sql.Timestamp] = None,
      currYear: Int = java.time.Year.now.getValue): DataFrame =
    tokenize(lines, sensor.parser, currYear)
      .filter(anyRuleMatch(sensor.rules))
      .withColumn("rule", classifyColumn(sensor.rules))
      .withColumn("created_at", datetimeColumn(sensor.parser))
      .withColumn("detected_at",
        detectedAt.map(lit(_)).getOrElse(current_timestamp()))
      .withColumn("node_name", lit(nodeName))
      .withColumn("sensor", lit(sensor.name))
      .withColumn("payload", col(LineCol))
      .withColumn("country_code", lit(null).cast("string"))
      .withColumn("country_name", lit(null).cast("string"))
      .withColumn("reported_at", lit(null).cast("timestamp"))
      .select("created_at", "detected_at", "node_name", "address",
        "country_code", "country_name", "sensor", "rule", "payload",
        "reported_at")

  /** ST7 side output: classified rows whose datetime failed to parse.
    * Routed to a quarantine sink instead of failing the stream. */
  def malformedDatetimes(lines: DataFrame, sensor: SensorConf,
      currYear: Int = java.time.Year.now.getValue): DataFrame =
    tokenize(lines, sensor.parser, currYear)
      .filter(anyRuleMatch(sensor.rules))
      .filter(datetimeColumn(sensor.parser).isNull)
      .select(col(LineCol).as("payload"), col("datetime"))
}
