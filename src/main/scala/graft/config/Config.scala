package graft.config

import java.util.regex.{Pattern, PatternSyntaxException}
import scala.jdk.CollectionConverters._

/** Typed pipeline configuration, mirroring the reference's YAML surface
  * (reference: core/config.go:10-17, config.example.yml:1-96). Sensors and
  * rules are *data* driving Spark plan construction, not code.
  *
  * Loading is fail-fast (reference: core/config.go:35-39): every regex is
  * compiled eagerly and mandatory parser tokens are enforced
  * (core/parser.go:14-17,32-36) so a bad config never reaches a running
  * stream.
  */
final case class ParserConf(
    expression: String,
    datetimeFormat: String,
    tokens: Map[String, Int]) {

  /** Case-insensitivity is force-prefixed exactly like the reference
    * (core/parser.go:44-47); Java regex supports inline `(?i)` too. */
  val normalizedExpression: String =
    if (expression.startsWith("(?i)")) expression else "(?i)" + expression

  def compile(): Unit = {
    ParserConf.mandatoryTokens.foreach { t =>
      require(tokens.contains(t), s"mandatory token $t not found in parser")
    }
    Pattern.compile(normalizedExpression)
  }
}

object ParserConf {
  /** core/parser.go:14-17 */
  val mandatoryTokens: Seq[String] = Seq("address", "datetime")
}

final case class RuleConf(
    name: String,
    token: String,
    expression: String,
    description: String = "") {
  /** Rules are case-sensitive (only the parser regex gets `(?i)`,
    * core/rule.go:19 vs core/parser.go:44-47). */
  def compile(): Unit = Pattern.compile(expression)
}

final case class SensorConf(
    name: String,
    filename: String,
    enabled: Boolean,
    periodSecs: Int,
    parser: ParserConf,
    rules: Seq[RuleConf]) {
  def compile(): Unit = {
    parser.compile()
    rules.foreach(_.compile())
  }
}

/** `reports:` section (reference: config.example.yml:11-17 + Reporter
  * struct, core/reporter.go:23-32): repository.local is the worktree,
  * .remote the push target, .http the public URL base for report links. */
final case class ReportsConf(enabled: Boolean, periodSecs: Int, localDir: String,
    remote: String = "", httpBase: String = "") {
  /** Git publication is configured iff a push target is present. */
  def gitConfigured: Boolean = remote.nonEmpty && localDir.nonEmpty
}

/** `twitter:` section (reference: core/twitter.go:20-24 — enabled flag
  * plus the OAuth1 consumer/access key pairs). */
final case class TwitterConf(enabled: Boolean, consumerKey: String = "",
    consumerSecret: String = "", accessKey: String = "", accessSecret: String = "") {
  def configured: Boolean =
    enabled && consumerKey.nonEmpty && consumerSecret.nonEmpty &&
      accessKey.nonEmpty && accessSecret.nonEmpty
}

final case class GraftConfig(
    nodeName: String,
    sensors: Seq[SensorConf],
    reports: Option[ReportsConf] = None,
    twitter: Option[TwitterConf] = None) {
  def enabledSensors: Seq[SensorConf] = sensors.filter(_.enabled)
}

object GraftConfig {

  /** Load + validate a YAML config (reference: core/config.go:19-54).
    * Throws IllegalArgumentException / PatternSyntaxException on a bad
    * config — by design, before any stream starts. */
  def load(path: String): GraftConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromYaml(yaml: String): GraftConfig = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
    val conf = parse(root)
    conf.sensors.foreach(_.compile())
    conf
  }

  private def parse(root: java.util.Map[String, Object]): GraftConfig = {
    def str(m: java.util.Map[String, Object], k: String, dflt: String = null): String =
      Option(m.get(k)).map(_.toString).getOrElse {
        require(dflt != null, s"missing config key: $k"); dflt
      }
    def int(m: java.util.Map[String, Object], k: String, dflt: Int): Int =
      Option(m.get(k)).map(_.toString.toInt).getOrElse(dflt)
    def bool(m: java.util.Map[String, Object], k: String, dflt: Boolean): Boolean =
      Option(m.get(k)).map(_.toString.toBoolean).getOrElse(dflt)

    val sensors = Option(root.get("sensors")).toSeq
      .flatMap(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala)
      .map { s =>
        val p = s.get("parser").asInstanceOf[java.util.Map[String, Object]]
        require(p != null, s"sensor ${s.get("name")} missing parser")
        val tokens = Option(p.get("tokens"))
          .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
            .map { case (k, v) => k -> v.toString.toInt }.toMap)
          .getOrElse(Map.empty[String, Int])
        val rules = Option(s.get("rules")).toSeq
          .flatMap(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala)
          .map { r =>
            RuleConf(str(r, "name"), str(r, "token"), str(r, "expression"),
              str(r, "description", ""))
          }
        SensorConf(
          name = str(s, "name"),
          filename = str(s, "filename"),
          enabled = bool(s, "enabled", true),
          periodSecs = int(s, "period", 10),
          parser = ParserConf(str(p, "expression"), str(p, "datetime_format"), tokens),
          rules = rules.toSeq)
      }

    val reports = Option(root.get("reports"))
      .map(_.asInstanceOf[java.util.Map[String, Object]])
      .map { r =>
        val repo = Option(r.get("repository"))
          .map(_.asInstanceOf[java.util.Map[String, Object]])
        ReportsConf(bool(r, "enabled", false), int(r, "period", 3600),
          repo.map(str(_, "local", "")).getOrElse(""),
          repo.map(str(_, "remote", "")).getOrElse(""),
          repo.map(str(_, "http", "")).getOrElse(""))
      }

    val twitter = Option(root.get("twitter"))
      .map(_.asInstanceOf[java.util.Map[String, Object]])
      .map { t =>
        TwitterConf(bool(t, "enabled", false),
          str(t, "consumer_key", ""), str(t, "consumer_secret", ""),
          str(t, "access_key", ""), str(t, "access_secret", ""))
      }

    GraftConfig(str(root, "name", "local"), sensors.toSeq, reports, twitter)
  }
}
