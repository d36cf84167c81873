package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("loads the fixture config with both sensors") {
    val c = GraftConfig.load("src/test/resources/fixtures/config.yml")
    assert(c.nodeName == "testnode")
    assert(c.sensors.map(_.name) == Seq("ssh", "http"))
    val ssh = c.sensors.head
    assert(ssh.parser.tokens == Map("datetime" -> 1, "message" -> 2, "address" -> 3))
    assert(ssh.rules.map(_.name) == Seq("auth-failure", "user-enumeration"))
    assert(c.sensors(1).rules.map(_.name) ==
      Seq("CVE-2017-9841", "XDebug", "php_files_scan", "not_a_browser"))
  }

  test("reports.repository parses local/remote/http (config.example.yml:11-17)") {
    val c = GraftConfig.fromYaml(
      """name: n
        |reports:
        |  enabled: true
        |  period: 1800
        |  repository:
        |    http: 'https://example.org/reports/blob/master/'
        |    remote: 'git@example.org:reports.git'
        |    local: '/var/log/graft/reports'
        |""".stripMargin)
    val r = c.reports.get
    assert(r.enabled && r.periodSecs == 1800)
    assert(r.localDir == "/var/log/graft/reports")
    assert(r.remote == "git@example.org:reports.git")
    assert(r.httpBase == "https://example.org/reports/blob/master/")
    assert(r.gitConfigured)
    assert(!ReportsConf(enabled = true, 3600, "").gitConfigured)
  }

  test("(?i) is force-prefixed once") {
    val p = ParserConf("^abc$", "2006", Map("address" -> 1, "datetime" -> 2))
    assert(p.normalizedExpression == "(?i)^abc$")
    val p2 = ParserConf("(?i)^abc$", "2006", Map("address" -> 1, "datetime" -> 2))
    assert(p2.normalizedExpression == "(?i)^abc$")
  }

  test("missing mandatory token fails at load (parser.go:32-36 parity)") {
    val yaml =
      """name: x
        |sensors:
        |- name: bad
        |  filename: /dev/null
        |  parser:
        |    expression: '^(.+)$'
        |    datetime_format: '2006'
        |    tokens:
        |      datetime: 1
        |""".stripMargin
    val e = intercept[IllegalArgumentException](GraftConfig.fromYaml(yaml))
    assert(e.getMessage.contains("address"))
  }

  test("invalid regex fails at load (config.go:35-39 parity)") {
    val yaml =
      """name: x
        |sensors:
        |- name: bad
        |  filename: /dev/null
        |  parser:
        |    expression: '^((+invalid$'
        |    datetime_format: '2006'
        |    tokens:
        |      datetime: 1
        |      address: 2
        |""".stripMargin
    intercept[java.util.regex.PatternSyntaxException](GraftConfig.fromYaml(yaml))
  }

  test("twitter section parses OAuth1 key pairs (twitter.go:20-24 parity)") {
    val yaml =
      """name: x
        |twitter:
        |  enabled: true
        |  consumer_key: ck
        |  consumer_secret: cs
        |  access_key: ak
        |  access_secret: as
        |sensors: []
        |""".stripMargin
    val conf = GraftConfig.fromYaml(yaml)
    assert(conf.twitter.exists(_.configured))
    assert(conf.twitter.get.consumerKey == "ck" && conf.twitter.get.accessSecret == "as")
    // enabled without credentials is NOT configured (no silent half-setup)
    val partial = GraftConfig.fromYaml(
      "name: x\ntwitter:\n  enabled: true\n  consumer_key: ck\nsensors: []\n")
    assert(partial.twitter.exists(t => t.enabled && !t.configured))
    // absent section => None
    assert(GraftConfig.fromYaml("name: x\nsensors: []\n").twitter.isEmpty)
  }
}
