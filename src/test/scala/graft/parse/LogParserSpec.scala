package graft.parse

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.config.GraftConfig

class LogParserSpec extends SparkSpec {

  lazy val conf = GraftConfig.load(fixture("config.yml"))
  lazy val ssh = conf.sensors.find(_.name == "ssh").get
  lazy val http = conf.sensors.find(_.name == "http").get
  val detectedAt = Some(java.sql.Timestamp.valueOf("2026-08-03 12:00:00"))

  def run(sensor: graft.config.SensorConf) = {
    val lines = spark.read.text(sensor.filename)
    LogParser.pipeline(lines, sensor, "testnode", detectedAt, currYear = 2026)
      .orderBy("payload").collect()
  }

  test("ssh fixture: classification + drops (FIXTURES.md A.1)") {
    val rows = run(ssh)
    // 5 lines: 2 auth-failure-ish, 1 user-enumeration, 1 no-rule, 1 garbage
    assert(rows.length == 3)
    val byAddr = rows.map(r => r.getAs[String]("address") -> r.getAs[String]("rule")).toMap
    assert(byAddr == Map(
      "203.0.113.7" -> "auth-failure",
      "203.0.113.9" -> "auth-failure",
      "198.51.100.23" -> "user-enumeration"))
  }

  test("ssh fixture: year repair + _2 space-padded datetime parse") {
    val rows = run(ssh)
    val created = rows.map(_.getAs[java.sql.Timestamp]("created_at")).toSet
    // "Aug  3 11:22:33" + repaired year 2026, double space collapsed
    assert(created.contains(java.sql.Timestamp.valueOf("2026-08-03 11:22:33")))
    assert(!created.contains(null))
  }

  test("http fixture: first-match-wins order (CVE before php_files_scan)") {
    val rows = run(http)
    val byAddr = rows.map(r => r.getAs[String]("address") -> r.getAs[String]("rule")).toMap
    assert(byAddr == Map(
      "203.0.113.7" -> "CVE-2017-9841",   // not php_files_scan
      "198.51.100.23" -> "XDebug",        // not php_files_scan / not_a_browser
      "192.0.2.10" -> "not_a_browser",
      "192.0.2.99" -> "php_files_scan"))
  }

  test("http fixture: zoned datetime parses to UTC instant") {
    val rows = run(http)
    val cve = rows.find(_.getAs[String]("rule") == "CVE-2017-9841").get
    assert(cve.getAs[java.sql.Timestamp]("created_at") ==
      java.sql.Timestamp.valueOf("2026-08-03 11:22:33"))
  }

  test("pipeline emits the reference event schema (models/event.go:7-20)") {
    val df = LogParser.pipeline(spark.read.text(ssh.filename), ssh, "n", detectedAt)
    assert(df.columns.toSeq == Seq("created_at", "detected_at", "node_name",
      "address", "country_code", "country_name", "sensor", "rule", "payload",
      "reported_at"))
  }

  test("ingest columns: node_name/sensor/payload/detected_at (P9)") {
    val r = run(ssh).head
    assert(r.getAs[String]("node_name") == "testnode")
    assert(r.getAs[String]("sensor") == "ssh")
    assert(r.getAs[java.sql.Timestamp]("detected_at") == detectedAt.get)
    assert(r.getAs[String]("payload").contains("sshd["))
    assert(r.getAs[java.sql.Timestamp]("reported_at") == null)
  }

  test("malformed datetime side output is empty for clean fixtures (ST7)") {
    val m = LogParser.malformedDatetimes(spark.read.text(ssh.filename), ssh, currYear = 2026)
    assert(m.count() == 0)
  }

  test("case-insensitive parser regex ((?i) parity, P2)") {
    import spark.implicits._
    val lines = Seq("Aug  3 11:22:33 h SSHD[1]: Authentication failed for x 1.2.3.4 port 9").toDF("value")
    val out = LogParser.pipeline(lines, ssh, "n", detectedAt, currYear = 2026).collect()
    assert(out.length == 1) // parser matches case-insensitively
    assert(out.head.getAs[String]("rule") == "auth-failure") // rules stay case-sensitive
  }

  test("rules are case-sensitive (core/rule.go parity)") {
    import spark.implicits._
    val lines = Seq("Aug  3 11:22:33 h sshd[1]: AUTHENTICATION FAILED for x 1.2.3.4 port 9").toDF("value")
    val out = LogParser.pipeline(lines, ssh, "n", detectedAt, currYear = 2026).collect()
    assert(out.isEmpty) // parses, but no case-sensitive rule matches
  }
}
