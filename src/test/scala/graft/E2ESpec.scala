package graft

import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.enrich.GeoIp
import graft.parse.LogParser
import graft.report.Reporter

/** Golden end-to-end (SURVEY §5.2): both reference sensors over the fixture
  * logs through parse → classify → geo-enrich → report → CSV, compared
  * byte-for-byte against the expected artifact (clock injected, so the run
  * is fully deterministic).
  */
class E2ESpec extends SparkSpec {

  test("fixture logs -> report CSV golden") {
    val conf = GraftConfig.load(fixture("config.yml"))
    val geo = GeoIp.fromCsv(spark, fixture("geo.csv"))
    val detectedAt = Some(java.sql.Timestamp.valueOf("2026-08-03 12:00:00"))

    val events = conf.enabledSensors.map { sensor =>
      GeoIp.enrich(
        LogParser.pipeline(spark.read.text(sensor.filename), sensor,
          conf.nodeName, detectedAt, currYear = 2026),
        geo).select("address", "country_code", "country_name", "sensor", "rule")
    }.reduce(_ unionByName _)

    val report = Reporter.report(events)
    val outDir = java.nio.file.Files.createTempDirectory("graft-golden").toString
    val now = java.time.ZonedDateTime.of(2026, 8, 3, 12, 0, 0, 0, java.time.ZoneOffset.UTC)
    val written = Reporter.writeCsv(report, outDir, now)
    assert(written.endsWith("report_2026-08-03T12:00:00+0000.csv"))

    val csv = new java.io.File(written).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(csv).getLines().toList
    // golden: 7 events over 5 addresses; 203.0.113.7 hits both sensors
    assert(lines == List(
      "address,country_code,country_name,total_events,counters",
      "198.51.100.23,NL,Netherlands,2,http/XDebug:1|ssh/user-enumeration:1",
      "203.0.113.7,US,United States,2,http/CVE-2017-9841:1|ssh/auth-failure:1",
      "192.0.2.10,CN,China,1,http/not_a_browser:1",
      "192.0.2.99,CN,China,1,http/php_files_scan:1",
      "203.0.113.9,US,United States,1,ssh/auth-failure:1"))

    // totals + tweet over the same batch
    val (total, addresses) = Reporter.totals(events)
    assert((total, addresses) == (7L, 5L))
    val tweet = Reporter.tweetText(Reporter.countrySummary(events), total, "http://r")
    assert(tweet.startsWith("7 new events from "))
    assert(tweet.contains("(2)") && tweet.contains("#takuan #threatreport"))
  }
}
