package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.config.GraftConfig
import graft.enrich.GeoIp

/** SURVEY §5.2, streaming form: the SAME fixture logs and golden artifact
  * as the batch E2ESpec, but driven through the real streaming machinery —
  * per-sensor file-stream ingest (parse → classify → geo-enrich →
  * partitioned parquet sink) followed by the report cadence
  * (foreachBatch → CSV + totals + tweet) under an injected clock, so the
  * CSV is byte-comparable and the published messages are exact. Proves
  * the streaming path computes the identical report the batch path does.
  */
class StreamingE2ESpec extends SparkSpec {

  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("fixture logs -> streaming ingest -> report cadence -> golden CSV + tweet") {
    val conf = GraftConfig.load(fixture("config.yml"))
    val geo = GeoIp.fromCsv(spark, fixture("geo.csv"))
    val eventsPath = tmp("e2e-events") + "/events"
    val ckRoot = tmp("e2e-ck")

    // ingest every enabled sensor's fixture log through the streaming
    // pipeline (AvailableNow: drain the file, then stop — same data a
    // long-running ProcessingTime trigger would commit)
    conf.enabledSensors.foreach { sensor =>
      Ingest.sensorQuery(spark, sensor, "testnode", eventsPath, ckRoot,
        Some(geo), Trigger.AvailableNow()).awaitTermination(120000)
    }

    val outDir = tmp("e2e-reports")
    val fixedNow = java.time.ZonedDateTime.of(2026, 8, 3, 12, 0, 0, 0,
      java.time.ZoneOffset.UTC)
    val pub = new LogPublisher
    val q = ReportJob.stream(spark, eventsPath, outDir, tmp("e2e-ckr"), pub,
      periodSecs = 1, now = () => fixedNow)
    try q.processAllAvailable() finally q.stop()

    // golden CSV under the fixed clock — identical artifact name and
    // content to the batch E2E golden (7 events over 5 addresses)
    val written = new java.io.File(
      s"$outDir/report_2026-08-03T12:00:00+0000.csv")
    assert(written.isDirectory, s"report dir missing: $written")
    val csv = written.listFiles().filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(csv).getLines().toList
    assert(lines == List(
      "address,country_code,country_name,total_events,counters",
      "198.51.100.23,NL,Netherlands,2,http/XDebug:1|ssh/user-enumeration:1",
      "203.0.113.7,US,United States,2,http/CVE-2017-9841:1|ssh/auth-failure:1",
      "192.0.2.10,CN,China,1,http/not_a_browser:1",
      "192.0.2.99,CN,China,1,http/php_files_scan:1",
      "203.0.113.9,US,United States,1,ssh/auth-failure:1"))

    // published channel parity: commit-message totals + tweet text
    assert(pub.published.exists(
      _.contains("reporting 5 addresses, 7 total events")),
      s"totals missing: ${pub.published}")
    val tweet = pub.published.find(_.startsWith("tweet: "))
    assert(tweet.isDefined, s"no tweet published: ${pub.published}")
    assert(tweet.get.startsWith("tweet: 7 new events from "))
    assert(tweet.get.contains("(2)") &&
      tweet.get.contains("#takuan #threatreport"))
  }
}
