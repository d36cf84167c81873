package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S11 end-to-end: a local bare origin stands in for the reference's
  * remote (core/reporter.go) — clone, publish a report, verify the commit
  * message, the pushed artifact, and incremental pull-then-publish. */
class GitPublisherSpec extends SparkSpec {

  private def sh(cwd: String, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(Paths.get(cwd).toFile)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")}:\n$out")
    out
  }

  test("clone, publish, push: commit message and artifact reach origin") {
    val tmp = Files.createTempDirectory("gitpub").toString
    val bare = s"$tmp/origin.git"
    Files.createDirectories(Paths.get(bare))
    sh(bare, "git", "init", "--bare", "--initial-branch=main", ".")
    // seed origin with one commit so clone has a HEAD
    val seed = s"$tmp/seed"
    sh(tmp, "git", "clone", bare, seed)
    Files.write(Paths.get(seed, "README"), "reports\n".getBytes)
    sh(seed, "git", "add", "README")
    sh(seed, "git", "-c", "user.name=t", "-c", "user.email=t@x", "commit", "-m", "init")
    sh(seed, "git", "push", "origin", "HEAD")

    // a real Spark-written CSV artifact
    import spark.implicits._
    val report = Seq(("1.2.3.4", "US", "United States", 3L, "ssh/fail:3"))
      .toDF("address", "country_code", "country_name", "total_events", "counters")
    val now = java.time.ZonedDateTime.of(2026, 1, 2, 3, 4, 5, 0, java.time.ZoneOffset.UTC)
    val csvDir = Reporter.writeCsv(report, s"$tmp/out", now)

    val pub = new GitPublisher(s"$tmp/clone", bare, "https://example.org/reports").init()
    val url = pub.publishCsv(csvDir, addresses = 1L, events = 3L)

    val base = Reporter.fileName(now)
    assert(url == s"https://example.org/reports/$base")
    val log = sh(bare, "git", "log", "--format=%s", "main")
    assert(log.linesIterator.next() == "reporting 1 addresses, 3 total events")
    // artifact content round-trips through a fresh clone
    val check = s"$tmp/check"
    sh(tmp, "git", "clone", bare, check)
    val lines = Files.readAllLines(Paths.get(check, base)).asScala
    assert(lines.head == "address,country_code,country_name,total_events,counters")
    assert(lines.tail.head.startsWith("1.2.3.4,US,United States,3,"))

    // second publish from an existing clone exercises the pull path
    val csv2 = Reporter.writeCsv(report, s"$tmp/out2",
      now.plusHours(1))
    val pub2 = new GitPublisher(s"$tmp/clone", bare, "https://example.org/reports/").init()
    pub2.publishCsv(csv2, addresses = 1L, events = 3L)
    val log2 = sh(bare, "git", "log", "--oneline", "main")
    assert(log2.linesIterator.size == 3)
  }
}
