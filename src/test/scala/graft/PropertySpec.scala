package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.config.{ParserConf, RuleConf, SensorConf}
import graft.parse.LogParser
import graft.timefmt.GoTimeFormat
import graft.functions.IpUtil
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY §5.4) — driver-less properties run
  * pure functions; the ≤1-event-per-line law is checked via the Spark
  * pipeline on generated batches.
  */
object PropertySpec extends Properties("graft") {

  // --- ip_to_num laws -----------------------------------------------------
  val octet: Gen[Int] = Gen.choose(0, 255)

  property("ipToNum/longToIpv4 roundtrip") =
    forAll(octet, octet, octet, octet) { (a, b, c, d) =>
      val ip = s"$a.$b.$c.$d"
      IpUtil.longToIpv4(IpUtil.ipv4ToLong(UTF8String.fromString(ip))).toString == ip
    }

  property("ipToNum never throws on arbitrary strings, invalid -> -1") =
    forAll(Gen.asciiPrintableStr) { s =>
      val r = IpUtil.ipv4ToLong(UTF8String.fromString(s))
      r == -1L || (r >= 0L && r <= 0xffffffffL)
    }

  property("ipToNum is monotone in address order") =
    forAll(octet, octet) { (a, b) =>
      val x = IpUtil.ipv4ToLong(UTF8String.fromString(s"10.0.0.$a"))
      val y = IpUtil.ipv4ToLong(UTF8String.fromString(s"10.0.0.$b"))
      (a < b) == (x < y) || a == b
    }

  // --- Go layout translation laws ----------------------------------------
  val layoutToken: Gen[String] = Gen.oneOf(
    "2006", "01", "02", "_2", "15", "04", "05", "Jan", "Mon", "-0700", " ", ":", "/", "-")

  property("layout translation never throws and quotes literals") =
    forAll(Gen.listOfN(6, layoutToken)) { toks =>
      val t = GoTimeFormat.translate(toks.mkString)
      // a translated pattern contains no bare Go tokens
      !t.pattern.contains("2006") && !t.pattern.contains("_2")
    }

  // --- parser laws (Spark) ------------------------------------------------
  lazy val spark = SparkSpec.spark

  val sensor = SensorConf("ssh", "", enabled = true, 10,
    ParserConf(
      "^(.+)\\s+.+\\s+sshd\\[\\d+\\]: (.+)\\s+(.+)\\s+port\\s+\\d+$",
      "2006 Jan _2 15:04:05",
      Map("datetime" -> 1, "message" -> 2, "address" -> 3)),
    Seq(RuleConf("auth-failure", "message", "Authentication (failure|error|failed) for .+"),
      RuleConf("user-enumeration", "message", "(Illegal|Invalid) user .+")))

  val lineGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr, // garbage
    for {
      day <- Gen.choose(1, 28)
      msg <- Gen.oneOf("Authentication failed for root",
        "Invalid user admin", "Accepted publickey for x", "random text")
      oct <- octet
    } yield s"Aug $day 11:22:33 host sshd[9]: $msg 10.0.0.$oct port 22")

  property("pipeline emits at most one event per line, never throws") =
    forAll(Gen.listOfN(30, lineGen)) { lines =>
      import spark.implicits._
      val df = lines.toDF("value")
      val out = LogParser.pipeline(df, sensor, "n",
        Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), 2024)
      val n = out.count()
      val matching = lines.count(l =>
        l.matches("(?i)^(.+)\\s+.+\\s+sshd\\[\\d+\\]: (.+)\\s+(.+)\\s+port\\s+\\d+$") && {
          val m = java.util.regex.Pattern
            .compile("(?i)^(.+)\\s+.+\\s+sshd\\[\\d+\\]: (.+)\\s+(.+)\\s+port\\s+\\d+$")
            .matcher(l)
          m.find() && (m.group(2).matches("Authentication (failure|error|failed) for .+") ||
            m.group(2).matches("(Illegal|Invalid) user .+"))
        })
      n == matching && n <= lines.length
    }

  // --- span dedup reconstruction law --------------------------------------
  // with an unreachable df threshold nothing is dropped, and rejoining the
  // word-window spans with single spaces must reconstruct EXACTLY the
  // normalized text — segmentation loses nothing, for any input
  property("span dedup with an unreachable df reconstructs normalized text") =
    forAll(Gen.listOfN(5, Gen.listOfN(25,
      Gen.oneOf("abzXZ 019!@#ü\n\t.,-".toSeq)).map(_.mkString))) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = graft.ops.Dedup.dropDuplicateSpans(
          docs, spanWords = 3, minDf = Int.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      val norm = docs
        .select(col("doc_id"), graft.ops.Dedup.normalize(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      norm.forall { case (id, n) => kept(id) == n }
    }

  // --- report totals law --------------------------------------------------
  property("report counters sum to total_events per address") =
    forAll(Gen.listOfN(50, for {
      addr <- Gen.oneOf("1.1.1.1", "2.2.2.2", "3.3.3.3")
      rule <- Gen.oneOf("r1", "r2", "r3")
    } yield (addr, "US", "United States", "s", rule))) { rows =>
      import spark.implicits._
      val report = graft.report.Reporter.report(
        rows.toDF("address", "country_code", "country_name", "sensor", "rule"))
        .collect()
      report.forall { r =>
        val counters = r.getAs[String]("counters")
        val sum = counters.split('|').map(_.split(':').last.toLong).sum
        sum == r.getAs[Long]("total_events")
      } && report.map(_.getAs[Long]("total_events")).sum == rows.length
    }

  // --- multimodal codec laws ----------------------------------------------

  // The scene-cut oracle's entire validity rests on the JDK PNG round trip
  // being bit-lossless: every decoded pixel must equal the analytic
  // generator formula exactly, for any in-range level.
  property("synthPngLinear round-trips exact pixels through the PNG codec") =
    forAll(Gen.choose(0L, 200L)) { level =>
      val img = graft.multimodal.Multimodal.decodeImage(
        graft.multimodal.Multimodal.synthPngLinear(level, 16, 12)).get
      (0 until 12).forall(y => (0 until 16).forall { x =>
        ((img.getRGB(x, y) >> 8) & 0xff) == (level + x / 4 + y / 3).toInt
      })
    }
}
