package graft.timefmt

import org.scalatest.funsuite.AnyFunSuite

class GoTimeFormatSpec extends AnyFunSuite {
  import GoTimeFormat._

  test("ssh layout: 2006 Jan _2 15:04:05") {
    val t = translate("2006 Jan _2 15:04:05")
    assert(t.pattern == "yyyy MMM d HH:mm:ss")
    assert(t.normalizeSpaces)
  }

  test("nginx layout: 02/Jan/2006:15:04:05 -0700") {
    val t = translate("02/Jan/2006:15:04:05 -0700")
    assert(t.pattern == "dd/MMM/yyyy:HH:mm:ss Z")
    assert(!t.normalizeSpaces)
  }

  test("iso-ish layout with literal letter") {
    assert(translate("2006-01-02T15:04:05").pattern == "yyyy-MM-dd'T'HH:mm:ss")
  }

  test("12-hour and fractional seconds") {
    assert(translate("03:04:05.000 PM").pattern == "hh:mm:ss.SSS a")
    assert(translate("3:4:5 pm").pattern == "h:m:s a")
  }

  test("two-digit year and offsets") {
    assert(translate("06/01/02").pattern == "yy/MM/dd")
    assert(translate("2006 -07:00").pattern == "yyyy XXX")
  }

  test("year alternation covers currYear-5..currYear") {
    assert(yearAlternation(2026) == "(2021|2022|2023|2024|2025|2026)")
  }

  test("hasYearField") {
    assert(hasYearField("2006 Jan _2"))
    assert(!hasYearField("Jan _2 15:04:05"))
  }

  test("common Go reference layouts translate correctly") {
    assert(translate("2006-01-02T15:04:05Z07:00").pattern == "yyyy-MM-dd'T'HH:mm:ssXXX") // RFC3339
    assert(translate("Mon Jan _2 15:04:05 2006").pattern == "EEE MMM d HH:mm:ss yyyy") // ANSIC
    assert(translate("Mon, 02 Jan 2006 15:04:05 MST").pattern == "EEE, dd MMM yyyy HH:mm:ss zzz") // RFC1123
    assert(translate("01/02/06").pattern == "MM/dd/yy")
    assert(translate("15:04:05.000000").pattern == "HH:mm:ss.SSSSSS")
  }

  test("translated pattern round-trips through Spark's parser") {
    // compile check: every translated pattern must be accepted by java.time
    for (layout <- Seq("2006 Jan _2 15:04:05", "02/Jan/2006:15:04:05 -0700",
        "2006-01-02T15:04:05", "Mon Jan _2 15:04:05 2006")) {
      val t = translate(layout)
      java.time.format.DateTimeFormatter.ofPattern(t.pattern) // must not throw
    }
  }
}
