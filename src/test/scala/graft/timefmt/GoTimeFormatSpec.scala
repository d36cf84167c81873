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
}
