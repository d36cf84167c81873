package graft.timefmt

/** Translates Go `time.Parse` reference layouts (the public
  * "Mon Jan 2 15:04:05 MST 2006" scheme) into Spark datetime patterns, so
  * config files written for the reference keep working unchanged
  * (reference: core/sensor.go:98, config.example.yml:34,56).
  *
  * Notable mismatch handled here: Go `_2` (space-padded day-of-month) has no
  * Spark/java.time equivalent — we emit `d` and flag the layout as needing
  * duplicate-space normalization before parsing (SURVEY §7.4).
  */
object GoTimeFormat {

  final case class Translated(pattern: String, normalizeSpaces: Boolean)

  /** Longest-match-first token table. Order matters: "2006" before "06"
    * before "0"; "-0700" before "07"; "January" before "Jan". */
  private val tokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy",
    "January" -> "MMMM",
    "Jan" -> "MMM",
    "Monday" -> "EEEE",
    "Mon" -> "EEE",
    "-07:00" -> "XXX",
    "-0700" -> "Z",
    "Z07:00" -> "XXX",
    "Z0700" -> "X",
    ".000000000" -> ".SSSSSSSSS",
    ".000000" -> ".SSSSSS",
    ".000" -> ".SSS",
    "15" -> "HH",
    "01" -> "MM",
    "02" -> "dd",
    "03" -> "hh",
    "04" -> "mm",
    "05" -> "ss",
    "06" -> "yy",
    "_2" -> "d",
    "MST" -> "zzz",
    "PM" -> "a",
    "pm" -> "a",
    "1" -> "M",
    "2" -> "d",
    "3" -> "h",
    "4" -> "m",
    "5" -> "s",
  )

  /** Translate a Go layout to a Spark timestamp-parse pattern. Literal
    * letters are single-quoted so they aren't interpreted as pattern fields.
    */
  def translate(goLayout: String): Translated = {
    val sb = new StringBuilder
    var i = 0
    var normalize = false
    while (i < goLayout.length) {
      tokens.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) =>
          if (go == "_2") normalize = true
          sb.append(java)
          i += go.length
        case None =>
          val c = goLayout.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'')
          else if (c == '\'') sb.append("''")
          else sb.append(c)
          i += 1
      }
    }
    Translated(sb.toString, normalize)
  }

  /** Year-repair parity (reference: core/parser.go:55-62,72-74): syslog
    * datetimes carry no year; if none of [currYear-5, currYear] appears as a
    * substring, the current year is prepended. Returns the regex alternation
    * used to detect a year. */
  def yearAlternation(currYear: Int): String =
    (currYear - 5 to currYear).mkString("(", "|", ")")

  /** A Go layout needs the year-repair prefix iff it starts with a year
    * field the raw data won't contain — reference prepends "<year> " to the
    * *value*, and its layouts then carry a leading "2006 ". */
  def hasYearField(goLayout: String): Boolean =
    goLayout.contains("2006") || goLayout.contains("06")
}
