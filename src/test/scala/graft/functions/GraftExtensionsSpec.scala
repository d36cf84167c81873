package graft.functions

import graft.SparkSpec

/** The shared test session is built `.withExtensions(new GraftExtensions)`
  * (see SparkSpec) — these specs prove the build-time SQL registration
  * path end-to-end. */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-registered SQL functions resolve and evaluate") {
    val r = spark.sql(
      """SELECT ip_to_num('10.0.0.1') AS ip,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       regex_groups('a-1', '(\\w)-(\\d)') AS groups,
        |       min_window_md5('hello world', 4) AS fp""".stripMargin).head()
    assert(r.getLong(0) == 167772161L)
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a", "1"))
    assert(r.getString(3).length == 32)
  }

  test("ip_to_num returns NULL for invalid input via SQL") {
    assert(spark.sql("SELECT ip_to_num('nope')").head().isNullAt(0))
  }

  test("non-literal regex_groups pattern is rejected at plan time") {
    intercept[Exception] {
      spark.sql("SELECT regex_groups('x', concat('a', 'b'))").head()
    }
  }

  test("count_in_set counts with multiplicity via SQL") {
    val r = spark.sql(
      "SELECT count_in_set(array('the','cat','the','dog'), 'the', 'a', 'an')").head()
    assert(r.getInt(0) == 2)
    assert(spark.sql(
      "SELECT count_in_set(cast(array() AS ARRAY<STRING>), 'x')").head().getInt(0) == 0)
  }
}
