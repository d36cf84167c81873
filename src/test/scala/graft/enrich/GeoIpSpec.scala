package graft.enrich

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoIpSpec extends SparkSpec {

  lazy val geo = GeoIp.fromCsv(spark, fixture("geo.csv"))

  test("point lookups hit the right range (J1)") {
    import spark.implicits._
    val events = Seq("203.0.113.7", "198.51.100.23", "192.0.2.10").toDF("address")
    val got = GeoIp.enrich(events, geo)
      .select("address", "country_code", "country_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("203.0.113.7", "US", "United States"),
      ("198.51.100.23", "NL", "Netherlands"),
      ("192.0.2.10", "CN", "China")))
  }

  test("gap and invalid addresses stay NULL (left-outer parity)") {
    import spark.implicits._
    val events = Seq("8.8.8.8", "not-an-ip", "203.0.114.1").toDF("address")
    val got = GeoIp.enrich(events, geo).select("country_code").collect()
    assert(got.forall(_.isNullAt(0)))
    assert(got.length == 3) // no rows lost
  }

  test("range spanning multiple /16 buckets still matches once") {
    import spark.implicits._
    // 10.0.0.0 - 10.3.255.255 spans 4 /16 buckets
    val wide = Seq((167772160L, 168034303L, "XX", "Wide")).toDF(
      "start_ip_num", "end_ip_num", "country_code", "country_name")
    val events = Seq("10.0.0.1", "10.3.255.254", "10.4.0.1").toDF("address")
    val got = GeoIp.enrich(events, wide)
      .select("address", "country_code")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("10.0.0.1", "XX"), ("10.3.255.254", "XX"), ("10.4.0.1", null)))
  }

  test("broadcast hash equi-join, not nested-loop (scale contract)") {
    import spark.implicits._
    val events = Seq("10.0.0.1").toDF("address")
    val plan = GeoIp.enrich(events, geo).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("backfill flags changed countries (S9/P10)") {
    import spark.implicits._
    val events = Seq(
      ("203.0.113.7", "XX", "Wrong"),   // should change to US
      ("198.51.100.23", "NL", "Netherlands")) // unchanged
      .toDF("address", "country_code", "country_name")
    val (refreshed, changed) = GeoIp.backfill(events, geo)
    val n = refreshed.filter(changed).count()
    assert(n == 1)
    val us = refreshed.filter(col("address") === "203.0.113.7").head()
    assert(us.getAs[String]("country_code") == "US")
  }
}
