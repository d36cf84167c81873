package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {

  test("withUrlParts extracts scheme/host/path/query/fragment and derived fields") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3#frag"),
      (2L, "http://h1.example.org/p"),
      (3L, "https://localhost/x?a=1&b=2"))
      .toDF("id", "url")
    val rows = UrlOps.withUrlParts(df, "url").orderBy("id").collect()
    val r1 = rows(0)
    assert(r1.getAs[String]("scheme") == "https")
    assert(r1.getAs[String]("host") == "WWW.Ex.COM:443")
    assert(r1.getAs[String]("path") == "/a/b/")
    assert(r1.getAs[String]("query") == "utm_source=x&id=3")
    assert(r1.getAs[String]("fragment") == "frag")
    assert(r1.getAs[String]("registered_domain") == "ex.com")
    assert(r1.getAs[Int]("path_depth") == 2)
    assert(r1.getAs[Int]("n_params") == 2)
    val r2 = rows(1)
    assert(r2.getAs[String]("scheme") == "http")
    assert(r2.getAs[String]("registered_domain") == "h1.example.org"
      .split('.').takeRight(2).mkString("."))
    assert(r2.getAs[String]("query") == "")
    assert(r2.getAs[Int]("n_params") == 0)
    // single-label host: its own registered domain, no ANSI fault
    assert(rows(2).getAs[String]("registered_domain") == "localhost")
  }

  test("canonicalUrl erases case, www, default port, fragment, utm, trailing slash") {
    import spark.implicits._
    val df = Seq(
      "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3#f",
      "https://ex.com/a/b?id=3",
      "http://Ex.com:80/a/b?id=3&utm_medium=y",
      "https://ex.com/a/b?z=1&a=2")
      .toDF("url")
    val canon = df.select(UrlOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon(0) == "https://ex.com/a/b?id=3")
    assert(canon(1) == "https://ex.com/a/b?id=3")
    assert(canon(2) == "http://ex.com/a/b?id=3")
    // params are sorted so reorderings canonicalize equal
    assert(canon(3) == "https://ex.com/a/b?a=2&z=1")
  }

  test("urlDedup keeps the minimum id per canonical URL") {
    import spark.implicits._
    val df = Seq(
      (10L, "https://ex.com/a"),
      (7L, "HTTPS://WWW.ex.com/a/"),
      (3L, "https://ex.com/b"))
      .toDF("doc_id", "url")
    val out = UrlOps.urlDedup(df, "url", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 7L, 7L))
    assert(out.map(_.getBoolean(3)).toSeq == Seq(true, true, false))
  }

  test("canonicalUrl is idempotent over a generated URL population") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "HTTP", "https", "HTTPS")
    val hosts = Seq("Ex.COM", "www.ex.com", "a.B.org:443", "x.io:80", "localhost")
    val paths = Seq("", "/", "/a", "/a/b/", "/a//b///")
    val queries = Seq("", "?id=1", "?utm_source=x&id=2", "?b=2&a=1&utm_x=3")
    val frags = Seq("", "#f", "#x/y?z")
    val urls = (1 to 500).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size))
    }
    val df = urls.toDF("url")
      .withColumn("c1", UrlOps.canonicalUrl(col("url")))
    val bad = df.withColumn("c2", UrlOps.canonicalUrl(col("c1")))
      .filter(col("c1") =!= col("c2"))
      .collect()
    assert(bad.isEmpty,
      s"canonicalization must be a projection (idempotent): ${bad.take(3).mkString(";")}")
    // canonical forms carry no fragment, no utm params, and no port
    // that is the DEFAULT for their own scheme (a non-default port is
    // a different resource and must survive)
    val dirty = df.filter(col("c1").contains("#") ||
      col("c1").contains("utm_") ||
      (col("c1").startsWith("https://") && col("c1").contains(":443")) ||
      (col("c1").startsWith("http://") && col("c1").contains(":80"))).collect()
    assert(dirty.isEmpty, dirty.take(3).mkString(";"))
  }

  test("canonicalUrl strips the default port only for the matching scheme") {
    import spark.implicits._
    val canon = Seq(
      "http://ex.com:443/x",  // non-default for http: port survives
      "https://ex.com:80/x",  // non-default for https: port survives
      "http://ex.com:80/x",   // default for http: stripped
      "https://ex.com:443/x") // default for https: stripped
      .toDF("url")
      .select(UrlOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon(0) == "http://ex.com:443/x", canon(0))
    assert(canon(1) == "https://ex.com:80/x", canon(1))
    assert(canon(2) == "http://ex.com/x", canon(2))
    assert(canon(3) == "https://ex.com/x", canon(3))
  }

  test("registered_domain keeps three labels under multi-label public suffixes") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://www.bbc.co.uk/news"),
      (2L, "https://shop.foo.com.au/x"),
      (3L, "https://co.uk/"),          // the bare suffix itself: 2 labels
      (4L, "https://a.b.ex.com/y"))    // ordinary TLD: last two labels
      .toDF("id", "url")
    val got = UrlOps.withUrlParts(df, "url").orderBy("id")
      .collect().map(_.getAs[String]("registered_domain")).toSeq
    assert(got == Seq("bbc.co.uk", "foo.com.au", "co.uk", "ex.com"), got)
  }

  test("hostRollup counts docs, canonical URLs, and the dup ratio per domain") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://a.ex.com/x", 100L),
      (2L, "https://WWW.a.ex.com/x/", 50L),
      (3L, "https://b.ex.com/y", 25L),
      (4L, "https://other.org/z", 10L))
      .toDF("doc_id", "url", "n_chars")
    val out = UrlOps.hostRollup(df, "url", "n_chars")
      .orderBy("registered_domain").collect()
    assert(out.length == 2)
    val exCom = out(0)
    assert(exCom.getAs[String]("registered_domain") == "ex.com")
    assert(exCom.getAs[Long]("n_docs") == 3L)
    assert(exCom.getAs[Long]("n_canonical") == 2L)
    assert(exCom.getAs[Long]("total_chars") == 175L)
    assert(exCom.getAs[Long]("dup_ratio_micro") == 1000000L / 3)
  }
}
