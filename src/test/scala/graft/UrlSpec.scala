package graft

import graft.queries.WebQueries
import graft.text.UrlOps
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.normalize(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  test("normalize: hand-checked examples") {
    assert(norm(
      "HTTP://Site9.Example.COM:80/p/ab?b=2&a=1#frag",
      "https://site1.example.com:443",
      "https://site1.example.com:8080/x",
      "http://a.b.example.com/Path?zz=1",
      "http://plain.example.com"
    ) == Seq(
      "http://site9.example.com/p/ab?a=1&b=2",
      "https://site1.example.com/",
      "https://site1.example.com:8080/x",
      "http://a.b.example.com/Path?zz=1",
      "http://plain.example.com/"
    ))
  }

  test("normalize is idempotent over the messy fixture") {
    import spark.implicits._
    val raw = spark.range(2000L).map(id => WebQueries.messyUrl(99L, id)).toDF("url")
    val twice = raw.select(UrlOps.normalize(col("url")).as("n1"))
      .select(col("n1"), UrlOps.normalize(col("n1")).as("n2"))
    assert(twice.filter(col("n1") =!= col("n2")).count() == 0)
  }

  test("case/fragment/param-order variants collapse to one key") {
    val vs = norm(
      "http://X.example.com/p?a=1&b=2",
      "HTTP://x.EXAMPLE.com:80/p?b=2&a=1#s",
      "http://x.example.com/p?b=2&a=1")
    assert(vs.distinct.size == 1)
    // but a genuinely different port/path must NOT collapse
    assert(norm("http://x.example.com:8080/p?a=1").head != vs.head)
  }

  test("edge shapes: bare query, empty query, mismatched default port") {
    assert(norm(
      "http://h.example.com?b=2&a=1", // query without path
      "http://h.example.com?",        // empty query marker
      "http://x.example.com:443/p",   // https default on http -> kept
      "https://x.example.com:80/p",   // http default on https -> kept
      "http://x.example.com/p#f?notquery", // '?' inside fragment
      "example.com/Path?b=2&a=1",          // schemeless -> untouched
      "/relative/Link#f"                   // relative -> untouched
    ) == Seq(
      "http://h.example.com/?a=1&b=2",
      "http://h.example.com/",
      "http://x.example.com:443/p",
      "https://x.example.com:80/p",
      "http://x.example.com/p",
      "example.com/Path?b=2&a=1",
      "/relative/Link#f"
    ))
  }

  test("host and registered domain extraction") {
    import spark.implicits._
    val rows = Seq(
      "https://A.B.Example.COM:443/x?q=1#f",
      // non-default port is kept in host but must NOT leak into reg_domain
      "https://a.example.com:8080/x").toDF("url")
      .select(UrlOps.hostOf(col("url")).as("h"),
        UrlOps.registeredDomain(UrlOps.hostOf(col("url"))).as("d"))
      .collect()
    assert(rows(0).getString(0) == "a.b.example.com")
    assert(rows(0).getString(1) == "example.com")
    assert(rows(1).getString(0) == "a.example.com:8080")
    assert(rows(1).getString(1) == "example.com")
  }
}
