package graft

import graft.ingest.{Extractor, WebPages}
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("extractor golden cases (frozen spec v1)") {
    def x(s: String) = Extractor.extractStr(s)
    assert(x("<html><body><p>hello world</p></body></html>") == "hello world")
    assert(x("<p>a</p><p>b</p>") == "a\nb")
    assert(x("<script>var x=1;</script>text") == "text")
    assert(x("<style>.c{}</style><div>t</div>") == "t")
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &#65;") == "a & b <c> \"d\" A")
    assert(x("  spaced   <b>bold</b>words  ") == "spaced boldwords")
    assert(x("<SCRIPT>shout</SCRIPT>ok") == "ok")
    assert(x("<div>multi\n\n\nline</div>") == "multi\nline")
    assert(x("&nope; &#x41; stays") == "&nope; &#x41; stays")
    assert(x("truncated <div") == "truncated")
  }

  test("generated page text is byte-identical to re-extraction (invariant)") {
    val pages = WebPages.generate(spark, 500).collect()
    pages.foreach { p =>
      assert(p.text == Extractor.extract(p.html), s"url ${p.url}")
      assert(p.text.nonEmpty && p.url.startsWith("https://site"))
    }
  }

  test("generation is deterministic and partitioning-independent") {
    val a = WebPages.generate(spark, 1000).collect()
      .sortBy(p => (p.url, p.warc_ts.getTime))
    val b = {
      import spark.implicits._
      spark.range(1000).repartition(13)
        .mapPartitions(_.map(id => WebPages.makePage(42L, id)))
        .collect().sortBy(p => (p.url, p.warc_ts.getTime))
    }
    assert(a.map(_.url).toSeq == b.map(_.url).toSeq)
    assert(a.map(_.text).toSeq == b.map(_.text).toSeq)
  }

  test("recaptures exist and url-dedup keeps the latest") {
    val pages = WebPages.generate(spark, 3000).toDF()
    val total = pages.count()
    val distinctUrls = pages.select("url").distinct().count()
    assert(distinctUrls < total, "expected duplicated urls")
    val deduped = WebPages.latestCapture(pages)
    assert(deduped.count() == distinctUrls)
    // kept row per url has the max warc_ts
    val maxTs = pages.groupBy("url").agg(max("warc_ts").as("m"))
    val bad = deduped.join(maxTs, "url").filter(col("warc_ts") =!= col("m")).count()
    assert(bad == 0)
  }

  test("domains are skewed (hot head)") {
    val pages = WebPages.generate(spark, 5000).toDF()
    val byDomain = pages
      .withColumn("domain", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .groupBy("domain").count().orderBy(col("count").desc).collect()
    assert(byDomain.head.getLong(1) > 5 * byDomain.last.getLong(1))
  }
}
