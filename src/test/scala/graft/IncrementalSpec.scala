package graft

import graft.dedup.Incremental
import graft.ingest.WebPages
import org.apache.spark.sql.functions._

/** Bloom-pruned incremental dedup: bit-exact anti-join semantics with
  * the bloom acting only as a pruning pre-filter. */
class IncrementalSpec extends SparkSpec {

  private def pages(from: Long, to: Long) = {
    import spark.implicits._
    spark.range(from, to).map { id =>
      val (url, ts, lang, _) = WebPages.makeMeta(7L, id); (url, ts, lang)
    }.toDF("url", "warc_ts", "lang")
  }

  test("newRows == plain left-anti join on an overlapping batch") {
    val seen = pages(0, 2000)
    val batch = pages(1500, 3500)
    val got = Incremental.newRows(batch, seen, "url",
      estimatedItems = 4096, numBits = 1L << 16)
      .orderBy("url", "warc_ts").collect()
    val want = batch.join(seen, Seq("url"), "left_anti")
      .orderBy("url", "warc_ts").collect()
    assert(got.toSeq == want.toSeq)
    // the overlap really was removed: far fewer than the 2000 batch rows
    assert(got.length < 1700 && got.length > 1000)
  }

  test("empty seen set passes the whole batch through") {
    val batch = pages(0, 100)
    val empty = batch.filter(lit(false))
    assert(Incremental.newRows(batch, empty, "url").count() == 100)
  }

  test("no false negatives: bloom-definite rows never appear in seen") {
    val seen = pages(0, 1000)
    val bloom = Incremental.buildBloom(seen, "url", 4096, 1L << 16)
    val batch = pages(500, 1500)
    val definite = batch.filter(!Incremental.mightContain(bloom, "url"))
    assert(definite.join(seen, Seq("url"), "left_semi").count() == 0)
  }

  test("bloom prunes: candidate fraction is far below the batch size") {
    val seen = pages(0, 2000)
    val bloom = Incremental.buildBloom(seen, "url", 4096, 1L << 16)
    // a disjoint batch: every row is new, candidates are pure false positives
    val batch = pages(10000, 12000)
    val candidates = batch.filter(Incremental.mightContain(bloom, "url")).count()
    assert(candidates < 100, s"fpp too high: $candidates/2000 candidates")
  }

  test("result is invariant to input partitioning") {
    val seen = pages(0, 1000)
    val batch = pages(500, 1500)
    val a = Incremental.newRows(batch.repartition(13), seen.repartition(3), "url")
      .orderBy("url", "warc_ts").collect()
    val b = Incremental.newRows(batch.coalesce(1), seen.coalesce(1), "url")
      .orderBy("url", "warc_ts").collect()
    assert(a.toSeq == b.toSeq)
  }
}
