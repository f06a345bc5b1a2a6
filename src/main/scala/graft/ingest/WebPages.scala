package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic Common-Crawl-shaped web-pages table (BASELINE.json
 * input_hint: `(url, warc_ts, html, text, lang)`; FIXTURES.md F1).
 *
 * Every row derives from a splitmix64 stream keyed by (seed, rowId) —
 * generation is pure, partitioning-independent, and reproducible at any
 * scale (the bench generates 10^6+ rows with spark.range, no data files).
 * Domains are Zipf-ish (log-uniform rank over ~1000 domains) to create
 * the skewed hot cells the north rule's salting addresses; ~1/16 of rows
 * are re-captures of another url with a later warc_ts (url-dedup tests);
 * `text` is ALWAYS `Extractor.extract(html)` — the frozen byte-identical
 * invariant.
 */
object WebPages {

  final case class Page(
      url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  final val Langs = Array("en", "de", "fr", "es", "pt", "zh")
  final val Words: Array[String] = Array(
    "the", "data", "query", "table", "spark", "join", "scan", "merge",
    "sort", "filter", "agg", "window", "batch", "stream", "vector",
    "column", "row", "hash", "key", "value", "fast", "slow", "big",
    "small", "order", "group", "line", "part", "customer", "dup")

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Stateless per-row draw i of row id. */
  def draw(seed: Long, id: Long, i: Int): Long =
    splitmix64(splitmix64(seed ^ id) + i)

  def domainRank(seed: Long, id: Long): Int = {
    // log-uniform over [1, 1000]: density ~ 1/rank (Zipf-ish, exponent 1)
    val u = ((draw(seed, id, 0) >>> 11) * (1.0 / 9007199254740992.0))
    math.min(999, math.floor(math.exp(u * math.log(1000.0))).toInt - 1) + 1
  }

  /** The metadata head of [[makePage]] — identical (url, warc_ts, lang,
    * baseId) draws without building html or extracting text. Use when a
    * fixture only needs page identity (e.g. url-dedup corpora). */
  def makeMeta(seed: Long, id: Long): (String, Timestamp, String, Long) = {
    val dom = domainRank(seed, id)
    // ~1/16 rows are re-captures of an earlier url
    val recapture = (draw(seed, id, 1) & 15L) == 0L && id > 16
    val baseId = if (recapture) id - 1 - (draw(seed, id, 2) >>> 1) % 16 else id
    val baseDom = if (recapture) domainRank(seed, baseId) else dom
    val path = java.lang.Long.toHexString(splitmix64(seed ^ baseId) >>> 16)
    val url = s"https://site$baseDom.example.com/p/$path"
    val tsOffset = (draw(seed, id, 3) >>> 1) % (86400L * 365 * 1000)
    val ts = new Timestamp(1704067200000L + tsOffset) // base 2024-01-01T00Z
    val lang = Langs((baseDom % Langs.length.toLong).toInt)
    (url, ts, lang, baseId)
  }

  def makePage(seed: Long, id: Long): Page = {
    val (url, ts, lang, baseId) = makeMeta(seed, id)
    val nTokens = 30 + ((draw(seed, baseId, 4) >>> 1) % 120).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < nTokens) {
      if (i > 0) sb.append(' ')
      sb.append(Words(((draw(seed, baseId, 5 + i) >>> 1) % Words.length).toInt))
      i += 1
    }
    val body = sb.toString
    val title = body.split(' ').take(4).mkString(" ")
    val html = (s"<html><head><title>$title</title>" +
      s"<script>var x = ${id % 97};</script></head>" +
      s"<body><h1>$title</h1>\n<p>$body</p>\n" +
      s"<style>.c{color:red}</style><div>footer &amp; links</div></body></html>")
      .getBytes("UTF-8")
    Page(url, ts, html, Extractor.extract(html), lang)
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => makePage(seed, id)))
  }

  /** J6 url-dedup: latest capture per url (warc_ts desc, text hash as the
    * deterministic final tie-break). */
  def latestCapture(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, md5(col("text")).desc)
    pages.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
