package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Content-defined chunking (the LBFS / rsync / FastCDC family): cut
 * every document into chunks at positions where a rolling hash of the
 * trailing `window` characters hits a mask — so chunk boundaries move
 * WITH content, and an insertion early in a page shifts every byte
 * offset but almost no boundary. Identical passages in different
 * documents then produce identical chunks at different offsets, which
 * offset-based shingling can never align — the byte-level dedup
 * primitive behind backup dedup and delta sync, here aimed at
 * boilerplate passages in crawl text.
 *
 * Exactness + parallel shape: the classic Gear hash resets at each cut,
 * making chunking sequential per doc. This operator uses the WINDOWED
 * form — `h(p) = Σ_{j<W} code(p−j)·2^j`, boundary iff
 * `Lehmer(h) ≡ 0 (mod 2^maskBits)` — whose boundary test is
 * independent of prior cuts, so the whole corpus chunks in one
 * splat-and-aggregate: each character contributes `code·2^k` to the
 * hashes of positions p..p+W−1 (a W-literal explode — the stencil
 * splat one dimension down), one hash agg sums them, and the only
 * per-doc window ranks the few boundaries of one document (bounded by
 * doc length). Every quantity is an exact integer: codes ≤ 0x10FFFF,
 * `h < 2^47`, the Lehmer mix `h·48271 mod (2^31−1)` stays under 2^63 —
 * the identical arithmetic runs in the DuckDB dual.
 */
object Cdc {

  /** Chunk table (doc_id, ci, start, len, h) — `ci` 0-based chunk
    * index, `start` 0-based char offset, `h` = md5 of the chunk text.
    * The final chunk always ends at the last character; empty docs
    * yield no chunks. */
  def chunks(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", window: Int = 16,
             maskBits: Int = 8): DataFrame = {
    require(window >= 2 && window <= 32, "window in [2,32]")
    require(maskBits >= 1 && maskBits <= 20, "maskBits in [1,20]")
    val mask = 1L << maskBits
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      length(col(textCol)).cast("long").as("len"))
    val chars = d
      .select(col("doc_id"), col("len"),
        posexplode(split(col("text"), "")).as(Seq("pos", "c")))
      .filter(length(col("c")) === 1)
      .select(col("doc_id"), col("len"), col("pos").cast("long").as("pos"),
        ascii(col("c")).cast("long").as("code"))
    val offs = array((0 until window).map(k =>
      struct(lit(k.toLong).as("k"), lit(1L << k).as("w"))): _*)
    val splat = chars.select(col("doc_id"), col("len"), col("pos"),
        col("code"), explode(offs).as("o"))
      .select(col("doc_id"), col("len"),
        (col("pos") + col("o.k")).as("p"),
        (col("code") * col("o.w")).as("hv"))
      .groupBy(col("doc_id"), col("len"), col("p"))
      .agg(sum(col("hv")).as("h"))
    val cuts = splat
      .filter(col("p") >= (window - 1) && col("p") <= col("len") - 1)
      .filter((col("h") * 48271L % 2147483647L) % mask === 0)
      .select(col("doc_id"), col("p"))
    val ends = cuts
      .unionByName(d.filter(col("len") > 0)
        .select(col("doc_id"), (col("len") - 1).as("p")))
      .distinct()
    val w = Window.partitionBy("doc_id").orderBy("p")
    val segs = ends
      .withColumn("start", coalesce(lag(col("p"), 1).over(w), lit(-1L)) + 1)
      .withColumn("ci", (row_number().over(w) - 1).cast("long"))
    segs.join(d.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("ci"), col("start"),
        (col("p") - col("start") + 1).as("len"),
        md5(expr("substring(text, CAST(start + 1 AS INT), " +
          "CAST(p - start + 1 AS INT))")).as("h"))
  }

  /** Cross-document duplicate chunks: per repeated chunk content, the
    * copy count, distinct docs, chunk length, and the chars a
    * content-addressed store saves. */
  def dupChunks(chunkTable: DataFrame): DataFrame =
    chunkTable.groupBy(col("h"), col("len"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") > 1)
      .withColumn("chars_saved", (col("n_copies") - 1) * col("len"))
}
