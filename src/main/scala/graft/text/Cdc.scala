package graft.text

import org.apache.spark.sql.DataFrame
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
 * independent of prior cuts, so every row chunks alone inside one
 * projection (see [[chunks]]: zero exchanges). Every quantity is an
 * exact integer: codes ≤ 0x10FFFF, `h < 2^47`, the Lehmer mix
 * `h·48271 mod (2^31−1)` stays under 2^63 — the identical arithmetic
 * runs in the DuckDB dual (which gathers per position relationally,
 * a structurally different machine over the same math).
 */
object Cdc {

  /** Chunk table (doc_id, ci, start, len, h) — `ci` 0-based chunk
    * index, `start` 0-based char offset, `h` = md5 of the chunk text.
    * The final chunk always ends at the last character; empty docs
    * yield no chunks.
    *
    * MAP-ONLY: the whole computation is nested higher-order column
    * expressions over each row's own character array — window hash per
    * position (`aggregate` over the W trailing codes), mask filter,
    * cut list, per-chunk substring+md5 via one `inline` — so the plan
    * has NO exchange at all until a consumer aggregates (CdcSpec plan
    * guard). At 10^12 docs this is a pure projection pipeline; the
    * per-row cost is O(len·W) with len bounded by the page size. */
  def chunks(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", window: Int = 16,
             maskBits: Int = 8): DataFrame = {
    require(window >= 2 && window <= 32, "window in [2,32]")
    require(maskBits >= 1 && maskBits <= 20, "maskBits in [1,20]")
    val mask = 1L << maskBits
    val w1 = window - 1
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        length(col(textCol)).cast("long").as("len"))
      .filter(col("len") > 0)
      .withColumn("_codes",
        expr("transform(split(text, ''), c -> bigint(ascii(c)))"))
      .withColumn("_cuts", expr(
        s"""CASE WHEN len - 1 >= $w1 THEN
           |  filter(sequence(bigint($w1), len - 1),
           |    p -> (aggregate(sequence(0, $w1),
           |            bigint(0),
           |            (acc, k) -> acc + element_at(_codes, int(p - k + 1))
           |                        * shiftleft(bigint(1), int(k)))
           |          * 48271 % 2147483647) % $mask = 0)
           |ELSE array() END""".stripMargin))
      .withColumn("_ends", expr(
        "array_sort(array_distinct(concat(_cuts, array(len - 1))))"))
      .select(col("doc_id"), col("text"), expr(
        """inline(transform(sequence(0, size(_ends) - 1),
          |  i -> struct(bigint(i) AS ci,
          |    IF(i = 0, bigint(0), element_at(_ends, i) + 1) AS start,
          |    element_at(_ends, i + 1) AS p)))""".stripMargin))
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
