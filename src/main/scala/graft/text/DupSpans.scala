package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact duplicated-SUBSTRING detection — the span-level counterpart of
 * the document-level near-dup family in [[graft.dedup.Dedup]], after
 * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
 * Better" (arXiv:2107.06499): a k-token window whose exact text occurs
 * more than once anywhere in the corpus marks its span, and
 * overlapping/adjacent marked spans inside a doc merge into maximal
 * duplicated spans. Doc-level dedup cannot see these (two mostly-unique
 * pages sharing one boilerplate paragraph), yet excising them is a
 * standard training-data step; the paper's suffix-array formulation is
 * inherently single-machine, while this decomposition is three shuffles
 * of the same O(total_tokens) work:
 *
 *  1. windows: one hoisted tokenize + one `transform(sequence(...))`
 *     per row builds every k-window string, then one posexplode —
 *     O(total_tokens) rows, no join. (The split is hoisted into its own
 *     projection exactly as [[TextOps.shingles3]] documents: inlining
 *     it into the lambda re-executes the regex per ELEMENT.)
 *  2. duplicated windows: groupBy(window).count > 1, LEFT SEMI join
 *     back — the one corpus-wide shuffle, map-side combined; a
 *     planetary-hot window (site-wide boilerplate) is a skewed key, and
 *     AQE skew-join is the backstop exactly as for the tf-idf df join.
 *     At the 10^12-doc point the window STRING would shuffle ~k words
 *     per token; keying on xxhash64(window) instead is byte-cheaper and
 *     semantically identical modulo 64-bit collisions — the string key
 *     is kept here because the DuckDB oracle compares exact text.
 *  3. span merge: per-DOC running `max(pos + k - 1)` window + island
 *     sum (gaps-and-islands), partitioned by doc_id — bounded by
 *     tokens-per-doc, never corpus-global.
 *
 * Positions are 0-based token indices; a span [span_start, span_end] is
 * inclusive on both ends, so its token count is span_end - span_start + 1.
 */
object DupSpans {

  /** One row per (doc, pos) k-window: (idCol, pos, kg). Docs shorter
    * than k tokens emit no windows (the CASE guards `sequence`, which
    * would otherwise count DOWNWARD for start > stop). */
  def windows(docs: DataFrame, k: Int, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, "window size must be at least 2 tokens")
    docs.withColumn("__toks", split(col(textCol), " ", -1))
      .withColumn("__kgs", expr(
        s"""CASE WHEN size(__toks) >= $k THEN
           |  transform(sequence(0, size(__toks) - $k),
           |            i -> array_join(slice(__toks, i + 1, $k), ' '))
           |ELSE array() END""".stripMargin))
      .select(col(idCol), posexplode(col("__kgs")).as(Seq("pos", "kg")))
  }

  /** Maximal duplicated spans: (idCol, span_start, span_end, n_windows)
    * with n_windows the count of duplicated k-windows merged into the
    * span. Docs with no duplicated window emit no rows. */
  def spans(docs: DataFrame, k: Int, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    spansFrom(windows(docs, k, textCol, idCol), k, idCol)

  /** Corpus-frequency filter + island merge over a prepared window
    * table (idCol, pos, kg) — the pipeline shared by [[spans]] and
    * [[spansHashed]], which differ only in the kg key's type. */
  private def spansFrom(w: DataFrame, k: Int, idCol: String): DataFrame = {
    val dupKgs = w.groupBy(col("kg"))
      .agg(count(lit(1)).as("__f")).filter(col("__f") > 1)
      .select(col("kg"))
    val dup = w.join(dupKgs, Seq("kg"), "left_semi")
      .select(col(idCol), col("pos").cast("long").as("pos"))
    mergeIslands(dup, k, idCol)
  }

  /** [[spans]] with the corpus-frequency shuffle keyed on
    * xxhash64(window) instead of the window STRING — the 10^12-doc
    * shape the [[spans]] scaladoc describes: the shuffled key is 8
    * bytes instead of ~k words, at the price of treating 64-bit hash
    * collisions as duplicates (a false-positive rate of ~n²/2⁶⁵ pairs,
    * i.e. vanishing next to the boilerplate rate this op targets; the
    * merge/rollup stages are unchanged). Collision-free corpora —
    * every test SF — yield bit-identical spans, which is what
    * DupSpansSpec pins. */
  def spansHashed(docs: DataFrame, k: Int, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    spansFrom(
      windows(docs, k, textCol, idCol)
        .select(col(idCol), col("pos"), xxhash64(col("kg")).as("kg")),
      k, idCol)

  /** Gaps-and-islands merge of duplicated window positions into maximal
    * spans — the per-doc final stage shared by [[spans]] and
    * [[spansHashed]]. Input: (idCol, pos: long). */
  private def mergeIslands(dup: DataFrame, k: Int, idCol: String)
  : DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(k - 1).cast("long"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("__new", when(prevEnd.isNull || col("pos") > prevEnd + 1, 1L)
        .otherwise(0L))
      .withColumn("__island", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1).cast("long")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__island")
  }

  /** Excision — the step a training-data pipeline runs on the spans:
    * every token inside a duplicated span is dropped and the survivors
    * rejoin into `clean_text` (Lee et al. 2022 §4 deduplicate-and-train).
    * One extra doc_id-keyed join of the per-doc span list back onto the
    * corpus (same shuffle grain as [[coverage]]); the drop itself is a
    * per-row array lambda bounded by tokens-per-doc × spans-per-doc, so
    * it stays inside the scan pipeline. Docs with no duplicated span
    * pass through verbatim; a fully-duplicated doc yields an empty
    * clean_text with kept_tokens = 0 (the caller's filter grain). */
  def excise(docs: DataFrame, k: Int, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val perDoc = spans(docs, k, textCol, idCol)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn("__toks", split(col(textCol), " ", -1))
      .withColumn("__kept", expr(
        """filter(transform(__toks, (t, i) -> struct(t AS t, CAST(i AS BIGINT) AS i)),
          |       x -> __spans IS NULL OR
          |            NOT exists(__spans,
          |                       sp -> x.i >= sp.span_start AND
          |                             x.i <= sp.span_end))""".stripMargin))
      .select(col(idCol),
        array_join(expr("transform(__kept, x -> x.t)"), " ").as("clean_text"),
        size(col("__kept")).cast("long").as("kept_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("removed_tokens"))
  }

  /** Doc-level rollup over [[spans]]: every doc with its duplicated
    * token count and fraction — the filter/report grain of a corpus
    * hygiene pass. Docs without duplicated spans report 0 (left join);
    * dup_frac derives from two exact longs, so it is bit-identical
    * across engines. */
  def coverage(docs: DataFrame, k: Int, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val perDoc = spans(docs, k, textCol, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start") + 1).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    docs
      .select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .withColumn("dup_frac", col("dup_tokens") / col("n_tokens"))
  }
}
