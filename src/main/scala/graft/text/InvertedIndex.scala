package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Positional inverted index + exact phrase search — the IR primitive a
 * corpus query layer needs (decontamination by exact phrase, quote
 * detection, citation lookup) expressed relationally.
 *
 * Index shape: one row per (term, doc_id) with the sorted 1-based
 * positions array — clustered by term, but NEVER a corpus-wide posting
 * array per term: row size is bounded by a single document's length,
 * so a planetary-scale stopword costs many small rows (a skewed
 * GROUP BY key handled by AQE / `Skew.hotKeys`), not one unboundable
 * row. Build cost is one explode (map-side) + one hash aggregate.
 *
 * Phrase search: for a k-term phrase, filter the index to the k terms
 * (predicate pushdown reaches the scan; on a term-clustered index this
 * is a k-partition read) and chain k-1 equi-joins on doc_id — all k
 * sides share the doc_id key, so AQE plans them as co-partitioned —
 * then intersect positions with array lambdas (codegen'd, no UDF):
 * a match starts at p iff term_i sits at p + i for every i.
 */
object InvertedIndex {

  /** (term, doc_id, positions) — positions are 1-based token indexes,
    * sorted ascending, under the repo's whitespace tokenizer
    * ([[TextOps.tokens]]). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p0", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("p0") + 1)).as("positions"))

  /** Documents containing the consecutive-token `phrase`:
    * (doc_id, starts, n_matches) where starts are the 1-based
    * positions of the phrase's first token. A repeated term in the
    * phrase reuses its single index row (the join stays k-1 rows
    * deep per doc). */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      index.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, "doc_id"))
    val starts = (1 until phrase.size).foldLeft(col("p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"p$i"), p + i))
    }
    joined
      .select(col("doc_id"), starts.as("starts"))
      .filter(size(col("starts")) > 0)
      .select(col("doc_id"), col("starts"),
        size(col("starts")).cast("long").as("n_matches"))
  }
}
