package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level exact line deduplication — the C4/RefinedWeb rule: a
 * line (boilerplate, navigation, repeated legal footers) that occurs
 * anywhere else in the corpus is kept only at its FIRST occurrence
 * (lexicographically smallest (doc_id, pos)) and deleted everywhere
 * else; documents are then reassembled with their surviving lines in
 * original order. Documents whose every line is deleted drop out
 * entirely (C4 drops empty docs).
 *
 * Scale shape: posexplode -> one hash aggregate keyed by line with a
 * map-side-combinable `min(struct(doc_id, pos))` (NOT a window over
 * the line partition — no sort, and a hot boilerplate line that occurs
 * 10^9 times folds to one struct per partition before the shuffle) ->
 * equi-join back on (line, doc_id, pos) -> one groupBy(doc_id) to
 * reassemble. Three shuffles total, all hash, independent of how
 * skewed the line-frequency distribution is.
 */
object LineDedup {

  /** (id, text) -> (id, text) with corpus-duplicate lines removed.
    * Line order inside a doc is preserved; docs left with zero lines
    * are dropped. */
  def dedupLines(docs: DataFrame, id: String = "doc_id",
                 text: String = "text", sep: String = "\n"): DataFrame = {
    val lines = docs.select(col(id).as("__did"),
      posexplode(split(col(text), java.util.regex.Pattern.quote(sep), -1))
        .as(Seq("__pos", "__line")))
    val keepers = lines.groupBy("__line")
      .agg(min(struct(col("__did"), col("__pos"))).as("__k"))
      .select(col("__line"), col("__k.__did").as("__kdid"),
        col("__k.__pos").as("__kpos"))
    lines.join(keepers, Seq("__line"))
      .filter(col("__did") === col("__kdid") && col("__pos") === col("__kpos"))
      .groupBy(col("__did").as(id))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        sep).as(text))
  }
}
