package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rarity-weighted top terms per document — the tf-idf keyword-extraction
 * primitive a training-data pipeline runs for topicality features and
 * domain balancing. Salience here is tf/df (term frequency in the doc
 * over corpus document frequency, i.e. tf-idf with the linear idf
 * variant): unlike log-idf it needs no transcendental function, so the
 * ranking key is ONE IEEE division of two exact integers — correctly
 * rounded and therefore bit-identical across engines, which is what lets
 * the whole ranking be oracle-checked exactly. Ties (equal tf and df)
 * break lexicographically on the term, making the per-doc order total.
 *
 * Scale shape: tf is one map-side-combined hash aggregate over the
 * exploded tokens; df is a second aggregate over tf's (already distinct)
 * (doc, term) pairs; the tf x df equi-join shuffles by term; the top-k
 * window shuffles by doc_id and sorts only each doc's own term list
 * (bounded by doc vocabulary). Nothing is collected; no UDFs.
 */
object Tfidf {

  /** Corpus-commonness (boilerplate) score: for each doc, the mean
    * document frequency of its DISTINCT 3-gram shingles — the count-based
    * "LM corpus fit" heuristic a filtering pipeline runs to separate
    * template/boilerplate pages (shingles shared by many docs → high
    * score) from novel text (rare shingles → low). The avg is ONE IEEE
    * division of two exact integer aggregates, so it is bit-exact
    * cross-engine. Docs with < 3 tokens have no shingles and no row.
    *
    * Scale shape: distinct-per-doc explode → shingle-df hash agg →
    * equi-join by shingle → per-doc hash agg; the same machinery (and
    * cost) as MinHash signatures, no windows, nothing collected. */
  def shingleCommonness(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val sh = TextOps.shingles3(docs, textCol)
      .select(col(idCol), explode(col("shingles")).as("s"))
      .distinct()
    val dfS = sh.groupBy("s").agg(count(lit(1)).as("df"))
    sh.join(dfS, "s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), sum("df").as("df_sum"))
      .select(col(idCol), col("n_shingles"), col("df_sum"),
        (col("df_sum").cast("double") / col("n_shingles")).as("avg_df"))
  }

  /** Top-k salient terms per doc: (doc_id, term, tf, df, rk).
    *
    * Skew: stopword terms ("the") are present in nearly every doc, so
    * the tf x df equi-join's shuffle-by-term would funnel ~N rows of a
    * hot term through one reducer at corpus scale. The df table itself
    * is the hot-key detector for free — a term's df IS its row count on
    * the join's left side — so terms with `df > hotDf` are split out,
    * BROADCAST (their count is bounded by total_pairs / hotDf, small by
    * construction), and resolved map-side with no term shuffle; only the
    * skew-free cold tail takes the equi-join. Values are identical to
    * the naive join (same df either way); the tf aggregate's exchange is
    * reused across the two branches. AQE skew-join remains the backstop
    * for borderline keys under the threshold. */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text",
               idCol: String = "doc_id", hotDf: Long = 1L << 20): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val joined =
      graft.core.Skew.hotCountSplitJoin(tf, dfT, Seq("term"), "df", hotDf)
    val w = Window.partitionBy(idCol)
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rk"))
  }
}
