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

  /** Top-k salient terms per doc: (doc_id, term, tf, df, rk). */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    tf.join(dfT, "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rk"))
  }
}
