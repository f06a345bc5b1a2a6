package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Count-based bigram language-model quality scoring — the CCNet-style
 * "LM fit" filter a training-data pipeline runs to bucket documents by
 * how surprising their text is under a reference corpus model.
 *
 * Instead of a transcendental perplexity (whose `log` is not guaranteed
 * bit-identical across engines/libms), the per-bigram signal is the
 * FIXED-POINT INVERSE of the add-one-smoothed conditional probability:
 *
 *   rarity(w1,w2) = ((c1(w1) + V) * 2^20) div (c12(w1,w2) + 1)
 *
 * with `c1` the left-unigram count, `c12` the bigram count, `V` the left
 * vocabulary size — pure integer +,*,div, so every engine computes the
 * identical BIGINT, and the doc score (mean rarity = arithmetic-mean
 * inverse probability) is ONE IEEE division of two exact integers:
 * correctly rounded, bit-identical, oracle-checkable. Rarity is a
 * strictly decreasing transform of p(w2|w1), so the induced quality
 * ranking agrees with a perplexity bucket sort wherever per-bigram
 * probabilities dominate (high mean-inverse-p == low LM fit).
 *
 * Scale shape (10^12 docs): model training is two map-side-combined
 * hash aggregates over the exploded bigrams (the same cost class as
 * tf-idf's tf/df pass). SCORING has two regimes:
 *  - exact: bigram-occurrences equi-join the model on (w1, w2) — hot
 *    bigrams ("of the") are planetary keys, AQE skew-join backstop;
 *  - pruned-broadcast (the 100 TB path, like PQ codebooks): the model
 *    keeps only the top-`maxVocab` bigrams/unigrams by count, becomes
 *    megabytes, broadcasts, and scoring is MAP-SIDE ONLY — zero shuffle
 *    over the corpus; pruned-away (rare) entries fall back to the
 *    smoothing floor, which only CAPS their rarity (c12+1 -> 1 raises
 *    rarity, but the pruned c1 floor lowers it — both deterministic).
 *
 * Overflow bound: (c1 + V) * 2^20 needs c1 + V < 2^43 (~8.8e12 bigram
 * tokens per left-word) — beyond any single token's corpus count until
 * ~10^13-token corpora of one repeated word; documented, not checked
 * per-row.
 */
object LangModel {

  /** Fixed-point scale of the rarity integer (2^20). */
  final val Scale: Long = 1L << 20

  /** Per-doc bigram occurrences: (idCol, w1, w2), one row per adjacent
    * token pair, row-local (explode of an index sequence — no shuffle).
    * Docs with < 2 tokens emit nothing. */
  def bigrams(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col(idCol),
        element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))

  /** Train the model over a reference corpus: returns
    * (unigrams(w1, c1), bigramCounts(w1, w2, c12), vocabV).
    * `maxVocab <= 0` keeps everything (exact regime); otherwise both
    * tables are pruned to the top-`maxVocab` rows by (count desc, word)
    * so they stay broadcast-small by construction. V is always the
    * UNPRUNED left-vocabulary size (the smoothing denominator must not
    * drift with the pruning knob). */
  def train(ref: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            maxVocab: Int = -1): (DataFrame, DataFrame, Long) = {
    val bg = bigrams(ref, textCol, idCol)
    val uni = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val v = uni.count()
    if (maxVocab <= 0) (uni, bi, v)
    else {
      // bounded: maxVocab rows survive; orderBy+limit is a global top-k
      // (TakeOrderedAndProject — no full sort materialization).
      val uniP = uni.orderBy(col("c1").desc, col("w1")).limit(maxVocab)
      val biP = bi.orderBy(col("c12").desc, col("w1"), col("w2")).limit(maxVocab)
      (uniP, biP, v)
    }
  }

  /** Score documents against a trained model: one row per doc with >= 1
    * bigram — (idCol, n_bigrams, rarity_sum BIGINT exact, rarity_mean
    * DOUBLE = one IEEE division). Missing model entries (pruned or
    * genuinely unseen) hit the add-one floor: c12 -> 0, and an unseen
    * LEFT word scores c1 -> 0. `broadcastModel` marks both model sides
    * broadcast (the pruned regime). In the exact regime the model's own
    * counts are the hot-key detector for free (the Tfidf.topTerms
    * trick): entries with count > `hotCount` funnel more than that many
    * occurrence rows through one reducer, so they split out, BROADCAST
    * (at most total/hotCount such keys exist), and resolve map-side;
    * only the skew-free cold tail takes the equi-join. Values are
    * identical either way; AQE remains the backstop under the
    * threshold. */
  def score(docs: DataFrame, uni: DataFrame, bi: DataFrame, vocabV: Long,
            textCol: String = "text", idCol: String = "doc_id",
            broadcastModel: Boolean = false,
            hotCount: Long = 1L << 20): DataFrame = {
    val scoredOcc =
      if (broadcastModel)
        bigrams(docs, textCol, idCol)
          .join(broadcast(bi), Seq("w1", "w2"), "left")
          .join(broadcast(uni), Seq("w1"), "left")
      else {
        val withBi = graft.core.Skew.hotCountSplitJoin(
          bigrams(docs, textCol, idCol), bi, Seq("w1", "w2"), "c12", hotCount)
        graft.core.Skew.hotCountSplitJoin(withBi, uni, Seq("w1"), "c1", hotCount)
      }
    scoredOcc
      // `div` is true integer division on BIGINT (never a double round
      // trip, which would lose exactness past 2^53)
      .select(col(idCol),
        expr(s"((coalesce(c1, CAST(0 AS BIGINT)) + ${vocabV}L) * ${Scale}L)" +
          " div (coalesce(c12, CAST(0 AS BIGINT)) + 1)").as("r"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r")).as("rarity_sum"))
      .select(col(idCol), col("n_bigrams"), col("rarity_sum"),
        (col("rarity_sum").cast("double") / col("n_bigrams"))
          .as("rarity_mean"))
  }

  /** Self-scoring convenience (train and score on the same corpus — the
    * "how typical is each doc of this crawl" signal). */
  def selfScore(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val (uni, bi, v) = train(docs, textCol, idCol)
    score(docs, uni, bi, v, textCol, idCol)
  }
}
