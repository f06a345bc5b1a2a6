package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bigram collocation scoring (PMI family) over the corpus — the
 * statistic behind multi-word-expression mining and tokenizer-merge
 * candidates (the counts feeding [[Bpe]] rank differently; PMI
 * normalizes by unigram popularity instead of raw frequency).
 *
 * Determinism contract: all counts are exact integer aggregates; the
 * score is the PMI RATIO (not its log — log is transcendental and
 * engine-dependent; the ratio orders identically because log is
 * monotone): ratio = (c_xy / N_bi) / ((c_x / N_uni) * (c_y / N_uni))
 * = c_xy * N_uni^2 / (N_bi * c_x * c_y), computed as ONE IEEE division
 * of two exact integer products — bit-identical across engines.
 * Overflow contract: c_xy * N_uni^2 must fit a long; at corpus scale
 * the exact-integer path needs N_uni < ~2^31 * sqrt(1/c_max) — beyond
 * that, derive the products in DOUBLE up front (ordering is then
 * approximate in the last bit, which PMI mining tolerates).
 *
 * Scale shape: bigrams explode map-side from each doc's token array
 * (arrays_zip of two slices — no self-join); unigram and bigram counts
 * are hash aggregates; the two unigram joins key on vocabulary terms
 * (stopword keys are hot — both sides are post-aggregate, vocabulary-
 * sized, so the join is broadcastable whenever the vocabulary is);
 * the two totals ride along as a one-row broadcast.
 */
object Collocations {

  /** (t1, t2, c_xy, c_x, c_y, pmi_ratio) for bigrams with
    * c_xy >= minCount, under the repo's whitespace tokenizer. */
  def pmiBigrams(docs: DataFrame, minCount: Long,
                 textCol: String = "text"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val bi = docs
      .select(explode(arrays_zip(
        slice(toks, lit(1), n - 1).as("t1"),
        slice(toks, lit(2), n - 1).as("t2"))).as("b"))
      .groupBy(col("b.t1").as("t1"), col("b.t2").as("t2"))
      .agg(count(lit(1)).as("c_xy"))
    val totals = uni.agg(sum(col("c")).as("nu"))
      .crossJoin(bi.agg(sum(col("c_xy")).as("nb")))
    bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("tok").as("t1"), col("c").as("c_x")), "t1")
      .join(uni.select(col("tok").as("t2"), col("c").as("c_y")), "t2")
      .crossJoin(broadcast(totals))
      .select(col("t1"), col("t2"), col("c_xy"), col("c_x"), col("c_y"),
        (
          (col("c_xy") * col("nu") * col("nu")).cast("double") /
            (col("nb") * col("c_x") * col("c_y")).cast("double")
        ).as("pmi_ratio"))
  }
}
