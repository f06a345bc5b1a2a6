package graft.core

/** Engine-standard session tuning shared by every main and the tests. */
object SessionDefaults {
  /** `InferFiltersFromGenerate` clones the generator's input expression
    * into a pre-Generate filter (`size(e) > 0 AND isnotnull(e)`), and
    * predicate pushdown then substitutes the producing projection into
    * that filter. For a non-codegen expression — e.g. the shingle
    * zip_with chain, whose higher-order functions always evaluate
    * interpreted — the chain runs 3x per row and its tokenizing split
    * 12x. The inferred filter only pre-drops rows the non-outer explode
    * would drop anyway, so it is pure cost here: excluding the rule cut
    * q_minhash_sig from ~2.8 s to ~1.0 s at sf0.1 (and q_ngram_jaccard
    * proportionally) with identical results. */
  val ExcludedOptimizerRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}
