package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Test-set decontamination — the training-pipeline gate that removes
 * corpus documents overlapping an evaluation benchmark (the reference
 * pipeline has no analog; this is north-rule LLM-data territory, same
 * family as [[Dedup]]): a document is CONTAMINATED when it shares at
 * least one word n-gram with any benchmark text. Published pipelines
 * (GPT-3 appx C, PaLM, Llama) use 8-13 gram collision; the engine keys
 * on the same 3-gram shingles as the MinHash family ([[TextOps
 * .shingles3]]) so one shingle extraction serves dedup, MinHash, and
 * decontamination.
 *
 * Scale shape: the corpus side explodes to (doc_id, shingle) and
 * DISTINCTs per doc (hash aggregate, map-side combine); the benchmark
 * side distincts to a shingle set — benchmarks are eval-suite sized
 * (10^4-10^6 rows), so Spark broadcasts it; a benchmark too big to
 * broadcast degrades to a shuffle equi-join on the shingle, never a
 * cross product. The join key is the raw shingle STRING — exact by
 * construction; at the 100 TB point you'd pre-hash both sides to a
 * 64-bit key (one in 2^64 false-positive flags a doc, acceptable for a
 * REMOVAL gate) and the shape is unchanged.
 */
object Decontaminate {

  /** (doc_id, n_shared) for every corpus document sharing >= 1 distinct
    * 3-gram shingle with the benchmark; n_shared counts the distinct
    * shared shingles (the thresholding knob: callers drop at
    * n_shared >= k). Documents with no overlap are absent. */
  def overlap(corpus: DataFrame, benchmark: DataFrame,
              text: String = "text"): DataFrame = {
    // Join BEFORE deduplicating (guide §3.2: reduce the big side before
    // shuffling it): the benchmark shingle set is broadcast-sized by
    // construction, so the equi-join drops every non-matching corpus
    // shingle MAP-SIDE and only the matched (doc, shingle) rows reach a
    // shuffle — the old shape distinct'ed the ENTIRE exploded corpus
    // (every shingle of every document) first. countDistinct restores
    // the per-doc set semantics over the surviving rows; the result is
    // identical (distinct shared shingles per doc).
    val corpusSh = TextOps.shingles3(corpus, text)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val benchSh = TextOps.shingles3(benchmark, text)
      .select(explode(col("shingles")).as("s"))
      .distinct()
    corpusSh.join(benchSh, "s")
      .groupBy("doc_id").agg(countDistinct(col("s")).as("n_shared"))
  }

  /** Fractional contamination score for EVERY corpus document with at
    * least one shingle: n_shared / n_shingles over the doc's distinct
    * shingles (0.0 for clean docs — unlike [[overlap]], absence means
    * "too short to shingle", not "clean"). The score is one IEEE
    * division of two exact integer counts, so even the double column is
    * bit-reproducible cross-engine — the graded-threshold variant of the
    * binary gate (published pipelines drop at a fraction, e.g. >70%
    * 8-gram overlap in GPT-3 appx C, rather than any-hit). */
  def score(corpus: DataFrame, benchmark: DataFrame,
            text: String = "text"): DataFrame = {
    // One aggregate instead of three passes: the per-doc denominator
    // needs the full distinct shingle set anyway, so dedup (doc, s) once,
    // tag each surviving shingle with broadcast benchmark membership
    // (no extra shuffle), and take both counts in a single hash
    // aggregate — the old shape ran the distinct lineage twice (totals +
    // shared) and joined the two aggregates back together.
    val corpusSh = TextOps.shingles3(corpus, text)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .distinct()
    val benchSh = TextOps.shingles3(benchmark, text)
      .select(explode(col("shingles")).as("s"))
      .distinct()
    corpusSh
      .join(benchSh.withColumn("_hit", lit(true)), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("_hit"), 1)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles")).as("contam"))
  }

  /** The clean corpus: rows of `corpus` sharing FEWER than
    * `minSharedToDrop` distinct shingles with the benchmark survive; a
    * document is dropped once n_shared >= minSharedToDrop (left-anti
    * join on the flagged ids — one shuffle keyed by doc_id). The name
    * states the drop gate directly: with the default 1, ANY overlap
    * drops the document. */
  def clean(corpus: DataFrame, benchmark: DataFrame,
            minSharedToDrop: Long = 1, text: String = "text"): DataFrame = {
    val flagged = overlap(corpus, benchmark, text)
      .where(col("n_shared") >= minSharedToDrop)
      .select("doc_id")
    corpus.join(flagged, Seq("doc_id"), "left_anti")
  }
}
