package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016,
 * arXiv:1508.07909) — the subword-tokenizer learning step an LLM
 * training-data pipeline runs over the corpus it just cleaned. The
 * repo's other text ops consume a fixed tokenization; this op LEARNS
 * one: repeatedly find the most frequent adjacent symbol pair and fuse
 * it into a new symbol.
 *
 * Scale shape (the classic BPE reduction): the corpus collapses ONCE
 * into a word-frequency vocabulary (one corpus-wide hash aggregate —
 * at web scale ~10^8 distinct words from 10^12 docs), and every
 * training round thereafter touches ONLY the vocab table:
 *   1. pair counts  = one map-side-combined hash aggregate over the
 *      per-word adjacent pairs (built with array HOFs, no join);
 *   2. best pair    = a 1-row TakeOrdered collect (count DESC, then
 *      (left, right) ASC — a total, engine-independent order);
 *   3. merge apply  = MAP-ONLY: a greedy left-to-right fold over each
 *      word's symbol array (`aggregate` HOF), no shuffle at all.
 * So nMerges rounds cost nMerges vocab-sized aggregates and zero
 * joins; the vocab is localCheckpoint'ed per round to truncate
 * lineage (the PageRank/DupClusters loop discipline).
 *
 * Determinism: counts are exact integers, the argmax order is total,
 * and the greedy fold is a pure function of the symbol array — the
 * learned merge table is bit-identical across engines, partitionings,
 * and replays. The DuckDB dual (q_bpe_merges) replays three full
 * rounds with a set-wise formulation of the same greedy: for a pair
 * (a,b) with a != b no two occurrences can overlap, so greedy merges
 * ALL of them; for a == b, occurrences inside a run of equal symbols
 * alternate from the run's start (gaps-and-islands parity). The
 * oracle match is therefore also an equivalence proof of the two
 * formulations on the test corpus; BpeSpec pins the adversarial runs
 * ("aaaaa", "ababab", chained multi-char merges) against a scalar
 * reference trainer.
 */
object Bpe {

  /** Word-frequency vocabulary with single-character start symbols:
    * (w, freq, syms ARRAY<STRING>). One corpus-wide aggregate; empty
    * tokens dropped. */
  def vocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("w"), ""))

  /** Corpus-weighted adjacent-pair histogram over the vocab:
    * (pair_left, pair_right, pair_count). Array-HOF pair build (no
    * join), one hash aggregate. */
  def pairCounts(v: DataFrame): DataFrame =
    v.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("l"),
          element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("pair_left"), col("p.r").as("pair_right"))
      .agg(sum("freq").as("pair_count"))

  /** Greedy left-to-right merge of adjacent (a, b) into a+b inside a
    * symbol array — one `aggregate` fold carrying (emitted, pending):
    * a merged occurrence consumes both symbols, so "aaa" under (a,a)
    * becomes [aa, a], exactly the reference BPE apply step. Pure
    * column expression: applying a merge to the whole vocab is
    * map-only. */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val empty = typedLit(Array.empty[String])
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("pending")),
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pending")
        when(pend.isNull, struct(out.as("out"), s.as("pending")))
          .when(pend === lit(a) && s === lit(b),
            struct(concat(out, array(lit(a + b))).as("out"),
              lit(null).cast("string").as("pending")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            s.as("pending")))
      },
      acc => when(acc.getField("pending").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pending")))))
  }

  /** Learn `nMerges` merges: (rank INT from 1, pair_left, pair_right,
    * pair_count). Stops early if the vocab runs out of pairs. */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): DataFrame = {
    require(nMerges >= 1, "nMerges must be positive")
    val spark = docs.sparkSession
    var v = vocab(docs, textCol).localCheckpoint(eager = true)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    while (learned.size < nMerges && !exhausted) {
      val top = pairCounts(v)
        .orderBy(desc("pair_count"), asc("pair_left"), asc("pair_right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((learned.size + 1, a, b, c))
        v = v.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(eager = true)
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "pair_left", "pair_right", "pair_count")
  }

  /** Tokenize with a learned merge list: each whitespace token splits
    * to characters, then every merge applies in rank order (the BPE
    * inference step). Output (all original columns, bpe_tokens
    * ARRAY<STRING>, n_bpe_tokens) — a single map-only projection (the
    * merges fold nests inside a per-token `transform`), so encoding a
    * 100 TB corpus is embarrassingly parallel. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text"): DataFrame = {
    val perToken: Column => Column = w =>
      merges.foldLeft(split(w, ""): Column) {
        case (acc, (a, b)) => applyMerge(acc, a, b)
      }
    docs
      .withColumn("bpe_tokens",
        flatten(transform(
          filter(TextOps.tokens(col(textCol)), _ =!= ""),
          perToken)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }
}
