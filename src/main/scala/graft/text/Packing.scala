package graft.text

import graft.core.PrefixSum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Concat-and-chunk sequence packing — the standard LLM pre-training
 * layout: documents are concatenated in a canonical order (doc_id) and
 * the token stream is cut into fixed-`capacity` training sequences.
 * Each doc is labeled with its global token offset and the chunk range
 * it lands in, from which a writer can emit the packed sequences.
 *
 * The whole op is one exclusive prefix sum over token counts
 * ([[graft.core.PrefixSum]] — the two-level scan, NOT a global-order
 * window, which would funnel 10^12 rows through one task) plus two
 * integer divisions. Offsets are deterministic (pure function of
 * doc_id order), so the packing is reproducible across runs and
 * engines — which is what makes sequence boundaries auditable after
 * the fact.
 *
 * @param bucketShift log2 of docs per scan bucket: the bucket table
 *        (one row per bucket) must stay broadcast-small and each
 *        bucket's window sort bounded; at 10^12 docs, shift 20 gives
 *        ~10^6 buckets of ~10^6 docs.
 */
object Packing {

  /** (doc_id, n_tokens, start_off, chunk_first, chunk_last) in doc_id
    * order. A doc spans chunks [chunk_first, chunk_last] (inclusive);
    * docs longer than `capacity` span several.
    *
    * Default `bucketShift` is 20 (docs-per-bucket 2^20): at the 10^12-doc
    * design point that keeps the broadcast bucket table at ~10^6 rows and
    * each per-bucket window at ~10^6 rows — a shift of 8 would make the
    * bucket table itself ~4e9 rows, un-broadcastable and funneled through
    * PrefixSum's single-task bucket window. Tests pass small shifts
    * explicitly to exercise the multi-bucket decomposition. */
  def concatChunk(docs: DataFrame, capacity: Long, bucketShift: Int = 20,
                  textCol: String = "text", idCol: String = "doc_id")
  : DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val withTokens = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    PrefixSum.exclusive(withTokens, idCol, "n_tokens",
        shiftrightunsigned(col(idCol), bucketShift))
      .select(col(idCol), col("n_tokens"), col("prefix").as("start_off"),
        // `div` is exact integer division — a double `/` + cast would
        // lose exactness past 2^53 total tokens
        expr(s"prefix div ${capacity}L").as("chunk_first"),
        expr(s"(prefix + n_tokens - 1) div ${capacity}L").as("chunk_last"))
  }

  /** The packed sequences themselves, flat form: one row per
    * (chunk_id, doc slice) — `tok_start`/`tok_len` index into the doc's
    * token array and `seq_off` is where the slice lands inside the
    * chunk, so a writer can assemble every fixed-`capacity` training
    * sequence with full doc provenance. This is [[concatChunk]] plus one
    * explode of each doc's [chunk_first..chunk_last] intersection — no
    * new shuffle beyond the prefix sum; the explode fan-out per doc is
    * ceil(n_tokens/capacity)+1, so output size is O(total_tokens /
    * capacity + n_docs) regardless of skew. Zero-token docs occupy no
    * tokens and emit no slice. */
  def chunkSlices(docs: DataFrame, capacity: Long, bucketShift: Int = 20,
                  textCol: String = "text", idCol: String = "doc_id")
  : DataFrame = {
    val labeled = concatChunk(docs, capacity, bucketShift, textCol, idCol)
    labeled
      .filter(col("n_tokens") > 0)
      // sequence() is inclusive on both ends, matching chunk_last
      .select(col(idCol), col("n_tokens"), col("start_off"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk_id"))
      .withColumn("_cs", col("chunk_id") * lit(capacity))
      .withColumn("_lo", greatest(col("start_off"), col("_cs")))
      .withColumn("_hi",
        least(col("start_off") + col("n_tokens"), col("_cs") + lit(capacity)))
      .select(col("chunk_id"), col(idCol),
        (col("_lo") - col("start_off")).as("tok_start"),
        (col("_hi") - col("_lo")).as("tok_len"),
        (col("_lo") - col("_cs")).as("seq_off"))
  }

  /** The packed sequences, assembled form: one row per chunk_id with its
    * slices in sequence order — `slices` is an array of
    * (seq_off, doc_id, tok_start, tok_len) structs sorted by seq_off
    * (struct order: seq_off first, so sort_array IS sequence order) and
    * `chunk_len` the filled token count (== capacity everywhere except
    * the final chunk). One groupBy(chunk_id) over [[chunkSlices]]; each
    * group is at most capacity slices, so the agg state is bounded by
    * `capacity` regardless of corpus size. */
  def emitChunks(docs: DataFrame, capacity: Long, bucketShift: Int = 20,
                 textCol: String = "text", idCol: String = "doc_id")
  : DataFrame =
    chunkSlices(docs, capacity, bucketShift, textCol, idCol)
      .groupBy(col("chunk_id"))
      .agg(
        sort_array(collect_list(struct(col("seq_off"), col(idCol),
          col("tok_start"), col("tok_len")))).as("slices"),
        sum(col("tok_len")).as("chunk_len"))
}
