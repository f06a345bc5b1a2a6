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
    * docs longer than `capacity` span several. */
  def concatChunk(docs: DataFrame, capacity: Long, bucketShift: Int = 8,
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
}
