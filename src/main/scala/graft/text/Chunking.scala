package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sliding-window document chunking — the context-window preparation
 * step an LLM training/RAG pipeline runs between cleaning and packing:
 * split each document into token windows of `chunkSize` every `stride`
 * tokens (overlap = chunkSize - stride when stride < chunkSize).
 *
 * Contract (exact, engine-independent): with n = token count, chunk k
 * covers tokens [k*stride, min(k*stride + chunkSize, n)) for
 * k = 0 .. max(0, min(floor((n-1)/stride), ceil((n-chunkSize)/stride)))
 * — so a short doc yields exactly one chunk, no chunk is empty or a
 * pure suffix of its predecessor, and when stride <= chunkSize the
 * last chunk reaches the tail (shrinking rather than spilling past
 * it; the floor term never binds in that regime). stride > chunkSize
 * is allowed (sampled non-contiguous windows) and leaves gaps by
 * design — there the floor term stops the windows at the end.
 *
 * Scale shape: pure map-only column expressions — one `sequence`
 * explode per doc (bounded by n/stride), array `slice` + `concat_ws`
 * for the window text; no shuffle, no UDF, whole-stage codegen. This
 * is per-DOC windowing; cross-doc fixed-capacity packing is
 * [[Packing]], and the two compose (chunk here, pack the chunks).
 */
object Chunking {

  /** (all original columns, chunk_idx INT, tok_start, n_toks BIGINT,
    * chunk_text) — one row per window. */
  def slidingChunks(docs: DataFrame, chunkSize: Int, stride: Int,
                    textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      "chunkSize and stride must be positive")
    // null text would otherwise slip through the null-skipping
    // greatest/least (size(null) = -1 makes kMax 0 and n_toks -1,
    // emitting a bogus empty chunk row where the SQL dual emits NULL) —
    // the contract says no empty chunk, so null docs yield no row
    val docsNN = docs.filter(col(textCol).isNotNull)
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks).cast("long")
    val kMax = greatest(lit(0L), least(
      floor((n - 1) / lit(stride)).cast("long"),
      floor((n - chunkSize + stride - 1) / lit(stride)).cast("long")))
    docsNN
      .withColumn("_toks", toks)
      .withColumn("_k", explode(sequence(lit(0L), kMax)))
      .withColumn("chunk_idx", col("_k").cast("int"))
      .withColumn("tok_start", col("_k") * stride)
      .withColumn("n_toks",
        least(lit(chunkSize.toLong),
          size(col("_toks")).cast("long") - col("tok_start")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("_toks"),
          (col("tok_start") + 1).cast("int"), col("n_toks").cast("int"))))
      .drop("_toks", "_k")
  }
}
