package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed exclusive prefix sum (scan) over a totally-ordered key —
 * WITHOUT the single-partition window trap: `Window.orderBy(key)` with
 * no partitionBy funnels the whole table through ONE task, which is the
 * canonical Spark scale bug for running totals. This is the two-level
 * scan every distributed-systems text prescribes, in pure DataFrame
 * algebra:
 *
 *   1. bucket each row by a deterministic coarse function of the key
 *      (caller-supplied; e.g. `key >> 10` — NOT spark_partition_id(),
 *      which depends on physical partitioning and would break
 *      determinism);
 *   2. per-bucket totals (one hash agg) → running offsets over the
 *      buckets (a window over the BUCKET table, which is small —
 *      #buckets rows, the one place a global window is safe);
 *   3. within-bucket running sum (window partitioned BY bucket — fully
 *      parallel, each partition bounded by bucket size) + broadcast
 *      the offsets back.
 *
 * Result: exclusive prefix sum of `valueCol` in `(bucket, key)` order,
 * deterministic under any physical partitioning. Shuffle cost: one
 * hash agg + one keyed window — no stage sees more than a bucket.
 */
object PrefixSum {

  /** Adds `prefix` = sum of `valueCol` over all rows strictly before
    * this row in (bucket, key) order. `bucketExpr` must be a pure
    * monotone-in-key coarsening of `keyCol` (same key order across
    * bucket boundaries). */
  def exclusive(df: DataFrame, keyCol: String, valueCol: String,
                bucketExpr: Column): DataFrame = {
    val b = df.withColumn("_bkt", bucketExpr)
    val offsets = b.groupBy("_bkt")
      .agg(sum(col(valueCol)).as("_bsum"))
      .withColumn("_boff",
        coalesce(sum(col("_bsum")).over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_boff")
    val w = Window.partitionBy("_bkt").orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(offsets), "_bkt")
      .withColumn("prefix",
        col("_boff") + coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .drop("_bkt", "_boff")
  }
}
