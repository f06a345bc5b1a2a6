package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact one-sided CUSUM changepoint detection over a per-key counting
 * series — the classic burst/regime-shift monitor (Page 1954) for an
 * event log, computed with EXACT integer arithmetic only (drift and
 * threshold are integers, so every running statistic is a BIGINT and the
 * result is bit-identical across engines — no transcendental, no IEEE
 * accumulation).
 *
 * Semantics per key, over its time-ordered buckets t with counts x_t:
 *
 *   S_t = Σ_{i<=t} (x_i − drift)        (drift-adjusted running sum)
 *   C_t = S_t − min_{i<=t} S_i          (current drawup above the
 *                                        historical minimum)
 *   alarm_t = C_t >= threshold
 *
 * `C_t` is exactly the textbook recursive form
 * `C_t = max(0, C_{t−1} + x_t − drift)` unrolled — the running-minimum
 * identity turns the recursion into two scans, which is what makes a
 * DISTRIBUTED exact implementation possible.
 *
 * Scale shape (the reason this operator is not just two global windows):
 * a per-key `Window.orderBy(t)` puts one key's ENTIRE history in one
 * task — at the 10^12-event design point a hot key's minute series is
 * years × 5·10^5 minutes/year and growing, the same single-task funnel
 * [[graft.core.PrefixSum]] exists to avoid. Both scans (running sum AND
 * running min) are therefore two-level: per-(key, bucket-of-2^shift-
 * buckets) local windows — bounded by 2^shift rows — plus one window
 * over the small per-key bucket table. The final join back is on the
 * same (key, bucket) hash the local windows shuffled on, so Catalyst
 * reuses the exchange instead of adding one.
 *
 * The mirrored DuckDB dual IS the naive global-window form (`sum(..)
 * OVER (PARTITION BY key ORDER BY t)` + `min(..) OVER (...)`) — the
 * oracle match proves the two-level decomposition equals the textbook
 * scan, the same contract as q_shuffle_rank / q_exact_quantiles.
 */
object Cusum {

  /** CUSUM statistics for a pre-aggregated counting series
    * `(key, t, x)`: returns `(key, t, x, s, cusum, alarm)` where `s`,
    * `cusum` are BIGINT and `alarm = cusum >= threshold`. `t` must be a
    * non-negative integral bucket index (e.g. epoch minute). */
  def changepoints(counts: DataFrame, keyCol: String, tCol: String,
                   xCol: String, drift: Long, threshold: Long,
                   bucketShift: Int = 10): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 63, "bucketShift in [0,63)")
    val rows = counts.select(
      col(keyCol), col(tCol).cast("long").as(tCol),
      col(xCol).cast("long").as(xCol),
      (col(xCol).cast("long") - lit(drift)).as("_d"),
      shiftright(col(tCol).cast("long"), bucketShift).as("_bkt"))

    // Local inclusive scans, bounded by bucket width 2^shift.
    val wLoc = Window.partitionBy(col(keyCol), col("_bkt")).orderBy(tCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = rows
      .withColumn("_ps", sum(col("_d")).over(wLoc))
      .withColumn("_pm", min(col("_ps")).over(wLoc))

    // Per-key bucket table: one row per (key, bucket) — small (series
    // length / 2^shift). Its windows are the safe place for a per-key
    // ordered scan.
    val wBkt = Window.partitionBy(keyCol).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = local.groupBy(col(keyCol), col("_bkt"))
      .agg(sum(col("_d")).as("_bsum"), min(col("_ps")).as("_bminloc"))
      .withColumn("_boff", coalesce(sum(col("_bsum")).over(wBkt), lit(0L)))
      .withColumn("_mprev", min(col("_boff") + col("_bminloc")).over(wBkt))
      .select(col(keyCol), col("_bkt"), col("_boff"), col("_mprev"))

    // S = bucket offset + local scan; running min splices the prior-
    // bucket min with the local prefix min.
    local.join(buckets, Seq(keyCol, "_bkt"))
      .withColumn("s", col("_boff") + col("_ps"))
      .withColumn("cusum",
        col("s") - least(coalesce(col("_mprev"), col("_boff") + col("_pm")),
          col("_boff") + col("_pm")))
      .withColumn("alarm", col("cusum") >= lit(threshold))
      .select(col(keyCol), col(tCol), col(xCol), col("s"), col("cusum"),
        col("alarm"))
  }

  /** Convenience: per-`keyCol` counts in `secs`-second time buckets
    * from a raw event table, zero-filled ONLY at observed buckets
    * (absent buckets carry no evidence in a counting CUSUM with integer
    * drift: a gap of g empty buckets lowers S by g·drift, which the
    * caller can model by densifying; this operator scores the observed
    * series, which is the standard log-analytics form). The bucket
    * index is `floor(epoch_seconds / secs)` — one IEEE division whose
    * floor is identical across engines. */
  def bucketCounts(events: DataFrame, keyCol: String, tsCol: String,
                   secs: Long, bucketName: String = "t"): DataFrame =
    events.groupBy(col(keyCol),
        floor(col(tsCol).cast("timestamp").cast("double") / secs.toDouble)
          .cast("long").as(bucketName))
      .agg(count(lit(1)).as("cnt"))
}
