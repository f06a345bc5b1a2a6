package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling (north rule: "salted repartitioning for skewed
 * hot cells — popular domains clustered in dense tiles"). AQE's skew
 * join split is enabled as backstop in the session config; this module
 * is the deterministic-salting path for aggregations, where AQE cannot
 * split a hot group.
 *
 * Pattern: two-level aggregation. Partials are computed per
 * (key, salt) — salt spreads one hot key over `buckets` reducers — then
 * merged per key. Exact for algebraic aggregates (count/sum/min/max):
 * the merge re-combines partials losslessly.
 */
object Skew {

  /** Deterministic salt in [0, buckets) from a discriminator column
    * (e.g. the url within a hot cell). */
  def saltCol(discriminator: Column, buckets: Int): Column =
    pmod(xxhash64(discriminator), lit(buckets.toLong))

  /** Exact salted count-per-key. */
  def saltedCount(df: DataFrame, key: Column, discriminator: Column,
                  buckets: Int, as: String = "n"): DataFrame =
    df.withColumn("__salt", saltCol(discriminator, buckets))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as(as))

  /** Exact salted sum-per-key. */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column,
                discriminator: Column, buckets: Int, as: String = "s"): DataFrame =
    df.withColumn("__salt", saltCol(discriminator, buckets))
      .withColumn("__v", valueCol)
      .groupBy(key.as("__key"), col("__salt"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as(as))

  /** Hot-key detection pre-pass: keys with > threshold rows (computed
    * exactly; at scale run it on a sample and scale the threshold). */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key.as("__key")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(col("__key"))
}
