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

  /** Left-join `occ` to a COUNT-CARRYING lookup table whose count column
    * is its own hot-key detector: entries with `cntCol` > hotCount would
    * funnel more than that many occurrence rows through one reducer, so
    * they split out, BROADCAST (at most total/hotCount such keys exist
    * by construction), and resolve map-side; only the skew-free cold
    * tail takes the shuffle equi-join. Result rows/values are identical
    * to the plain left join (the same lookup row matches either way);
    * unmatched occurrences keep NULL `cntCol`, exactly like the naive
    * join. Shared by Tfidf.topTerms and LangModel.score. */
  def hotCountSplitJoin(occ: DataFrame, lookup: DataFrame,
                        keys: Seq[String], cntCol: String,
                        hotCount: Long): DataFrame = {
    val pre = occ.join(broadcast(lookup.filter(col(cntCol) > hotCount)),
      keys, "left")
    pre.filter(col(cntCol).isNotNull).unionByName(
      pre.filter(col(cntCol).isNull).drop(cntCol)
        .join(lookup.filter(col(cntCol) <= hotCount), keys, "left"))
  }
}
