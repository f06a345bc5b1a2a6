package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D skyline (Pareto frontier, maximize both axes): the rows no other
 * row strictly dominates (x' ≥ x ∧ y' ≥ y with one strict). The classic
 * corpus-curation shape — "keep documents not beaten on BOTH length and
 * quality" — and a sibling of the top-k family: top-k bounds one axis,
 * the skyline bounds the trade-off curve.
 *
 * Distributed shape: the textbook single-node algorithm is a sort +
 * running suffix-max sweep; a naive Spark port is `Window.orderBy(x)`
 * with no partition — the single-task funnel. Here the sweep is the
 * two-level scan ([[PrefixSum]]'s pattern with max): per-x max-y (one
 * hash agg — the only input-sized shuffle), per-bucket local suffix
 * max + a suffix max over the small bucket table, then one equi-join
 * back on x. A row survives iff y == maxY(x) AND maxY(x) > suffix-max
 * over all strictly-larger x. Ties on both axes survive together
 * (neither strictly dominates).
 */
object Skyline {

  /** Frontier rows of `df` (maximizing `xCol`, `yCol`; both
    * non-negative integral). Keeps every input column. */
  def frontier2(df: DataFrame, xCol: String, yCol: String,
                bucketShift: Int = 8): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 63, "bucketShift in [0,63)")
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("_my"))
      .withColumn("_bkt", shiftright(col(xCol), bucketShift))
    // strictly-larger-x suffix max, level 1: within bucket (desc order,
    // rows before = larger x; bounded by 2^shift distinct x per bucket)
    val wLoc = Window.partitionBy("_bkt").orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = perX.withColumn("_sufLoc", max(col("_my")).over(wLoc))
    // level 2: suffix max over the small bucket table
    val wB = Window.orderBy(col("_bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = perX.groupBy("_bkt").agg(max(col("_my")).as("_bmax"))
      .withColumn("_sufB", max(col("_bmax")).over(wB))
      .select("_bkt", "_sufB")
    val keep = local.join(broadcast(buckets), Seq("_bkt"))
      .withColumn("_suf",
        greatest(coalesce(col("_sufLoc"), lit(Long.MinValue)),
          coalesce(col("_sufB"), lit(Long.MinValue))))
      .filter(col("_my") > col("_suf"))
      .select(col(xCol), col("_my"))
    df.join(keep, Seq(xCol))
      .filter(col(yCol) === col("_my"))
      .drop("_my")
  }
}
