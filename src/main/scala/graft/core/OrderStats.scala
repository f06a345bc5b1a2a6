package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * EXACT global order statistics (k-th smallest / discrete quantiles)
 * without a global sort — the exact counterpart of the mergeable KLL
 * sketch (`graft.sketch`): where KLL trades error for one pass, this
 * pays one histogram aggregate and answers exactly.
 *
 * Algorithm: value-count histogram (one hash agg — the shuffle is
 * bounded by the number of DISTINCT values, not rows) → exclusive
 * prefix sum over the value order via the two-level [[PrefixSum]]
 * (never a single-task global window) → each requested rank k selects
 * the unique value with prefix < k <= prefix + count. The rank probe
 * broadcasts the |ks|-row rank table against one pass of the histogram
 * (a non-equi broadcast join over #distinct-values x |ks| — both
 * factors bounded; for a quality score or token count the value space
 * is thousands, not the corpus).
 *
 * Convention: k is 1-based; quantile p maps to k = min(floor(p*n)+1, n)
 * — for p=0.5 and even n this is the UPPER middle, the same
 * `sorted[n/2]` convention as the reference's median
 * (align3d.cpp:87, [[graft.grid.Gridding.medianGrid]]).
 */
object OrderStats {

  /** (k, v): the k-th smallest value of `valueCol` for each 1-based
    * rank in `ks` (each k must be in [1, n]). */
  def kth(df: DataFrame, valueCol: String, ks: Seq[Long],
          bucketShift: Int = 4): DataFrame = {
    val cnt = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
    kthFromHistogram(cnt, ks, bucketShift)
  }

  /** [[kth]] over an already-built (v, c) value-count histogram. */
  private def kthFromHistogram(cnt: DataFrame, ks: Seq[Long],
                               bucketShift: Int): DataFrame = {
    require(ks.nonEmpty, "need at least one rank")
    val spark = cnt.sparkSession
    import spark.implicits._
    val pre = PrefixSum.exclusive(cnt, "v", "c",
      shiftright(col("v"), bucketShift))
    pre.join(broadcast(ks.toDF("k")),
        col("prefix") < col("k") && col("k") <= col("prefix") + col("c"))
      .select(col("k"), col("v"))
  }

  /** (p, k, v): exact discrete quantiles for each p in `ps`. n comes
    * from ONE aggregate over the materialized value-count histogram (a
    * single driver long — the same discipline as the strata/offset
    * collects), so the input lineage — which may be an expensive
    * derivation like per-doc tokenization — is computed exactly once:
    * the histogram is localCheckpoint'ed and both the sizing aggregate
    * and the rank probe read the materialized blocks. */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                bucketShift: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cnt = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val n = cnt.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    require(n > 0, "quantiles of an empty table")
    val ks = ps.map(p => math.min(math.floor(p * n).toLong + 1, n))
    val pk = broadcast(ps.zip(ks).toDF("p", "k"))
    kthFromHistogram(cnt, ks.distinct, bucketShift)
      .join(pk, "k")
      .select(col("p"), col("k"), col("v"))
  }

  /** Per-key exact upper median (`sorted[n/2]`, the same k = n div 2 + 1
    * convention as [[quantiles]] at p = 0.5): value-count histogram per
    * (key, value) — the shuffle is bounded by keys × distinct values —
    * then a per-key window over the DISTINCT-VALUE rows only (a key
    * with 10^9 rows over a 10^4-value space costs a 10^4-row scan, not
    * a 10^9-row sort) selects the value whose cumulative count first
    * reaches the rank. Returns (key, median). */
  def upperMedianByKey(df: DataFrame, keyCol: String,
                       valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("_c"))
    val n = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(keyCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("_cum", sum(col("_c")).over(w))
      .join(n, keyCol)
      .withColumn("_k", expr("_n div 2 + 1"))
      .filter(col("_cum") - col("_c") < col("_k") &&
        col("_k") <= col("_cum"))
      .select(col(keyCol), col(valCol).as("median"))
  }
}
