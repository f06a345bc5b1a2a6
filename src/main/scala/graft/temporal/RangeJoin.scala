package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded range (interval) join: pair every probe row with the build rows
 * of the same key whose time falls in `[probe.ts + lo, probe.ts + hi]` —
 * "purchases within the hour before each click", "captures within a day
 * of the outage".
 *
 * Spark plans a raw `p.ts BETWEEN b.ts + lo AND b.ts + hi` predicate
 * (even with an equi-key alongside) as a join that filters the full
 * per-key cross product — O(|P| x |B|) per key. This implementation is
 * the standard bucketized band join: time is quantized into buckets of
 * width `hi - lo`, each probe row expands to the (at most TWO) buckets
 * its window can touch, and the join becomes a plain hash equi-join on
 * (key, bucket) followed by the exact range filter. Cost is
 * O(|P| + |B| + |matches|) with one hash shuffle — the only blowup is
 * the 2x probe expansion, independent of data size, and AQE handles a
 * skewed (key, bucket) like any other hot hash key.
 *
 * The window is closed on both ends; `lo <= hi` is required. Build rows
 * pair with EVERY matching probe (inner semantics) — aggregate after the
 * join for per-probe counts/stats.
 */
object RangeJoin {

  /**
   * @param probe left side with `keys` and numeric time column `ts`
   * @param build right side with `keys` and numeric time column `ts`;
   *              its `ts` is emitted as `<ts>_build`
   * @param lo,hi window offsets relative to the probe time (e.g.
   *              lo = -3600, hi = 0 for "the hour before")
   */
  def joinRange(
      probe: DataFrame, build: DataFrame,
      keys: Seq[String], ts: String, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"empty window: lo=$lo > hi=$hi")
    val w = math.max(hi - lo, 1e-9)
    val buildTs = s"${ts}_build"

    val b = build.withColumnRenamed(ts, buildTs)
      .withColumn("_bucket", floor(col(buildTs) / w))
    // the window [t+lo, t+hi] spans exactly width w, so it intersects
    // bucket(t+lo) and (when not aligned) the one after it
    val p = probe
      .withColumn("_b0", floor((col(ts) + lo) / w))
      .withColumn("_b1", floor((col(ts) + hi) / w))
      .withColumn("_bucket", explode(when(col("_b0") === col("_b1"),
        array(col("_b0"))).otherwise(array(col("_b0"), col("_b1")))))
      .drop("_b0", "_b1")

    p.join(b, keys :+ "_bucket")
      .filter(col(buildTs) >= col(ts) + lo && col(buildTs) <= col(ts) + hi)
      .drop("_bucket")
  }
}
