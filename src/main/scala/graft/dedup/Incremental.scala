package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.BinaryType

/**
 * Incremental (snapshot-resumable) dedup: the rows of a new `batch`
 * whose key was NOT seen in a previously-committed corpus. Semantically
 * a plain left-anti join — the bloom filter is a PRE-FILTER only, so
 * the result is bit-exact regardless of the filter's false-positive
 * rate (a bloom filter has no false negatives: `mightContain == false`
 * proves the key is new and skips the join entirely; `true` rows fall
 * through to the exact anti-join).
 *
 * This is the engine's resume path for the flagship url-dedup at
 * 10^12-document scale: each micro-batch probes the broadcast bloom of
 * the committed snapshot and only the (dupes + fpp * batch) candidate
 * fraction shuffles into the anti-join, instead of the whole batch
 * joining against the whole seen set.
 *
 * Built on Spark's own native bloom machinery (the same
 * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
 * the optimizer injects for runtime row-level filtering) — the probe is
 * codegen'd, no UDF. The bloom build is one scan of `seen` with
 * map-side partial merge.
 *
 * Scale notes: one global bloom of m bits serializes into the plan as a
 * binary literal; fpp ~= (1 - e^{-kn/m})^k with k = m/n ln 2 optimal.
 * The default 2^26 bits (8 MiB) holds ~4.7M keys at 1% fpp. Past
 * ~10^9 keys a single bloom saturates — shard by key-hash prefix and
 * probe per-shard blooms (the snapshot layer already partitions its
 * manifests by prefix), or raise `numBits` (values beyond the default
 * 2^26 also need `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
 * raised — BloomFilterAggregate validates against that conf).
 */
object Incremental {

  /** xxhash64 of the key column — the same 64-bit domain Spark's
    * runtime-filter bloom uses (`XxHash64`, seed 42). */
  private def keyHash(key: String): Column =
    Bridge.column(new XxHash64(Seq(Bridge.expression(col(key)))))

  /** Build the serialized bloom of `seen`'s key column (null iff `seen`
    * is empty — BloomFilterAggregate yields null for an empty group). */
  def buildBloom(seen: DataFrame, key: String,
                 estimatedItems: Long = 1000000L,
                 numBits: Long = 1L << 26): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(keyHash(key)),
      Literal(estimatedItems), Literal(numBits), 0, 0).toAggregateExpression()
    seen.select(Bridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Codegen'd probe of a serialized bloom against the key column. */
  def mightContain(bloom: Array[Byte], key: String): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(col(key))))))

  /**
   * Rows of `batch` whose `key` does not appear in `seen` — identical
   * to `batch.join(seen, key, "left_anti")`, with the bloom pruning the
   * anti-join's streamed side down to candidates. Duplicate keys WITHIN
   * the batch are all kept (anti-join semantics); compose with
   * `Dedup.dropDuplicatesKeepMin` for batch-internal dedup.
   */
  def newRows(batch: DataFrame, seen: DataFrame, key: String,
              estimatedItems: Long = 1000000L,
              numBits: Long = 1L << 26): DataFrame = {
    val bloom = buildBloom(seen, key, estimatedItems, numBits)
    if (bloom == null) batch // empty seen set: everything is new
    else {
      val probe = mightContain(bloom, key)
      val definite = batch.filter(!probe)
      val candidates = batch.filter(probe)
        .join(seen.select(col(key)).distinct(), Seq(key), "left_anti")
      definite.unionByName(candidates)
    }
  }
}
