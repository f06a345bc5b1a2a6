package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Semantic deduplication over an embedding column — the k-means-cluster
 * variant of near-dup pruning (SemDeDup, Abbas et al. 2023): cluster
 * the corpus with the deterministic IVF coarse quantizer
 * ([[Ann.ivfIndex]] — shuffle-free row-local assignment, two-level
 * bit-reproducible mean folds), then compare pairs ONLY inside each
 * cluster and drop every vector that has a semantic duplicate
 * (cosine >= tau) ranked before it. The keeper rule follows the paper:
 * within a duplicate pair the LOW-centroid-similarity exemplar survives
 * (it carries more information about the cluster's spread), with
 * vec_id as the deterministic tie-break.
 *
 * Scale shape (10^9+ vectors): the all-pairs comparison never happens —
 * it is confined to one cluster at a time, and clusters larger than
 * `maxCluster` are excluded from pairing entirely (kept + enumerable
 * via [[oversizedClusters]], the same audit contract as the capped LSH
 * buckets in graft.dedup). Choosing nList ~ N/expectedClusterSize keeps
 * the per-cluster quadratic term bounded by construction; the cluster
 * count table is nList rows (kilobytes, broadcast).
 */
object SemDedup {

  /** Per-member cluster view: (vec_id, cid, v, ccos) where ccos is the
    * member's cosine to its FINAL centroid (the exemplar-ranking key). */
  def memberView(corpus: DataFrame, nList: Int, iters: Int = 2): DataFrame = {
    val (cents, assign) = Ann.ivfIndex(corpus, nList, iters)
    assign.join(corpus, "vec_id")
      .join(broadcast(cents), "cid")
      .select(col("vec_id"), col("cid"), col("v"),
        DotProduct(col("v"), col("cv")).as("ccos"))
  }

  /** Clusters whose population exceeds `maxCluster` (excluded from
    * pairing; their members are all kept and the exclusion is
    * auditable). */
  def oversizedClusters(members: DataFrame, maxCluster: Long): DataFrame =
    members.groupBy("cid").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCluster)

  /** Semantic-dedup verdict for every corpus vector:
    * (vec_id, cid, ccos, kept INT). corpus: (vec_id, v) with v
    * `array<double>` L2-normalized ([[Ann.withVec]]). A vector is
    * dropped iff some same-cluster vector with (ccos, vec_id) strictly
    * smaller has cosine >= tau with it — so exactly one exemplar (the
    * lowest-ccos member) survives per transitive duplicate chain whose
    * links all exceed tau. */
  def semDedup(corpus: DataFrame, nList: Int, tau: Double, iters: Int = 2,
               maxCluster: Long = 1L << 16): DataFrame = {
    // pin: the member view feeds both sides of the pair join AND the
    // final output; recomputing the Lloyd chain 3x would be wasteful
    // and (worse) re-collect the centroid folds.
    val m = memberView(corpus, nList, iters).localCheckpoint()
    val okCids = m.groupBy("cid").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxCluster).select("cid") // <= nList rows
    val paired = m.join(broadcast(okCids), "cid")
    val a = paired.select(col("cid"), col("vec_id").as("a_id"),
      col("v").as("a_v"), col("ccos").as("a_ccos"))
    val b = paired.select(col("cid"), col("vec_id").as("b_id"),
      col("v").as("b_v"), col("ccos").as("b_ccos"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("a_ccos") < col("b_ccos") ||
        (col("a_ccos") === col("b_ccos") && col("a_id") < col("b_id")))
      .filter(DotProduct(col("a_v"), col("b_v")) >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    m.join(dropped.withColumn("_d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("ccos"),
        when(col("_d").isNull, lit(1)).otherwise(lit(0)).cast("int").as("kept"))
  }
}
