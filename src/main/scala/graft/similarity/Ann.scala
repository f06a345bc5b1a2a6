package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * - [[bruteForceTopK]] is the exact baseline: cross join + per-query
 *   window rank. The dot product is a codegen'd fold
 *   ([[DotProductExpr]], codegen'd, ascending index order) — bit-exact,
 *   matched by the DuckDB `list_reduce` dual.
 * - [[lshTopK]] is the scale path: random-hyperplane sign buckets; only
 *   same-bucket (or near-bucket) candidates are scored. Probabilistic
 *   recall, verified against brute force in the spec at controlled
 *   settings. At 100 TB the bucket join replaces the cross join; the
 *   final rank is identical machinery.
 */
object Ann {

  /** vec_id-chunk width of the deterministic centroid-mean fold. */
  final val MeanFoldChunk = 4096L

  private def dotExpr(a: String, b: String) =
    DotProduct(col(a), col(b))

  /** Cast float embedding to double once. */
  def withVec(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df.withColumn("v", col(embCol).cast("array<double>"))

  /** Exact cosine top-k (embeddings are L2-normalized: cosine = dot).
    * queries: (qid, qv); corpus: (vec_id, v). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", dotExpr("qv", "v"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed integer-hash derived value in [-1, 1). */
  private def planeComponent(p: Int, i: Int): Double = {
    var h = p.toLong * 2654435761L + i.toLong * 40503L + 97L
    h ^= (h >>> 16); h *= 73244475L; h ^= (h >>> 16)
    ((h & 0xFFFFFL).toDouble / 524288.0) - 1.0
  }

  /** Sign-LSH bucket ids: `nTables` independent tables, each hashing the
    * vector by the signs of `nPlanes` fixed hyperplanes. Emits one row
    * per (row, table) with columns (table, bucket). */
  def signBuckets(df: DataFrame, dim: Int, nPlanes: Int, nTables: Int): DataFrame = {
    val tableBuckets = (0 until nTables).map { t =>
      val bits = (0 until nPlanes).map { p =>
        val planeArr = array(
          (0 until dim).map(i => lit(planeComponent(t * nPlanes + p, i))): _*)
        when(dotExprCols(col("v"), planeArr) > 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      struct(lit(t).as("table"), bits.reduce(_ + _).as("bucket"))
    }
    df.withColumn("tb", explode(array(tableBuckets: _*)))
      .withColumn("table", col("tb.table"))
      .withColumn("bucket", col("tb.bucket"))
      .drop("tb")
  }

  private def dotExprCols(v: org.apache.spark.sql.Column, plane: org.apache.spark.sql.Column) =
    DotProduct(v, plane)

  /** Row-local nearest-centroid assignment: the centroid list (nList x
    * dim doubles — driver-held, kilobytes) is baked into ONE projection
    * that scores every centroid and takes the argmax via `greatest` over
    * (cos, -cid) structs — ties prefer the smaller cid, matching the
    * (cos desc, cid asc) rank order. Zero shuffles, zero windows: the
    * per-row argmax of a handful of scores is arithmetic, not a join. */
  def assignToCentroids(corpus: DataFrame,
                        cents: Seq[(Int, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty)
    val scored = cents.map { case (cid, cv) =>
      struct(
        dotExprCols(col("v"), array(cv.map(lit): _*)).as("cos"),
        lit(-cid).as("negCid"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    corpus.withColumn("best", best)
      .select(col("vec_id"), (-col("best.negCid")).as("cid"), col("v"))
  }

  /** IVF coarse quantizer: deterministic k-means (init = first nList
    * corpus vectors by vec_id, a fixed number of Lloyd iterations).
    * Returns (centroids(cid, cv), assignments(vec_id, cid)). The
    * centroid set is tiny (nList x dim), so each Lloyd iteration holds
    * it on the driver and assigns via the shuffle-free row-local argmax
    * ([[assignToCentroids]]); the only shuffle per iteration is the
    * centroid-mean aggregate (map-side combined, nList*dim groups). At
    * 100 TB the assignment table is the partition key: probing touches
    * nProbe/nList of the corpus. */
  def ivfIndex(corpus: DataFrame, nList: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[(Int, Seq[Double])] =
      corpus.orderBy(col("vec_id")).limit(nList)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
        .as[(Int, Seq[Double])].collect().toSeq
    var assignments: DataFrame = null
    for (it <- 0 until iters) {
      // assignment is a map-only projection over the corpus: only the
      // FINAL iteration's table is consumed twice (mean fold + caller),
      // so only that one is pinned — a checkpoint on a non-final
      // assignment (single consumer) is a pure extra materialize pass
      assignments = assignToCentroids(corpus, cents)
      if (it == iters - 1) assignments = assignments.localCheckpoint()
      // new centroid = normalized mean of its members. The per-dimension
      // sum is a TWO-LEVEL deterministic fold (not a plain double `sum`,
      // whose result depends on partial-aggregation order): members fold
      // in ascending vec_id order inside fixed vec_id-chunks, then the
      // chunk sums fold in chunk order — bit-reproducible (matches
      // q_ann_ivf's DuckDB dual exactly) AND bounded: no group ever
      // collects more than MeanFoldChunk values, so a hot IVF cell at
      // corpus scale can't blow up one aggregation buffer.
      val sums = assignments
        .select(col("cid"), col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("chunk", expr(s"vec_id div $MeanFoldChunk"))
        .groupBy("cid", "pos", "chunk")
        .agg(expr("aggregate(transform(array_sort(collect_list(struct(vec_id, x)))," +
            " e -> e.x), CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("cs"),
          count(lit(1)).as("cn"))
        .groupBy("cid", "pos")
        .agg(expr("aggregate(transform(array_sort(collect_list(struct(chunk, cs)))," +
            " e -> e.cs), CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("s"),
          sum("cn").as("n"))
      cents = sums.groupBy("cid")
        .agg(expr("array_sort(collect_list(struct(pos, s / n AS m)))").as("arr"))
        .select(col("cid"), expr("transform(arr, e -> e.m)").as("raw"))
        .withColumn("norm", sqrt(dotExpr("raw", "raw")))
        .select(col("cid"), expr("transform(raw, x -> x / norm)").as("cv"))
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    val centroidsDf = cents.toDF("cid", "cv")
    (centroidsDf, assignments.select("vec_id", "cid"))
  }

  /** IVF approximate top-k: score only corpus vectors assigned to the
    * query's nProbe nearest centroid lists. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nList: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val (centroids, assign) = ivfIndex(corpus, nList, iters)
    val qc = queries.crossJoin(broadcast(centroids))
      .withColumn("ccos", dotExpr("cv", "qv"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))
    val probes = qc.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe).select(col("qid"), col("qv"), col("cid"))
    val cand = probes.join(assign, Seq("cid")).join(corpus, Seq("vec_id"))
      .withColumn("cos", dotExpr("qv", "v"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Multi-table LSH approximate top-k: candidates = corpus vectors
    * sharing any table's bucket with the query; exact cosine + rank on
    * the candidate set only. Recall grows with nTables
    * (1 - (1 - p^nPlanes)^nTables); the cross join is replaced by a
    * bucket equi-join, which is the 100 TB path. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8, nTables: Int = 8): DataFrame = {
    val qb = signBuckets(queries.withColumnRenamed("qv", "v"), dim, nPlanes, nTables)
      .select(col("qid"), col("v").as("qv"), col("table"), col("bucket"))
    val cb = signBuckets(corpus, dim, nPlanes, nTables)
    val cand = cb.join(broadcast(qb), Seq("table", "bucket"))
      .select(col("qid"), col("qv"), col("vec_id"), col("v"))
      .distinct() // a pair may collide in several tables
      .withColumn("cos", dotExpr("qv", "v"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }
}
