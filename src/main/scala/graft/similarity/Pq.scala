package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization — the compressed-domain ANN path (the third
 * member of the similarity family next to [[Ann.ivfTopK]] (partition
 * pruning) and [[Ann.lshTopK]] (candidate pruning)).
 *
 * Dim `D` splits into `m` subspaces of width `w = D / m`; per subspace a
 * tiny codebook (`ncode` centroids of width w) is trained by
 * deterministic Lloyd rounds on a BOUNDED sample (driver-side — PQ
 * codebooks train on samples by design, the corpus never participates);
 * every corpus vector then encodes to `m` small ints picked by a
 * row-local argmin against the broadcast-literal codebooks — no join,
 * no shuffle, the same "centroids are kilobytes, bake them into the
 * projection" shape as [[Ann.assignToCentroids]].
 *
 * Query scoring is ADC (asymmetric distance computation): per query a
 * `m x ncode` lookup table of partial dot products is computed
 * driver-side, and the corpus scan folds `lut[s][code_s]` across
 * subspaces — at 10^12 vectors the scan reads m bytes per vector
 * instead of 4·D (32x compression at D=64, m=8) and stays a
 * broadcast-LUT map with one final top-k rank.
 *
 * Everything is deterministic arithmetic (ascending-index folds,
 * (dist asc, code asc) argmin tie-break), so encode + ADC are bit-exact
 * reproducible — q_pq_topk's DuckDB dual replays both from the staged
 * codebook table.
 */
object Pq {

  /** cents(s)(c) = centroid c of subspace s, width w. */
  final case class Codebooks(m: Int, w: Int, ncode: Int,
                             cents: Array[Array[Array[Double]]])

  /** Ascending-index fold of (x-c)^2 — the one distance expression,
    * shared by training, encode, and the SQL dual. */
  private def sqDist(x: Array[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { val d = x(off + i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic per-subspace k-means on `sample` (MUST be in
    * ascending vec_id order — the caller's sample defines the init and
    * the mean fold order). Init = subvectors of the first `ncode`
    * sample vectors; `iters` Lloyd rounds; assignment tie-break prefers
    * the smaller code; an emptied cluster keeps its previous centroid. */
  def train(sample: Array[Array[Double]], m: Int, ncode: Int,
            iters: Int = 2): Codebooks = {
    require(sample.length >= ncode, s"sample ${sample.length} < ncode $ncode")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val w = dim / m
    val cents = Array.tabulate(m, ncode) { (s, c) =>
      java.util.Arrays.copyOfRange(sample(c), s * w, (s + 1) * w)
    }
    for (_ <- 0 until iters; s <- 0 until m) {
      val sums = Array.fill(ncode, w)(0.0)
      val ns = Array.fill(ncode)(0L)
      sample.foreach { v => // ascending vec_id order = deterministic sum
        var best = 0
        var bestD = sqDist(v, s * w, cents(s)(0))
        var c = 1
        while (c < ncode) {
          val d = sqDist(v, s * w, cents(s)(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < w) { sums(best)(i) += v(s * w + i); i += 1 }
        ns(best) += 1
      }
      for (c <- 0 until ncode if ns(c) > 0; i <- 0 until w)
        cents(s)(c)(i) = sums(c)(i) / ns(c)
    }
    Codebooks(m, w, ncode, cents)
  }

  /** Codebooks as a DataFrame (s, code, cv) — the staged side-table the
    * SQL dual replays encode/ADC from. */
  def codebookDf(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until cb.m; c <- 0 until cb.ncode)
      yield (s, c, cb.cents(s)(c).toSeq)).toDF("s", "code", "cv")
  }

  /** Row-local PQ encode: corpus (vec_id, v) -> (vec_id, codes) with
    * `codes(s)` = argmin_code sqDist(v[sub s], cent), ties to the
    * smaller code. One codegen'd [[PqEncodeExpr]] carrying the flattened
    * codebook as a reference object — zero shuffles, and the expression
    * tree stays O(1) regardless of m x ncode (the composed
    * aggregate/least form built 512 higher-order folds at m=16/ncode=32
    * and its analysis alone dominated the query). */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame =
    corpus.select(col("vec_id"), PqEncode(col("v"), cb).as("codes"))

  /** ADC lookup table for one query vector: lut(s)(c) = ascending-index
    * dot of the query subvector with centroid c of subspace s. */
  def lut(qv: Array[Double], cb: Codebooks): Array[Array[Double]] =
    Array.tabulate(cb.m, cb.ncode) { (s, c) =>
      var acc = 0.0
      var i = 0
      while (i < cb.w) { acc += qv(s * cb.w + i) * cb.cents(s)(c)(i); i += 1 }
      acc
    }

  /** IVF-PQ: the two scale layers composed — the IVF coarse quantizer
    * prunes the corpus to the query's nProbe lists (touching
    * nProbe/nList of the rows), and within the probed lists scoring
    * reads only the m-code PQ columns via the ADC LUT fold (m bytes per
    * vector instead of 4·D). This is the standard billion-vector ANN
    * architecture; codes here quantize the raw vectors (not residuals —
    * documented trade: residual encoding needs a per-list re-centering
    * pass and buys accuracy at the same cost shape). Deterministic
    * bit-for-bit: IVF build + probe are [[Ann.ivfIndex]]'s exact
    * arithmetic, encode + ADC are [[encode]]/[[lut]]'s. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, cb: Codebooks, k: Int,
                nList: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // pin once: the Lloyd loop scans the corpus 1 + iters times and the
    // PQ encode scans it again (same rationale as [[Ann.ivfTopK]])
    val c = corpus.localCheckpoint()
    val (centroids, assign) = Ann.ivfIndex(c, nList, iters)
    val qc = queries.crossJoin(broadcast(centroids))
      .withColumn("ccos", DotProduct(col("cv"), col("qv")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))
    val probes = qc.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe).select(col("qid"), col("cid"))
    val codes = encode(c, cb)
    val luts = queries.select(col("qid"), col("qv")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
      .map { case (qid, qv) => (qid, lut(qv.toArray, cb).map(_.toSeq).toSeq) }
      .toSeq.toDF("qid", "lut")
    val score = expr(
      "aggregate(zip_with(codes, lut, (c, row) -> element_at(row, c + 1)), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    probes.join(assign, Seq("cid")).join(codes, Seq("vec_id"))
      .join(broadcast(luts), Seq("qid"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rank"))
  }

  /** ADC top-k over an ENCODED corpus: queries (qid, qv) are collected
    * (they are the small side by contract), each becomes one LUT
    * literal, and the score is the ordered fold of lut[s][codes[s]] —
    * a per-row array lookup chain on the m-byte codes, never touching
    * the original vectors. Approximate by construction (quantization
    * error), deterministic bit-for-bit. */
  def adcTopK(queries: Seq[(Long, Array[Double])], encoded: DataFrame,
              cb: Codebooks, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val luts = queries.map { case (qid, qv) =>
      (qid, lut(qv, cb).map(_.toSeq).toSeq)
    }.toDF("qid", "lut")
    val score = expr(
      "aggregate(zip_with(codes, lut, (c, row) -> element_at(row, c + 1)), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    encoded.crossJoin(broadcast(luts))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rank"))
  }
}
