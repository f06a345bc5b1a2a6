package graft

import graft.text.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  private def refChunks(text: String, size: Int,
                        stride: Int): Seq[(Int, Long, Long, String)] = {
    val toks = text.split(" ", -1)
    val n = toks.length.toLong
    val kMax = math.max(0L, math.min((n - 1) / stride,
      // ceil((n - size) / stride) via floor((n - size + stride - 1) / s),
      // floored toward -inf like both engines
      Math.floorDiv(n - size + stride - 1, stride)))
    (0L to kMax).map { k =>
      val start = k * stride
      val len = math.min(size.toLong, n - start)
      (k.toInt, start, len,
        toks.slice(start.toInt, (start + len).toInt).mkString(" "))
    }
  }

  private val texts = Seq(
    "a b c d e f g h i j",          // 10 tokens
    "one two three",                 // shorter than most windows
    "x",                             // single token
    "",                              // split keeps one empty token
    (1 to 23).map(i => s"t$i").mkString(" "))

  private def docsDf = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("slidingChunks == scalar reference across stride regimes") {
    for ((size, stride) <- Seq((4, 3), (4, 4), (2, 5), (40, 30), (1, 3),
      (3, 1))) {
      val got = Chunking.slidingChunks(docsDf, size, stride)
        .select("doc_id", "chunk_idx", "tok_start", "n_toks", "chunk_text")
        .orderBy("doc_id", "chunk_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSeq
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        refChunks(t, size, stride).map { case (k, s, l, c) =>
          (i.toLong, k, s, l, c)
        }
      }
      assert(got == want, s"size=$size stride=$stride")
    }
  }

  test("tail coverage when stride <= size; no empty or duplicate-suffix chunks") {
    val got = Chunking.slidingChunks(docsDf, 4, 3)
      .groupBy("doc_id")
      .agg(max(col("tok_start") + col("n_toks")).as("covered"),
        min("n_toks").as("minLen"))
      .join(docsDf.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n")), "doc_id")
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("covered") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("minLen") >= 1L)
    }
  }

  test("chunking plan is map-only (no Exchange)") {
    val plan = Chunking.slidingChunks(docsDf, 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
