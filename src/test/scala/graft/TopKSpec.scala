package graft

import graft.sketch.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private def data(seed: Int, n: Int, groups: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (s"g${i % groups}", i.toLong, rnd.nextInt(50).toLong))
  }

  private def brute(rows: Seq[(String, Long, Long)], k: Int) =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (i, s) => (-s, i) }.take(k)
    }

  private def run(rows: Seq[(String, Long, Long)], k: Int, parts: Int) = {
    import spark.implicits._
    rows.toDF("g", "item", "score").repartition(parts)
      .groupBy("g").agg(TopK.topK(col("item"), col("score"), k).as("t"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1))).toSeq).toMap
  }

  test("matches the sort-based reference; ties resolved by item asc") {
    // scores in [0,50) over 3000 rows -> heavy ties, the tie-break works
    val rows = data(5, 3000, 7)
    assert(run(rows, 10, 32) == brute(rows, 10))
  }

  test("invariant to partitioning (merge path is exact)") {
    val rows = data(9, 2000, 4)
    assert(run(rows, 5, 1) == run(rows, 5, 37))
  }

  test("k >= group size returns the whole group, sorted") {
    val rows = data(3, 40, 8) // ~5 rows per group
    assert(run(rows, 100, 16) == brute(rows, 100))
  }

  test("plan: object-hash aggregate with a map-side partial, no sort") {
    import spark.implicits._
    val df = data(1, 500, 5).toDF("g", "item", "score").repartition(8)
      .groupBy("g").agg(TopK.topK(col("item"), col("score"), 3).as("t"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), "topk agg not object-hash")
    assert(p.contains("partial_graft_topk"), "no map-side partial")
    assert(!p.contains("SortAggregate") && !p.contains("Window"),
      "topk must not fall back to sort/window")
  }
}
