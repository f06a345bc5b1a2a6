package graft

import graft.core.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Long, Long)], shift: Int = 3,
                  parts: Int = 1): Set[Long] =
    Skyline.frontier2(
      pts.toDF("id", "x", "y").repartition(parts), "x", "y", shift)
      .select("id").as[Long].collect().toSet

  test("random point sets equal the dominance definition across shifts") {
    val pts = (0L until 400L).map(i =>
      (i, (i * 131) % 97, (i * 257) % 89))
    for (shift <- Seq(0, 2, 5, 20)) {
      assert(run(pts, shift) === brute(pts), s"shift=$shift")
    }
  }

  test("ties on both axes survive together; same-x lower-y is cut") {
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 10L, 9L),
      (4L, 9L, 11L), (5L, 9L, 10L))
    val got = run(pts)
    assert(got === Set(1L, 2L, 4L))
    assert(got === brute(pts))
  }

  test("a single dominator collapses the frontier to itself") {
    val pts = (0L until 50L).map(i => (i, i % 7, i % 5)) :+ (99L, 100L, 100L)
    assert(run(pts) === Set(99L))
  }

  test("anti-chain: strictly decreasing y over increasing x keeps all") {
    val pts = (0L until 64L).map(i => (i, i, 63L - i))
    assert(run(pts, shift = 2) === pts.map(_._1).toSet)
  }

  test("partitioning invariance") {
    val pts = (0L until 300L).map(i => (i, (i * 17) % 41, (i * 23) % 37))
    assert(run(pts, 2, parts = 1) === run(pts, 2, parts = 11))
  }

  test("plan: only the small bucket table crosses a single partition") {
    val df = spark.range(1000).select(col("id"),
      (col("id") * 131 % 97).as("x"), (col("id") * 257 % 89).as("y"))
    val plan = Skyline.frontier2(df, "x", "y", 3)
      .queryExecution.executedPlan.toString
    // the level-2 suffix max runs over ~97/8 bucket rows; the level-1
    // window must be hash-partitioned by bucket
    assert(plan.contains("hashpartitioning(_bkt"), plan)
  }
}
