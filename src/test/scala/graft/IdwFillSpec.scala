package graft

import graft.grid.IdwFill
import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.functions._

class IdwFillSpec extends SparkSpec {
  import spark.implicits._

  private def ref(cells: Map[(Long, Long), Long], w: Int, h: Int,
                  r: Int, scale: Long = 1L << 20)
      : Map[(Long, Long), (Long, Long)] =
    (for {
      gx <- 0L until w; gy <- 0L until h
      if !cells.contains((gx, gy))
      nbrs = for {
        dx <- -r to r; dy <- -r to r if dx != 0 || dy != 0
        v <- cells.get((gx - dx, gy - dy))
      } yield (v, scale / (dx.toLong * dx + dy.toLong * dy))
      if nbrs.nonEmpty
    } yield {
      val num = nbrs.map { case (v, wt) => v * wt }.sum
      val den = nbrs.map(_._2).sum
      (gx, gy) -> (num / den, nbrs.size.toLong)
    }).toMap

  private def run(cells: Map[(Long, Long), Long], w: Int, h: Int, r: Int,
                  parts: Int = 1) =
    IdwFill.fill(
        cells.toSeq.map { case ((x, y), v) => (x, y, v) }
          .toDF("gx", "gy", "v").repartition(parts),
        Bounds(w, h), r)
      .collect()
      .map(rr => (rr.getLong(0), rr.getLong(1)) ->
        (rr.getLong(2), rr.getLong(3)))
      .toMap

  test("matches the scalar gather on a sparse grid, radii 1..3") {
    val cells = Map((0L, 0L) -> 100L, (3L, 0L) -> 400L, (0L, 3L) -> 800L,
      (5L, 5L) -> 1000L, (9L, 9L) -> 50L)
    for (r <- 1 to 3) {
      assert(run(cells, 10, 10, r) === ref(cells, 10, 10, r), s"r=$r")
    }
  }

  test("distance weighting: nearer source dominates") {
    val cells = Map((0L, 5L) -> 0L, (4L, 5L) -> 1000L)
    val got = run(cells, 6, 11, 3)
    // (1,5): d=1 to the 0-source, d=3 to the 1000-source
    val (v, n) = got((1L, 5L))
    assert(n === 2L)
    assert(v < 500L, s"near-zero source must dominate, got $v")
    val (v3, _) = got((3L, 5L))
    assert(v3 > 500L, s"near-1000 source must dominate, got $v3")
  }

  test("occupied cells never fill; out-of-bounds never receives") {
    val cells = Map((0L, 0L) -> 7L)
    val got = run(cells, 2, 2, 3)
    assert(!got.contains((0L, 0L)))
    assert(got.keySet === Set((0L, 1L), (1L, 0L), (1L, 1L)))
  }

  test("partitioning invariance") {
    val cells = (for (i <- 0L until 40L)
      yield ((i * 13) % 17, (i * 7) % 11) -> (i * 31 % 997)).toMap
    assert(run(cells, 17, 11, 2, parts = 1) ===
      run(cells, 17, 11, 2, parts = 9))
  }

  test("plan: splat + one hash agg, no broadcast nested loop") {
    val df = (0L until 50L).map(i => (i % 10, i / 10, i)).toDF("gx", "gy", "v")
    val plan = IdwFill.fill(df, Bounds(10, 5), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
