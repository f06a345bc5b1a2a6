package graft

import graft.grid.LineRaster
import org.apache.spark.sql.functions.col

class LineRasterSpec extends SparkSpec {
  import spark.implicits._

  private def ref(segs: Seq[(Long, Long, Long, Long)])
      : Map[(Long, Long), Long] = {
    val cells = segs.flatMap { case (x0, y0, x1, y1) =>
      val n = math.max(math.abs(x1 - x0), math.abs(y1 - y0))
      (0L to n).map { k =>
        if (n == 0) (x0, y0)
        else (x0 + Math.floorDiv(2 * k * (x1 - x0) + n, 2 * n),
          y0 + Math.floorDiv(2 * k * (y1 - y0) + n, 2 * n))
      }
    }
    cells.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(segs: Seq[(Long, Long, Long, Long)])
      : Map[(Long, Long), Long] =
    LineRaster.density(segs.toDF("x0", "y0", "x1", "y1")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("density == scalar walker on axis, diagonal, steep, and reversed segments") {
    val segs = Seq(
      (0L, 0L, 5L, 0L), (5L, 0L, 0L, 0L), // axis both directions
      (0L, 0L, 4L, 4L), (4L, 4L, 0L, 0L), // diagonal both directions
      (0L, 0L, 7L, 3L), (7L, 3L, 0L, 0L), // shallow
      (2L, -3L, 3L, 6L), // steep crossing zero
      (1L, 1L, 1L, 1L)) // degenerate point
    assert(run(segs) == ref(segs))
  }

  test("each segment visits max(|dx|,|dy|)+1 cells, all distinct") {
    val seg = Seq((0L, 0L, 9L, 4L))
    val got = run(seg)
    assert(got.values.sum == 10L)
    assert(got.values.forall(_ == 1L))
  }

  test("overlapping segments accumulate counts") {
    val got = run(Seq((0L, 0L, 3L, 0L), (3L, 0L, 0L, 0L), (1L, 0L, 1L, 0L)))
    // forward+reverse pass over y=0 x=0..3 twice, plus the point at x=1
    assert(got == Map((0L, 0L) -> 2L, (1L, 0L) -> 3L, (2L, 0L) -> 2L,
      (3L, 0L) -> 2L))
  }

  test("invariant under segment partitioning") {
    val segs = (0L until 50L).map(i => (i % 7, i % 5, (i * 3) % 11, (i * 5) % 9))
    val df = segs.toDF("x0", "y0", "x1", "y1")
    val a = LineRaster.density(df.repartition(1))
      .orderBy(col("gx"), col("gy")).collect().map(_.toSeq).toSeq
    val b = LineRaster.density(df.repartition(9, col("x1")))
      .orderBy(col("gx"), col("gy")).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(run(segs) == ref(segs))
  }
}
