package graft

import graft.grid.Viewshed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dense scalar oracle for the exact viewshed: a brute-force walker
  * over a synthetic terrain, using the same rounded-parametric ray and
  * exact cross-multiplied tangent comparison in plain Long arithmetic.
  * Independently written (Math.floorDiv vs the engine's pmod trick). */
class ViewshedSpec extends SparkSpec {
  import spark.implicits._

  private val W = 24
  private val H = 14

  /** Deterministic rolling terrain with two ridges and a peak. */
  private def elev(x: Long, y: Long): Long =
    1000 + 137 * ((x * 31 + y * 17) % 23) +
      (if (x == 9) 4000 else 0) + // north-south wall at x=9
      (if (y == 7 && x >= 12) 3500 else 0) + // east half wall at y=7
      (if (x == 17 && y == 3) 9000 else 0) // lone peak

  private def cells(drop: Set[(Long, Long)] = Set.empty): Seq[(Long, Long, Long)] =
    for {
      x <- 0L until W; y <- 0L until H
      if !drop.contains((x, y))
    } yield (x, y, elev(x, y))

  private def toDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("gx", "gy", "v")

  /** Scalar reference: visible(t) = no intermediate on the ray blocks. */
  private def refViewshed(rows: Seq[(Long, Long, Long)], ox: Long, oy: Long,
                          vo: Long): Map[(Long, Long), Boolean] = {
    val grid = rows.map { case (x, y, v) => (x, y) -> v }.toMap
    def blocks(tx: Long, ty: Long, vt: Long): Boolean = {
      val dx = tx - ox; val dy = ty - oy
      val n = math.max(math.abs(dx), math.abs(dy))
      val ht = dx * dx + dy * dy
      (1L until n).exists { k =>
        val px = ox + Math.floorDiv(2 * k * dx + n, 2 * n)
        val py = oy + Math.floorDiv(2 * k * dy + n, 2 * n)
        grid.get((px, py)).exists { bv =>
          val a = bv - vo; val b = vt - vo
          val hi = (px - ox) * (px - ox) + (py - oy) * (py - oy)
          if (a >= 0 && b < 0) true
          else if (a < 0 && b >= 0) false
          else if (a >= 0) a * a * ht >= b * b * hi
          else a * a * ht <= b * b * hi
        }
      }
    }
    rows.map { case (x, y, v) => (x, y) -> !blocks(x, y, v) }.toMap
  }

  private def run(df: DataFrame, ox: Long, oy: Long, vo: Long)
      : Map[(Long, Long), Boolean] = {
    val obs = Seq((ox, oy, vo)).toDF("ox", "oy", "vo")
    Viewshed.viewshed(df, obs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3))
      .toMap
  }

  test("viewshed == scalar walker on the full terrain") {
    val rows = cells()
    val ox = 2L; val oy = 2L
    val vo = elev(ox, oy) + 800
    val got = run(toDf(rows), ox, oy, vo)
    val want = refViewshed(rows, ox, oy, vo)
    assert(got.size === rows.size)
    assert(got === want)
    // the walls must actually hide something and the foreground must show
    assert(got.values.count(identity) > 10)
    assert(got.values.count(!_) > 10)
  }

  test("observer cell and all 8 neighbors are always visible") {
    val rows = cells()
    val got = run(toDf(rows), 11L, 6L, elev(11, 6))
    for (dx <- -1L to 1L; dy <- -1L to 1L)
      assert(got((11 + dx, 6 + dy)), s"neighbor ($dx,$dy)")
  }

  test("void cells on the ray do not block") {
    // drop the entire wall column x=9 between observer and target row
    val drop = (0L until H).map(y => (9L, y)).toSet
    val rows = cells(drop)
    val ox = 2L; val oy = 6L; val vo = elev(ox, oy) + 5000
    val got = run(toDf(rows), ox, oy, vo)
    val want = refViewshed(rows, ox, oy, vo)
    assert(got === want)
    // with the wall gone, more cells EAST of it are visible
    val withWall = run(toDf(cells()), ox, oy, vo)
    def eastVisible(m: Map[(Long, Long), Boolean]) =
      m.count { case ((x, _), vis) => x > 9 && vis }
    assert(eastVisible(got) > eastVisible(withWall))
  }

  test("tall wall hides the cells straight behind it") {
    val got = run(toDf(cells()), 2L, 6L, elev(2, 6) + 800)
    // cells due east of the x=9 wall on the same row are hidden
    assert(!got((15L, 6L)))
    assert(!got((20L, 6L)))
  }

  test("result invariant under input partitioning") {
    val rows = cells()
    val df1 = toDf(rows).repartition(1)
    val df7 = toDf(rows).repartition(7, col("gy"))
    val obs = Seq((5L, 5L, elev(5, 5) + 500)).toDF("ox", "oy", "vo")
    val a = Viewshed.viewshed(df1, obs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    val b = Viewshed.viewshed(df7, obs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(a === b)
  }

  test("fromLowest picks the min (v, gx, gy) cell as observer") {
    val rows = Seq((0L, 0L, 50L), (0L, 1L, 10L), (1L, 0L, 10L), (1L, 1L, 60L))
    // two cells tie at v=10; (0,1) wins on (gx, gy)
    val out = Viewshed.fromLowest(toDf(rows), 5L)
    // replicate: observer (0,1) vo=15; everything here is n<=1 -> visible
    val got = out.collect().map(r => r.getBoolean(3))
    assert(got.forall(identity))
    val want = refViewshed(rows, 0L, 1L, 15L)
    assert(want.values.forall(identity))
  }
}
