package graft

import graft.index.{Cells, Hilbert, HilbertFunctions}
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("order-1 and order-2 match the classic U-walk") {
    // order 1: (0,0)->(0,1)->(1,1)->(1,0)
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .map { case (x, y) => Hilbert.xy2d(1, x, y) } === Seq(0L, 1L, 2L, 3L))
    // order 2 starts (0,0)->(1,0)->(1,1)->(0,1)->(0,2)...
    assert(Hilbert.xy2d(2, 0, 0) === 0L)
    assert(Hilbert.xy2d(2, 1, 0) === 1L)
    assert(Hilbert.xy2d(2, 1, 1) === 2L)
    assert(Hilbert.xy2d(2, 0, 1) === 3L)
    assert(Hilbert.xy2d(2, 0, 2) === 4L)
  }

  test("xy2d and d2xy are inverse bijections (full order-4 grid)") {
    val res = 4
    val n = 1L << res
    val ds = for (x <- 0L until n; y <- 0L until n) yield Hilbert.xy2d(res, x, y)
    assert(ds.toSet === (0L until n * n).toSet, "must be a bijection")
    for (d <- 0L until n * n) {
      val (x, y) = Hilbert.d2xy(res, d)
      assert(Hilbert.xy2d(res, x, y) === d)
    }
  }

  test("THE Hilbert property: successive indices are 4-adjacent cells; Morton is not") {
    val res = 5
    val n = 1L << res
    for (d <- 0L until n * n - 1) {
      val (x1, y1) = Hilbert.d2xy(res, d)
      val (x2, y2) = Hilbert.d2xy(res, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"jump at d=$d")
    }
    // Morton jumps: count successive pairs more than 1 apart
    val mortonJumps = (0L until n * n - 1).count { m =>
      val (x1, y1) = (Cells.unspread16(m), Cells.unspread16(m >> 1))
      val (x2, y2) = (Cells.unspread16(m + 1), Cells.unspread16((m + 1) >> 1))
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "Morton should have locality jumps")
  }

  test("expression equals the scalar and stays in codegen") {
    val ranged = spark.range(1000).select(
      (col("id") % 32).as("cx"), expr("id div 32 % 32").as("cy"))
      .select(col("cx"), col("cy"),
        HilbertFunctions.hilbert(col("cx"), col("cy"), 5).as("h"))
    val got = ranged.collect()
    got.foreach { r =>
      assert(r.getLong(2) === Hilbert.xy2d(5, r.getLong(0), r.getLong(1)))
    }
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("range-scan locality: hilbert ranges touch tighter bboxes than morton") {
    // take a contiguous index range; the cells it decodes to should
    // span a smaller bbox under hilbert than under morton on average
    val res = 6
    def bboxArea(cells: Seq[(Long, Long)]): Long = {
      val xs = cells.map(_._1); val ys = cells.map(_._2)
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }
    val rngs = Seq((100L, 160L), (1000L, 1100L), (2000L, 2100L))
    val (hTot, mTot) = rngs.map { case (lo, hi) =>
      val h = bboxArea((lo to hi).map(Hilbert.d2xy(res, _)))
      val m = bboxArea((lo to hi).map(d =>
        (Cells.unspread16(d), Cells.unspread16(d >> 1))))
      (h, m)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(hTot <= mTot,
      s"hilbert bbox total $hTot should not exceed morton $mTot")
  }
}
