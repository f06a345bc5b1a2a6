package graft

import graft.grid.Contours
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ContourSpec extends SparkSpec {

  // ---- scalar reference marching squares (same published contract) ----

  private type Cells = Map[(Long, Long), Long]

  private case class RefSeg(level: Long, bx: Long, by: Long, seg: Int,
                            x1: Double, y1: Double, x2: Double, y2: Double)

  private def refSegments(cells: Cells, levels: Seq[Long]): Seq[RefSeg] = {
    val out = Seq.newBuilder[RefSeg]
    val bxs = cells.keys.map(_._1)
    val bys = cells.keys.map(_._2)
    for {
      bx <- bxs.min - 1 to bxs.max
      by <- bys.min - 1 to bys.max
      z00 <- cells.get((bx, by)); z10 <- cells.get((bx + 1, by))
      z01 <- cells.get((bx, by + 1)); z11 <- cells.get((bx + 1, by + 1))
      t <- levels
    } {
      def in(z: Long) = if (z >= t) 1 else 0
      val idx = in(z00) + in(z10) * 2 + in(z11) * 4 + in(z01) * 8
      val cin = z00 + z10 + z01 + z11 >= 4 * t
      def f(za: Long, zb: Long) = (t - za).toDouble / (zb - za)
      val pB = (bx + f(z00, z10), by.toDouble)
      val pR = ((bx + 1).toDouble, by + f(z10, z11))
      val pT = (bx + f(z01, z11), (by + 1).toDouble)
      val pL = (bx.toDouble, by + f(z00, z01))
      val segs: Seq[((Double, Double), (Double, Double))] = idx match {
        case 0 | 15 => Seq.empty
        case 1 | 14 => Seq((pB, pL))
        case 2 | 13 => Seq((pB, pR))
        case 3 | 12 => Seq((pR, pL))
        case 4 | 11 => Seq((pR, pT))
        case 6 | 9  => Seq((pB, pT))
        case 7 | 8  => Seq((pT, pL))
        case 5 | 10 =>
          if ((idx == 5 && cin) || (idx == 10 && !cin))
            Seq((pB, pR), (pT, pL))
          else Seq((pB, pL), (pR, pT))
      }
      segs.zipWithIndex.foreach { case ((p1, p2), i) =>
        out += RefSeg(t, bx, by, i, p1._1, p1._2, p2._1, p2._2)
      }
    }
    out.result()
  }

  private def cellsDf(cells: Cells): DataFrame = {
    import spark.implicits._
    cells.toSeq.map { case ((x, y), v) => (x, y, v) }.toDF("gx", "gy", "v")
  }

  private def collectSegs(df: DataFrame): Seq[RefSeg] =
    df.orderBy("level", "bx", "by", "seg").collect().map { r =>
      RefSeg(r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    }.toSeq

  // dense 5x4 grid with both saddle orientations and both center rules
  private val saddleGrid: Cells = Map(
    (0L, 0L) -> 20L, (1L, 0L) -> 0L, (2L, 0L) -> 20L, (3L, 0L) -> 0L, (4L, 0L) -> 11L,
    (0L, 1L) -> 0L, (1L, 1L) -> 20L, (2L, 1L) -> 0L, (3L, 1L) -> 11L, (4L, 1L) -> 0L,
    (0L, 2L) -> 20L, (1L, 2L) -> 5L, (2L, 2L) -> 30L, (3L, 2L) -> 0L, (4L, 2L) -> 11L,
    (0L, 3L) -> 7L, (1L, 3L) -> 25L, (2L, 3L) -> 3L, (3L, 3L) -> 11L, (4L, 3L) -> 0L)

  test("segments == scalar marching squares on a saddle-heavy grid") {
    val levels = Seq(10L, 18L)
    val got = collectSegs(Contours.segments(cellsDf(saddleGrid), levels))
    val want = refSegments(saddleGrid, levels)
      .sortBy(s => (s.level, s.bx, s.by, s.seg))
    assert(got == want)
    // the grid actually exercises two-segment saddle blocks
    assert(got.exists(_.seg == 1), "no saddle case emitted")
  }

  test("blocks with a missing corner are suppressed") {
    val hole = saddleGrid - ((1L, 1L))
    val got = collectSegs(Contours.segments(cellsDf(hole), Seq(10L)))
    assert(got == refSegments(hole, Seq(10L))
      .sortBy(s => (s.level, s.bx, s.by, s.seg)))
    // every block using the removed cell (1,1) as a corner is gone
    val killed = Set((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L))
    assert(!got.exists(s => killed((s.bx, s.by))))
  }

  test("segments invariant under input partitioning") {
    val df = cellsDf(saddleGrid)
    val a = collectSegs(Contours.segments(df, Seq(10L, 18L)))
    val b = collectSegs(Contours.segments(df.repartition(7), Seq(10L, 18L)))
    assert(a == b)
  }

  test("polylines: one ring per plateau, closed ring is one component") {
    // two separated 2x2 plateaus on a 0-background; t=50 draws a closed
    // ring around each -> exactly two line ids, 8 segments each
    val cells: Cells = (for {
      x <- 0L to 8L; y <- 0L to 3L
    } yield (x, y) -> 0L).toMap ++
      Map((1L, 1L) -> 100L, (2L, 1L) -> 100L, (1L, 2L) -> 100L, (2L, 2L) -> 100L,
        (5L, 1L) -> 100L, (6L, 1L) -> 100L, (5L, 2L) -> 100L, (6L, 2L) -> 100L)
    val segs = Contours.segments(cellsDf(cells), Seq(50L))
    val lines = Contours.polylines(segs, Seq(50L))
      .select("line_id").collect().map(_.getLong(0))
    assert(lines.length == 16, s"expected 16 ring segments, got ${lines.length}")
    assert(lines.distinct.length == 2, "expected exactly two closed rings")
    assert(lines.groupBy(identity).values.map(_.length).toSet == Set(8))
  }

  test("segments plan: one exchange (block build), everything else map-only") {
    import spark.implicits._
    val cells = (0L to 40L).flatMap(x => (0L to 20L).map(y =>
      (x, y, (x * 7 + y * 13) % 100))).toDF("gx", "gy", "v")
    val segs = Contours.segments(cells, Seq(30L, 60L))
    assert(segs.count() > 0)
    val plan = segs.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    assert(nEx <= 1, s"contour plan should shuffle once, got $nEx:\n$plan")
  }

  test("polylines labels are partitioning-invariant") {
    val segs = Contours.segments(cellsDf(saddleGrid), Seq(10L))
    def labels(df: DataFrame) =
      Contours.polylines(df, Seq(10L))
        .orderBy("level", "bx", "by", "seg").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
          r.getLong(4))).toSeq
    assert(labels(segs) == labels(segs.repartition(5)))
  }
}
