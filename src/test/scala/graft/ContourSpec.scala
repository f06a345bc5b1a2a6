package graft

import graft.grid.Contours
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ContourSpec extends SparkSpec {

  // ---- scalar reference marching squares (same published contract) ----

  private type Cells = Map[(Long, Long), Long]

  private case class RefSeg(level: Long, bx: Long, by: Long, seg: Int,
                            x1: Double, y1: Double, x2: Double, y2: Double)

  private case class RefEdge(o: Int, x: Long, y: Long) {
    def key: Long = ((o.toLong << 28) + x << 28) + y
  }
  private case class RefSegE(level: Long, bx: Long, by: Long, seg: Int,
                             p1: (Double, Double), e1: RefEdge,
                             p2: (Double, Double), e2: RefEdge)

  private def refSegmentsE(cells: Cells, levels: Seq[Long]): Seq[RefSegE] = {
    val out = Seq.newBuilder[RefSegE]
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
      val B = ((bx + f(z00, z10), by.toDouble), RefEdge(0, bx, by))
      val R = (((bx + 1).toDouble, by + f(z10, z11)), RefEdge(1, bx + 1, by))
      val T = ((bx + f(z01, z11), (by + 1).toDouble), RefEdge(0, bx, by + 1))
      val L = ((bx.toDouble, by + f(z00, z01)), RefEdge(1, bx, by))
      type P = ((Double, Double), RefEdge)
      val segs: Seq[(P, P)] = idx match {
        case 0 | 15 => Seq.empty
        case 1 | 14 => Seq((B, L))
        case 2 | 13 => Seq((B, R))
        case 3 | 12 => Seq((R, L))
        case 4 | 11 => Seq((R, T))
        case 6 | 9  => Seq((B, T))
        case 7 | 8  => Seq((T, L))
        case 5 | 10 =>
          if ((idx == 5 && cin) || (idx == 10 && !cin)) Seq((B, R), (T, L))
          else Seq((B, L), (R, T))
      }
      segs.zipWithIndex.foreach { case ((a, b), i) =>
        out += RefSegE(t, bx, by, i, a._1, a._2, b._1, b._2)
      }
    }
    out.result()
  }

  private def refSegments(cells: Cells, levels: Seq[Long]): Seq[RefSeg] =
    refSegmentsE(cells, levels).map(s => RefSeg(s.level, s.bx, s.by, s.seg,
      s.p1._1, s.p1._2, s.p2._1, s.p2._2))

  /** Scalar re-implementation of the orderedVertices contract: arcs,
    * unique successor, cycle cut at min-sid arcs, canonical head =
    * min (enter-edge key, arc id), sequential walk. */
  private def refOrdered(cells: Cells, levels: Seq[Long])
      : Seq[(Long, Long, Long, Double, Double, Boolean)] = {
    val liOf = levels.zipWithIndex.toMap
    val segsE = refSegmentsE(cells, levels)
    case class Arc(aid: Long, sid: Long, level: Long, inK: Long, outK: Long,
                   ip: (Double, Double), op: (Double, Double))
    def sidOf(s: RefSegE) =
      ((liOf(s.level).toLong * (1L << 28) + s.bx) * (1L << 28) + s.by) * 2 +
        s.seg
    val arcs = segsE.flatMap { s =>
      val sid = sidOf(s)
      Seq(Arc(sid * 2, sid, s.level, s.e1.key, s.e2.key, s.p1, s.p2),
        Arc(sid * 2 + 1, sid, s.level, s.e2.key, s.e1.key, s.p2, s.p1))
    }
    val byIn = arcs.groupBy(a => (a.level, a.inK))
    def succOf(a: Arc): Option[Arc] =
      byIn.getOrElse((a.level, a.outK), Seq.empty)
        .filter(_.sid != a.sid) match {
        case Seq(b) => Some(b)
        case Seq()  => None
        case more   => sys.error(s"edge touched by ${more.size + 1} segs")
      }
    // components of segments over shared edges -> line_id = min sid
    val segAdj = arcs.flatMap(a => succOf(a).map(b => (a.sid, b.sid)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    arcs.foreach(a => parent.getOrElseUpdate(a.sid, a.sid))
    segAdj.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val lineOf = arcs.map(_.sid).distinct.map(s => s -> find(s)).toMap
    val openLines = arcs.filter(a => succOf(a).isEmpty)
      .map(a => lineOf(a.sid)).toSet
    val cutAids = lineOf.groupBy(_._2).collect {
      case (line, members) if !openLines(line) =>
        val msid = members.keys.min
        Seq(msid * 2, msid * 2 + 1)
    }.flatten.toSet
    def succCut(a: Arc): Option[Arc] =
      succOf(a).filterNot(b => cutAids(b.aid))
    val isSuccTarget = arcs.flatMap(a => succCut(a).map(_.aid)).toSet
    val heads = arcs.filterNot(a => isSuccTarget(a.aid))
    val canonical = heads.groupBy(a => lineOf(a.sid)).map {
      case (line, hs) => line -> hs.minBy(a => (a.inK, a.aid))
    }
    val out = Seq.newBuilder[(Long, Long, Long, Double, Double, Boolean)]
    canonical.foreach { case (line, head) =>
      val closed = !openLines(line)
      var cur: Option[Arc] = Some(head)
      var pos = 0L
      var last: Arc = head
      while (cur.isDefined) {
        val a = cur.get
        out += ((a.level, line, pos, a.ip._1, a.ip._2, closed))
        last = a; pos += 1; cur = succCut(a)
      }
      out += ((last.level, line, pos, last.op._1, last.op._2, closed))
    }
    out.result().sortBy(v => (v._1, v._2, v._3))
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

  private def collectOrdered(df: DataFrame) =
    df.orderBy("level", "line_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq

  test("orderedVertices == scalar walker on open saddle lines") {
    val levels = Seq(10L, 18L)
    val segs = Contours.segments(cellsDf(saddleGrid), levels)
    val got = collectOrdered(
      Contours.orderedVertices(segs, levels)
        .select("level", "line_id", "pos", "x", "y", "closed"))
    val want = refOrdered(saddleGrid, levels)
    assert(got == want)
    // the grid exercises both regimes: open paths AND closed diamonds
    assert(got.exists(!_._6) && got.exists(_._6))
  }

  test("orderedVertices: closed plateau rings walk 9 positions, first == last") {
    val cells: Cells = (for {
      x <- 0L to 8L; y <- 0L to 3L
    } yield (x, y) -> 0L).toMap ++
      Map((1L, 1L) -> 100L, (2L, 1L) -> 100L, (1L, 2L) -> 100L, (2L, 2L) -> 100L,
        (5L, 1L) -> 100L, (6L, 1L) -> 100L, (5L, 2L) -> 100L, (6L, 2L) -> 100L)
    val segs = Contours.segments(cellsDf(cells), Seq(50L))
    val got = collectOrdered(
      Contours.orderedVertices(segs, Seq(50L))
        .select("level", "line_id", "pos", "x", "y", "closed"))
    assert(got == refOrdered(cells, Seq(50L)))
    val byLine = got.groupBy(_._2)
    assert(byLine.size == 2)
    byLine.values.foreach { vs =>
      assert(vs.map(_._3).sorted == (0L to 8L))
      val s = vs.minBy(_._3); val e = vs.maxBy(_._3)
      assert((s._4, s._5) == (e._4, e._5), "ring must close on itself")
      assert(vs.forall(_._6), "ring must be flagged closed")
    }
  }

  test("orderedVertices invariant under segment partitioning") {
    val segs = Contours.segments(cellsDf(saddleGrid), Seq(10L))
    val a = collectOrdered(Contours.orderedVertices(segs, Seq(10L))
      .select("level", "line_id", "pos", "x", "y", "closed"))
    val b = collectOrdered(
      Contours.orderedVertices(segs.repartition(5), Seq(10L))
        .select("level", "line_id", "pos", "x", "y", "closed"))
    assert(a == b)
  }

  /** Scalar WKT builder over refOrdered, using the repo's one
    * coordinate convention (Vectorize.fmtCoord). */
  private def refWkt(cells: Cells, levels: Seq[Long])
      : Map[(Long, Long), (Int, Boolean, String)] = {
    import graft.vector.Vectorize.fmtCoord
    refOrdered(cells, levels).groupBy(v => (v._1, v._2)).map {
      case ((level, line), vs) =>
        val sorted = vs.sortBy(_._3)
        val body = sorted
          .map(v => s"${fmtCoord(v._4)} ${fmtCoord(v._5)}")
          .mkString(", ")
        (level, line) ->
          ((sorted.size, sorted.head._6, s"LINESTRING ($body)"))
    }
  }

  test("toWktLines == scalar WKT on open lines and closed rings") {
    val levels = Seq(10L, 18L)
    val segs = Contours.segments(cellsDf(saddleGrid), levels)
    val got = Contours.toWktLines(
      Contours.orderedVertices(segs, levels)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getBoolean(3), r.getString(4)))).toMap
    val want = refWkt(saddleGrid, levels)
    assert(got == want)
    // fractional and integer coordinates both appear in some WKT
    assert(got.values.exists(w => w._3.contains(".")),
      "no fractional coordinate exercised")
    val frac = """\d+\.\d+""".r
    assert(got.values.exists(w =>
      frac.findFirstIn(w._3).isDefined && w._3.matches(""".*\b\d+ \d+\b.*""")))
  }

  test("toWktLines refuses lines over maxPts with honest n_pts") {
    val segs = Contours.segments(cellsDf(saddleGrid), Seq(10L))
    val out = Contours.toWktLines(
      Contours.orderedVertices(segs, Seq(10L)), maxPts = 3).collect()
    val refused = out.filter(_.isNullAt(4))
    assert(refused.nonEmpty, "expected at least one refused long line")
    assert(refused.forall(_.getInt(2) > 3))
    assert(out.filter(!_.isNullAt(4)).forall(_.getInt(2) <= 3))
  }
}
