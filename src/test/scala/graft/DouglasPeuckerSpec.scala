package graft

import graft.vector.DouglasPeucker
import org.apache.spark.sql.functions._

class DouglasPeuckerSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference with the identical (dev desc, pos asc) argmax and
    * the identical coincident-endpoint fallback (squared point-to-
    * endpoint distance, split iff dist > eps). */
  private def ref(pts: IndexedSeq[(Long, Long)], epsNum: Long,
                  epsDen: Long): Set[Int] = {
    val keep = scala.collection.mutable.Set(0, pts.length - 1)
    def walk(i: Int, j: Int): Unit = if (j - i > 1) {
      val (ax, ay) = pts(i); val (bx, by) = pts(j)
      val (dx, dy) = (bx - ax, by - ay)
      val degenerate = dx == 0 && dy == 0
      val (best, bestDev) = (i + 1 until j).map { k =>
        val (kx, ky) = pts(k)
        val d =
          if (degenerate)
            BigInt(kx - ax) * (kx - ax) + BigInt(ky - ay) * (ky - ay)
          else (BigInt(dx) * (ky - ay) - BigInt(dy) * (kx - ax)).abs
        k -> d
      }.minBy { case (k, d) => (-d, k) }
      val len2 = BigInt(dx) * dx + BigInt(dy) * dy
      val ed2 = BigInt(epsDen) * epsDen
      val en2 = BigInt(epsNum) * epsNum
      val split =
        if (degenerate) bestDev * ed2 > en2
        else bestDev * bestDev * ed2 > en2 * len2
      if (split) { keep += best; walk(i, best); walk(best, j) }
    }
    walk(0, pts.length - 1)
    keep.toSet
  }

  private def run(pts: Seq[(Long, Long)], epsNum: Long, epsDen: Long = 1,
                  parts: Int = 1): Set[Int] =
    DouglasPeucker.simplify(
        pts.zipWithIndex.map { case ((x, y), i) => ("l", i.toLong, x, y) }
          .toDF("line", "pos", "x", "y").repartition(parts),
        epsNum, epsDen)
      .select("pos").as[Long].collect().map(_.toInt).toSet

  test("spike kept, jitter dropped, endpoints always kept") {
    val pts = Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 8L), (4L, 0L),
      (5L, 1L), (6L, 0L))
    assert(run(pts, 2) === Set(0, 3, 6))
    assert(run(pts, 2) === ref(pts.toIndexedSeq, 2, 1))
  }

  test("eps sweep on a sine-ish walk matches the scalar recursion") {
    val pts = (0 until 120).map(i =>
      (i.toLong * 10, ((i * 37) % 23 - 11).toLong * ((i % 7) + 1)))
    for (eps <- Seq(0L, 5L, 20L, 60L, 1000L)) {
      assert(run(pts, eps) === ref(pts, eps, 1), s"eps=$eps")
    }
  }

  test("rational epsilon: 5/2 differs from 2 and 3 where it should") {
    val pts = Seq((0L, 0L), (4L, 5L), (8L, 0L)) // dev of mid = 40, len 8
    // perpendicular distance = 40/8 = 5 -> kept for eps < 5
    assert(run(pts, 5, 2) === Set(0, 1, 2))   // eps 2.5 < 5
    assert(run(pts, 9, 2) === Set(0, 1, 2))   // eps 4.5 < 5
    assert(run(pts, 5, 1) === Set(0, 2))      // eps 5: strict > fails
  }

  test("collinear line collapses to endpoints at any eps > 0") {
    val pts = (0 until 50).map(i => (i.toLong, i.toLong * 3))
    assert(run(pts, 1) === Set(0, 49))
    assert(run(pts, 0) === Set(0, 49)) // dev 0 is never > 0
  }

  test("multiple lines independent + partitioning invariance") {
    val a = (0 until 60).map(i => ((i * 13 % 41).toLong, (i * 7 % 29).toLong))
    val rows =
      a.zipWithIndex.map { case ((x, y), i) => ("p", i.toLong, x, y) } ++
      a.reverse.zipWithIndex.map { case ((x, y), i) => ("q", i.toLong, x, y) }
    val out = DouglasPeucker.simplify(
        rows.toDF("line", "pos", "x", "y").repartition(9), 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val pRef = ref(a, 10, 1).map(i => ("p", i.toLong))
    val qRef = ref(a.reverse, 10, 1).map(i => ("q", i.toLong))
    assert(out === pRef ++ qRef)
  }

  test("closed ring (coincident endpoints): point-distance fallback") {
    // square ring closed back to the start: dx = dy = 0 over the whole
    // span, so the first split must use point-to-endpoint distance
    val sq = Seq((0L, 0L), (5L, 0L), (5L, 5L), (0L, 5L), (0L, 0L))
    // farthest point from (0,0) is (5,5) at dist sqrt(50) ~ 7.07
    assert(run(sq, 7) === Set(0, 2, 4))  // 7.07 > 7: split; halves flat
    assert(run(sq, 8) === Set(0, 4))     // 7.07 < 8: everything culled
    assert(run(sq, 7) === ref(sq.toIndexedSeq, 7, 1))
    assert(run(sq, 8) === ref(sq.toIndexedSeq, 8, 1))
    // irregular closed ring, eps sweep vs the scalar recursion
    val ring = (0 until 40).map { i =>
      ((math.cos(i * 0.157) * (80 + (i * 13 % 17))).toLong,
        (math.sin(i * 0.157) * (80 + (i * 7 % 19))).toLong)
    } :+ (math.cos(0.0) * (80 + 0)).toLong -> 0L
    for (eps <- Seq(1L, 5L, 15L, 50L))
      assert(run(ring, eps) === ref(ring.toIndexedSeq, eps, 1), s"eps=$eps")
  }

  test("maxPts refusal") {
    val rows = (0 until 100).map(i => ("big", i.toLong, i.toLong, 0L))
    val ex = intercept[org.apache.spark.SparkException] {
      DouglasPeucker.simplify(rows.toDF("line", "pos", "x", "y"), 1L,
        maxPts = 50).collect()
    }
    assert(ex.getMessage.contains("maxPts") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxPts")))
  }
}
