package graft

import graft.vector.ConvexHull
import org.apache.spark.sql.functions._

class ConvexHullSpec extends SparkSpec {
  import spark.implicits._

  /** Definition-based reference: p is a vertex iff it is not in the
    * hull of the others (inclusive triangle / segment membership). */
  private def ref(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    def cross(a: (Long, Long), b: (Long, Long), p: (Long, Long)): BigInt =
      BigInt(b._1 - a._1) * (p._2 - a._2) - BigInt(b._2 - a._2) * (p._1 - a._1)
    def inTri(p: (Long, Long), a: (Long, Long), b: (Long, Long),
              c: (Long, Long)): Boolean = {
      if (cross(a, b, c) == 0) return false
      val (s1, s2, s3) = (cross(a, b, p), cross(b, c, p), cross(c, a, p))
      (s1 >= 0 && s2 >= 0 && s3 >= 0) || (s1 <= 0 && s2 <= 0 && s3 <= 0)
    }
    def onSeg(p: (Long, Long), a: (Long, Long), b: (Long, Long)): Boolean =
      cross(a, b, p) == 0 &&
        p._1 >= math.min(a._1, b._1) && p._1 <= math.max(a._1, b._1) &&
        p._2 >= math.min(a._2, b._2) && p._2 <= math.max(a._2, b._2)
    d.filter { p =>
      val others = d.filterNot(_ == p)
      val tri = others.combinations(3).exists { case Seq(a, b, c) =>
        inTri(p, a, b, c) }
      val seg = others.combinations(2).exists { case Seq(a, b) =>
        onSeg(p, a, b) }
      !tri && !seg
    }.toSet
  }

  private def run(pts: Seq[(Long, Long)], parts: Int = 1): Set[(Long, Long)] =
    ConvexHull.hull(
        pts.map { case (x, y) => ("g", x, y) }
          .toDF("key", "x", "y").repartition(parts))
      .select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("square with interior, edge-interior, and duplicated corner points") {
    val pts = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L),
      (5L, 5L),   // interior
      (5L, 0L),   // interior of bottom edge -> not a vertex
      (0L, 0L),   // duplicated corner -> still a vertex
      (3L, 7L))
    val want = Set((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    assert(run(pts) === want)
    assert(ref(pts) === want)
  }

  test("random clouds match the definition-based reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val pts = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      assert(run(pts) === ref(pts), s"trial $trial: $pts")
    }
  }

  test("degenerate inputs: single point, duplicate pair, collinear run") {
    assert(run(Seq((3L, 4L))) === Set((3L, 4L)))
    assert(run(Seq((3L, 4L), (3L, 4L))) === Set((3L, 4L)))
    val line = (0L to 9L).map(i => (i, 2 * i))
    assert(run(line) === Set((0L, 0L), (9L, 18L)))
    assert(ref(line) === Set((0L, 0L), (9L, 18L)))
  }

  test("groups independent + partitioning invariance") {
    val a = Seq((0L, 0L), (4L, 0L), (2L, 5L), (2L, 1L))
    val b = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L))
    val rows = a.map { case (x, y) => ("a", x, y) } ++
      b.map { case (x, y) => ("b", x, y) }
    val out = ConvexHull.hull(rows.toDF("key", "x", "y").repartition(7))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", 0L, 0L), ("a", 4L, 0L), ("a", 2L, 5L),
      ("b", 0L, 0L), ("b", 3L, 3L)))
  }

  test("maxPts refusal") {
    val rows = (0 until 100).map(i => ("big", i.toLong, (i * i).toLong))
    val ex = intercept[org.apache.spark.SparkException] {
      ConvexHull.hull(rows.toDF("key", "x", "y"), maxPts = 50).collect()
    }
    assert(ex.getMessage.contains("maxPts") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxPts")))
  }
}
