package graft

import graft.vector.RingMetrics
import org.apache.spark.sql.functions._

class RingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Int, Int, Long, Long)]) =
    RingMetrics.metrics(rows.toDF("poly", "ring", "pos", "x", "y"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]), r.getLong(7)))
      .toMap

  /** Scalar shoelace reference on an open ring. */
  private def ref(pts: Seq[(Long, Long)]) = {
    val n = pts.length
    val pairs = pts.indices.map(i => (pts(i), pts((i + 1) % n)))
    val area2 = pairs.map { case ((x, y), (nx, ny)) => x * ny - nx * y }.sum
    val cxn = pairs.map { case ((x, y), (nx, ny)) =>
      BigInt(x + nx) * BigInt(x * ny - nx * y) }.sum
    val cyn = pairs.map { case ((x, y), (nx, ny)) =>
      BigInt(y + ny) * BigInt(x * ny - nx * y) }.sum
    val per = pairs.map { case ((x, y), (nx, ny)) =>
      (x - nx).abs + (y - ny).abs }.sum
    (n.toLong, area2,
      if (area2 > 0) "ccw" else if (area2 < 0) "cw" else "flat",
      if (area2 == 0) None else Some(cxn.toDouble / (area2 * 3).toDouble),
      if (area2 == 0) None else Some(cyn.toDouble / (area2 * 3).toDouble),
      per)
  }

  test("unit square, both orientations, exact area/centroid") {
    val ccw = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val cw = ccw.reverse
    val rows = ccw.zipWithIndex.map { case ((x, y), i) => ("a", 0, i, x, y) } ++
      cw.zipWithIndex.map { case ((x, y), i) => ("b", 0, i, x, y) }
    val got = run(rows)
    assert(got(("a", 0)) === (4L, 200L, "ccw", Some(5.0), Some(5.0), 40L))
    assert(got(("b", 0)) === (4L, -200L, "cw", Some(5.0), Some(5.0), 40L))
  }

  test("concave L, triangle, hole ring == scalar shoelace") {
    val l = Seq((0L, 0L), (4L, 0L), (4L, 2L), (2L, 2L), (2L, 4L), (0L, 4L))
    val tri = Seq((0L, 0L), (7L, 0L), (3L, 5L))
    val hole = Seq((1L, 1L), (1L, 3L), (3L, 3L), (3L, 1L)) // cw
    val rows =
      l.zipWithIndex.map { case ((x, y), i) => ("p", 0, i, x, y) } ++
      hole.zipWithIndex.map { case ((x, y), i) => ("p", 1, i, x, y) } ++
      tri.zipWithIndex.map { case ((x, y), i) => ("t", 0, i, x, y) }
    val got = run(rows)
    assert(got(("p", 0)) === ref(l))
    assert(got(("p", 1)) === ref(hole))
    assert(got(("p", 1))._3 === "cw")
    assert(got(("t", 0)) === ref(tri))
  }

  test("closing-vertex-free contract: degenerate flat ring -> NULL centroid") {
    val flat = Seq((5L, 5L), (9L, 5L)) // zero area segment
    val got = run(flat.zipWithIndex.map { case ((x, y), i) => ("f", 0, i, x, y) })
    assert(got(("f", 0)) === (2L, 0L, "flat", None, None, 8L))
  }

  test("large coordinates: centroid numerator exceeds Long but stays exact") {
    // |coord| ~ 1.8e6 (the 1e-4-degree scale's extreme): one centroid
    // term is ~2.2e19 > Long.MaxValue — decimal keeps it exact.
    val m = 1800000L
    val sq = Seq((-m, -m), (m, -m), (m, m), (-m, m))
    val got = run(sq.zipWithIndex.map { case ((x, y), i) => ("g", 0, i, x, y) })
    assert(got(("g", 0)) === ref(sq))
    assert(got(("g", 0))._4 === Some(0.0))
  }

  test("partitioning invariance and many independent rings") {
    val rings = (0 until 50).map { k =>
      val pts = Seq((0L + k, 0L), (10L + k, k.toLong), (5L + k, 20L))
      (s"r$k", pts)
    }
    val rows = rings.flatMap { case (p, pts) =>
      pts.zipWithIndex.map { case ((x, y), i) => (p, 0, i, x, y) } }
    val direct = run(rows)
    val shuffled = RingMetrics.metrics(
      rows.toDF("poly", "ring", "pos", "x", "y").repartition(17))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    rings.foreach { case (p, pts) =>
      assert(direct((p, 0)) === ref(pts), p)
      assert(shuffled(p) === ref(pts)._2, p)
    }
  }

  test("composes with the WKT parser on the hole fixture") {
    val wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    val verts = RingMetrics.wktRings(wkt, 10.0)
    assert(verts.count(_._1 == 0) === 4) // closing vertex dropped
    assert(verts.count(_._1 == 1) === 4)
    val got = run(verts.map { case (ri, pos, x, y) => ("w", ri, pos, x, y) })
    assert(got(("w", 0))._2 === 2 * 40L * 40L)
    assert(got(("w", 1))._2 === 2 * 10L * 10L) // listed ccw in fixture
  }
}
