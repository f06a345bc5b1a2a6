package graft
import graft.vector.Vectorize
import org.locationtech.jts.geom.GeometryFactory
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite
class VectorStressSpec extends AnyFunSuite {
  test("4M-cell component traces with the primitive-array gather") {
    // DefaultMaxCells-scale component (2000x2000 minus a 400x400 hole):
    // the packed-long gather holds ~32 MB, not hundreds of MB of boxed
    // tuples; the trace must produce the exact shell + hole areas
    val (w, h) = (2000L, 2000L)
    val it = for {
      y <- (0L until h).iterator; x <- (0L until w).iterator
      if !(x >= 800 && x < 1200 && y >= 800 && y < 1200)
    } yield (x, y)
    val cells = Vectorize.PackedCells.fromIterator(it)
    assert(cells.size == (w * h - 400L * 400L).toInt)
    val g = new WKTReader(new GeometryFactory()).read(Vectorize.toWkt(cells))
    assert(g.isValid)
    assert(g.getArea == (w * h - 400L * 400L).toDouble, s"area ${g.getArea}")
  }

  test("V3 buildingSimplify: rectilinear rectangle is an exact-WKT fixpoint") {
    // rect cells [5..24] x [7..20] -> boundary [5,25] x [7,21]; the
    // least-squares lines through exactly-collinear integer points ARE
    // the edges, so the refit corners are the exact rectangle corners
    val cells = (for (y <- 7L to 20L; x <- 5L to 24L) yield (x, y)).toSet
    val wkt = Vectorize.toWktBuilding(cells, scale = 8)
    assert(wkt.contains("MULTIPOLYGON (((5 7, 25 7, 25 21, 5 21, 5 7)))"),
      s"got $wkt")
  }

  test("V3 buildingSimplify: L-shape keeps its six exact corners") {
    val cells = ((for (y <- 0L to 19L; x <- 0L to 9L) yield (x, y)) ++
      (for (y <- 0L to 9L; x <- 10L to 19L) yield (x, y))).toSet
    val wkt = Vectorize.toWktBuilding(cells, scale = 8).get
    val reader = new WKTReader(new GeometryFactory())
    val g = reader.read(wkt)
    assert(g.isValid)
    assert(g.getArea == 300.0, s"area ${g.getArea}")
    assert(g.getGeometryN(0).asInstanceOf[org.locationtech.jts.geom.Polygon]
      .getExteriorRing.getNumPoints == 7, s"not 6 corners: $wkt") // closed ring
  }

  test("V3 buildingSimplify: single pixel and tiny blobs are dropped") {
    assert(Vectorize.toWktBuilding(Set((3L, 3L)), scale = 8).isEmpty)
    assert(Vectorize.toWktBuilding(Set((3L, 3L), (4L, 3L), (4L, 4L)), scale = 8).isEmpty)
  }

  test("V3 buildingSimplify: component at the image corner stays sane") {
    val cells = (for (y <- 0L to 11L; x <- 0L to 11L) yield (x, y)).toSet
    val wkt = Vectorize.toWktBuilding(cells, scale = 6)
    assert(wkt.isDefined)
    val g = new WKTReader(new GeometryFactory()).read(wkt.get)
    assert(g.isValid && math.abs(g.getArea - 144.0) < 1e-6, s"got $wkt")
  }

  test("V3 buildingSimplify: hole ring survives and stays inside") {
    // 16x16 block with a 6x6 hole
    val cells = (for (y <- 0L to 15L; x <- 0L to 15L
                      if !(x >= 5 && x <= 10 && y >= 5 && y <= 10)) yield (x, y)).toSet
    val wkt = Vectorize.toWktBuilding(cells, scale = 5).get
    val g = new WKTReader(new GeometryFactory()).read(wkt)
    assert(g.isValid, wkt)
    assert(math.abs(g.getArea - (256.0 - 36.0)) < 1e-6, s"area ${g.getArea}: $wkt")
  }

  test("stress: buildingSimplify terminates and stays valid on random blobs") {
    val reader = new WKTReader(new GeometryFactory())
    for (seed <- 0 until 40) {
      val r = new scala.util.Random(1000 + seed)
      var cells = Set((20L, 20L))
      (0 until 300).foreach { _ =>
        val c = cells.toSeq(r.nextInt(cells.size))
        cells += ((c._1 + r.nextInt(5) - 2, c._2 + r.nextInt(5) - 2))
      }
      Vectorize.toWktBuilding(cells, scale = 6).foreach { wkt =>
        // self-intersections can appear on gnarly blobs (the reference
        // has the same property); the contract here is termination +
        // parseable rings with sane area
        val g = reader.read(wkt)
        assert(g.getNumGeometries >= 1, s"seed $seed: $wkt")
      }
    }
  }

  test("stress: many seeds, growing blobs stay valid with exact area") {
    val reader = new WKTReader(new GeometryFactory())
    for (seed <- 0 until 60) {
      val r = new scala.util.Random(seed)
      var cells = Set((20L, 20L))
      (0 until 400).foreach { _ =>
        val c = cells.toSeq(r.nextInt(cells.size))
        cells += ((c._1 + r.nextInt(5) - 2, c._2 + r.nextInt(5) - 2))
      }
      val g = reader.read(Vectorize.toWkt(cells))
      assert(g.isValid, s"seed $seed invalid")
      assert(g.getArea == cells.size.toDouble, s"seed $seed area ${g.getArea} vs ${cells.size}")
    }
  }
}
