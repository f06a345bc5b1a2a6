package graft
import graft.vector.Vectorize
import org.locationtech.jts.geom.GeometryFactory
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite
class VectorStressSpec extends AnyFunSuite {
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
