package graft

import graft.index.Cells
import org.scalatest.funsuite.AnyFunSuite

class CellsSpec extends AnyFunSuite {

  test("spread16/unspread16 round-trip") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val v = rnd.nextInt(65536).toLong
      assert(Cells.unspread16(Cells.spread16(v)) == v)
    }
  }

  test("encode/decode round-trip and parenting") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val res = rnd.nextInt(Cells.MaxRes + 1)
      val c = Cells.encode(lon, lat, res)
      assert(Cells.res(c) == res)
      assert(Cells.cx(c) == Cells.cxOf(lon, res))
      assert(Cells.cy(c) == Cells.cyOf(lat, res))
      if (res > 0) {
        val p = Cells.parent(c, 1)
        assert(Cells.res(p) == res - 1)
        assert(Cells.cx(p) == Cells.cx(c) / 2 && Cells.cy(p) == Cells.cy(c) / 2)
        // parent contains the point
        assert(p == Cells.encode(lon, lat, res - 1))
      }
      val (lonMin, latMin, lonMax, latMax) = Cells.bounds(c)
      assert(lon >= lonMin - 1e-9 && lon <= lonMax + 1e-9)
      assert(lat >= latMin - 1e-9 && lat <= latMax + 1e-9)
    }
  }

  test("disk and ring sizes away from edges") {
    val c = Cells.encode(0.1, 0.1, 10)
    assert(Cells.disk(c, 0).toSeq == Seq(c))
    assert(Cells.disk(c, 1).length == 9)
    assert(Cells.disk(c, 2).length == 25)
    assert(Cells.ring(c, 1).length == 8)
    assert(Cells.ring(c, 2).length == 16)
    assert(Cells.ring(c, 1).toSet.subsetOf(Cells.disk(c, 1).toSet))
  }

  test("clamping at index edges") {
    val cNW = Cells.encode(-180.0, 89.9999, 4)
    assert(Cells.cx(cNW) == 0 && Cells.cy(cNW) == 15)
    val cOut = Cells.encode(-200.0, 100.0, 4) // clamped
    assert(Cells.cx(cOut) == 0 && Cells.cy(cOut) == 15)
    assert(Cells.disk(Cells.encode(-180.0, -90.0, 4), 1).length == 4)
  }
}
