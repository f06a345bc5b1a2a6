package graft

import graft.index.{HexCellFunctions, HexCells}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HexCellsSpec extends AnyFunSuite {

  test("every point maps to the hex whose center is nearest (hex metric)") {
    val rnd = new scala.util.Random(42)
    (0 until 3000).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val res = 6 + rnd.nextInt(4)
      val c = HexCells.encode(lon, lat, res)
      val (clon, clat) = HexCells.center(c)
      val dSelf = dist(lon, lat, clon, clat)
      // nearest among the cell and its 6 neighbors must be the cell
      HexCells.neighbors(c).foreach { n =>
        val (nlon, nlat) = HexCells.center(n)
        assert(dist(lon, lat, nlon, nlat) >= dSelf - 1e-9,
          s"point ($lon,$lat) closer to neighbor at res $res")
      }
    }
  }

  private def dist(ax: Double, ay: Double, bx: Double, by: Double) =
    math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))

  test("neighbor relation is symmetric and 6-regular") {
    val c = HexCells.encode(10.0, 20.0, 8)
    val ns = HexCells.neighbors(c)
    assert(ns.length == 6 && ns.distinct.length == 6)
    ns.foreach(n => assert(HexCells.neighbors(n).contains(c)))
  }

  test("hex resolution nests sizes") {
    assert(HexCells.size(5) == 2 * HexCells.size(6))
  }
}

class HexCellsSparkSpec extends SparkSpec {
  test("codegen'd hex expression matches the Scala model") {
    import spark.implicits._
    val pts = Seq.tabulate(400)(i =>
      ((i * 16807 % 360000) / 1000.0 - 180.0, (i * 48271 % 170000) / 1000.0 - 85.0))
    val got = pts.toDF("lon", "lat")
      .withColumn("c", HexCellFunctions.hexCellId(col("lon"), col("lat"), 9))
      .select("c").as[Long].collect().toSeq
    assert(got == pts.map { case (lon, lat) => HexCells.encode(lon, lat, 9) })
  }
}
