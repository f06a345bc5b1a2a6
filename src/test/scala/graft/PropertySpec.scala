package graft

import graft.core.Quant
import graft.index.{Cells, HexCells}
import graft.vector.Vectorize
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.5). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val lonGen = Gen.chooseNum(-180.0, 179.999)
  private val latGen = Gen.chooseNum(-90.0, 89.999)
  private val resGen = Gen.chooseNum(0, Cells.MaxRes)

  test("quantize/dequantize: round-trip within one quantum, monotone") {
    check(Prop.forAll(Gen.chooseNum(0.0, 20.0), Gen.chooseNum(0.0, 20.0)) { (a, b) =>
      val qa = Quant.q(a); val qb = Quant.q(b)
      val roundTrip = math.abs(Quant.deq(qa) - a) <= Quant.Scale
      val monotone = (a <= b) == (qa <= qb) || qa == qb
      roundTrip && monotone && qa >= 1 // void sentinel 0 never produced
    })
  }

  test("cell encode: containment, parent nesting, morton bijection") {
    check(Prop.forAll(lonGen, latGen, resGen) { (lon, lat, res) =>
      val c = Cells.encode(lon, lat, res)
      val (x0, y0, x1, y1) = Cells.bounds(c)
      val contained = lon >= x0 - 1e-9 && lon <= x1 + 1e-9 &&
        lat >= y0 - 1e-9 && lat <= y1 + 1e-9
      val nested = res == 0 || Cells.parent(c, 1) == Cells.encode(lon, lat, res - 1)
      val bijective = Cells.pack(Cells.cx(c), Cells.cy(c), res) == c
      contained && nested && bijective
    })
  }

  test("hex encode: neighbors symmetric, point in own hex's vicinity") {
    check(Prop.forAll(lonGen, latGen, Gen.chooseNum(4, 12)) { (lon, lat, res) =>
      val c = HexCells.encode(lon, lat, res)
      val sym = HexCells.neighbors(c).forall(n => HexCells.neighbors(n).contains(c))
      val (clon, clat) = HexCells.center(c)
      val near = math.abs(clon - lon) <= 2 * HexCells.size(res) &&
        math.abs(clat - lat) <= 2 * HexCells.size(res)
      sym && near
    })
  }

  test("vectorize: area equals cell count, geometry valid") {
    val cellsGen = for {
      seed <- Gen.chooseNum(0, 10000)
      n <- Gen.chooseNum(1, 60)
    } yield {
      val r = new scala.util.Random(seed)
      var cs = Set((8L, 8L))
      (0 until n).foreach { _ =>
        val c = cs.toSeq(r.nextInt(cs.size))
        cs += ((c._1 + r.nextInt(3) - 1, c._2 + r.nextInt(3) - 1))
      }
      cs
    }
    val reader = new org.locationtech.jts.io.WKTReader(
      new org.locationtech.jts.geom.GeometryFactory())
    check(Prop.forAll(cellsGen) { cs =>
      val g = reader.read(Vectorize.toWkt(cs))
      g.isValid && g.getArea == cs.size.toDouble
    })
  }

  test("topk buffer: any chunking + serde roundtrip equals sort-take-k") {
    import graft.sketch.{TopKAgg, TopKBuffer}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val gen = for {
      seed <- Gen.chooseNum(0, 100000)
      n <- Gen.chooseNum(0, 300)
      k <- Gen.chooseNum(1, 20)
      cuts <- Gen.chooseNum(1, 8)
    } yield (seed, n, k, cuts)
    check(Prop.forAll(gen) { case (seed, n, k, cuts) =>
      val r = new scala.util.Random(seed)
      // small domains force heavy score AND item ties
      val rows = Seq.fill(n)((r.nextInt(50).toLong, r.nextInt(40).toLong))
      val agg = TopKAgg(Literal(0L), Literal(0L), k)
      val chunks = (0 until cuts).map(c =>
        rows.zipWithIndex.collect { case (x, i) if i % cuts == c => x })
      val merged = chunks.map { ch =>
        val b = new TopKBuffer(k)
        ch.foreach { case (i, s) => b.add(i, s) }
        agg.deserialize(agg.serialize(b)) // shuffle-boundary roundtrip
      }.foldLeft(new TopKBuffer(k))(agg.merge)
      val want = rows.sortBy { case (i, s) => (-s, i) }.take(k)
      merged.sortedPairs.toSeq == want
    })
  }

  test("mt19937-64 uniform doubles stay in [0,1) and differ by seed") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { seed =>
      val r = new graft.align.Mt19937_64(seed)
      val xs = Seq.fill(50)(r.nextDouble())
      xs.forall(x => x >= 0.0 && x < 1.0)
    })
  }

  test("extractor: idempotent on its own output") {
    val htmlGen = Gen.listOfN(30, Gen.oneOf(
      "<p>", "</p>", "word", "two words", "<script>x</script>", "&amp;",
      "<div>", "</div>", " ", "<b>", "</b>", "&#65;")).map(_.mkString)
    check(Prop.forAll(htmlGen) { h =>
      val once = graft.ingest.Extractor.extractStr(h)
      graft.ingest.Extractor.extractStr(once) == once
    })
  }
}
