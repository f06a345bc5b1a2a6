package graft

import graft.index.{CellCompact, Cells}
import org.apache.spark.sql.functions._

/** [[CellCompact]] vs a sequential set-based compactor, plus the
  * uncompact round-trip and minimality invariants. */
class CellCompactSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential oracle: recursively promote complete 4-sibling groups. */
  private def compactOracle(cells: Set[Long], res: Int): Set[Long] = {
    var out = Set.empty[Long]
    var cur = cells
    var level = res
    while (level > 0 && cur.nonEmpty) {
      val byParent = cur.groupBy(c => Cells.parent(c, 1))
      val (full, partial) = byParent.partition(_._2.size == 4)
      out ++= partial.values.flatten
      cur = full.keySet
      level -= 1
    }
    out ++ cur
  }

  private def synthCells(res: Int, density: Double, seed: Int): Set[Long] = {
    val rnd = new scala.util.Random(seed)
    val n = 1L << res
    (for (x <- 0L until n; y <- 0L until n; if rnd.nextDouble() < density)
      yield Cells.pack(x, y, res)).toSet
  }

  private def run(cells: Set[Long], res: Int): Set[Long] =
    CellCompact.compact(cells.toSeq.toDF("cell"), res)
      .collect().map(_.getLong(0)).toSet

  test("compact == sequential oracle across densities") {
    for ((d, seed) <- Seq((0.95, 1), (0.6, 2), (0.25, 3))) {
      val cells = synthCells(5, d, seed)
      assert(run(cells, 5) == compactOracle(cells, 5))
    }
  }

  test("full grid compacts to the single res-0 cell") {
    val cells = synthCells(3, 1.1, 0)
    assert(run(cells, 3) == Set(Cells.pack(0, 0, 0)))
  }

  test("no complete sibling group survives (minimality)") {
    val got = run(synthCells(5, 0.9, 7), 5)
    val byParent = got.filter(c => Cells.res(c) > 0).groupBy(c => Cells.parent(c, 1))
    assert(byParent.values.forall(_.size < 4))
  }

  test("uncompact(compact(S)) == S and partitioning invariance") {
    val cells = synthCells(5, 0.8, 11)
    val compacted = CellCompact.compact(
      cells.toSeq.toDF("cell").repartition(13), 5)
    val back = CellCompact.uncompact(compacted, 5)
      .collect().map(_.getLong(0)).toSet
    assert(back == cells)
  }

  test("column spread/unspread == scalar Cells round-trip") {
    import graft.index.CellOps
    val vs = (0L until 2048L).map(_ * 31L % 65536L).toDF("v")
    val got = vs.select(col("v"),
        CellOps.unspreadCol(CellOps.spreadCol(col("v"))).as("rt"),
        CellOps.spreadCol(col("v")).as("sp"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(0))
      assert(r.getLong(2) == Cells.spread16(r.getLong(0)))
    }
  }

  test("buffer == union of sequential disks, edge-clipped") {
    import graft.index.CellOps
    val res = 5
    val cells = synthCells(res, 0.12, seed = 9)
    for (k <- Seq(0, 1, 2)) {
      val got = CellOps.buffer(cells.toSeq.toDF("cell"), res, k)
        .collect().map(_.getLong(0)).toSet
      val want = cells.flatMap(c => Cells.disk(c, k))
      assert(got == want, s"k=$k")
    }
  }

  test("density == per-cell sequential disk-splat count, duplicates weighted") {
    import graft.index.CellOps
    val res = 5
    val rnd = new scala.util.Random(4)
    // duplicates on purpose: density is point-weighted, not set-weighted
    val pts = Seq.fill(300)(Cells.pack(rnd.nextInt(32), rnd.nextInt(32), res))
    for (k <- Seq(0, 1, 2)) {
      val got = CellOps.density(pts.toDF("cell"), res, k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = pts.flatMap(c => Cells.disk(c, k))
        .groupBy(identity).map { case (c, v) => c -> v.size.toLong }
      assert(got == want, s"k=$k")
    }
  }

  test("uncompact of a coarse cell enumerates the 4^k descendants") {
    val c = Cells.pack(2, 3, 2)
    val got = CellCompact.uncompact(Seq(c).toDF("cell"), 4)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 16)
    assert(got.forall(d => Cells.res(d) == 4 && Cells.parent(d, 2) == c))
  }
}
