package graft

import graft.stencil.{Kernels, TileStencil}
import graft.stencil.TileStencil.{Bounds, Kernel}

/** The tile/halo machinery must be execution-equivalent to a trivial
  * dense single-threaded evaluation of the same kernel — across tile
  * sizes, densities, and partitionings. */
class StencilSpec extends SparkSpec {

  private def randomCells(seed: Int, w: Int, h: Int, density: Double): Seq[(Long, Long, Int)] = {
    val r = new scala.util.Random(seed)
    (for {
      y <- 0 until h; x <- 0 until w
      if r.nextDouble() < density
    } yield (x.toLong, y.toLong, 1 + r.nextInt(65535))).toSeq
  }

  /** Direct dense evaluation: kernel applied cell-by-cell, no tiling. */
  private def dense(cells: Seq[(Long, Long, Int)], k: Kernel, b: Bounds,
                    all: Boolean): Seq[(Long, Long, Int)] = {
    val m = cells.map(c => (c._1, c._2) -> c._3).toMap
    def get(x: Int, y: Int): Int = m.getOrElse((x.toLong, y.toLong), 0)
    val coords =
      if (all) for (y <- 0 until b.h; x <- 0 until b.w) yield (x.toLong, y.toLong)
      else cells.map(c => (c._1, c._2))
    coords.flatMap { case (x, y) =>
      val v = k(get, x.toInt, y.toInt, b.w, b.h)
      if (v != 0) Some((x, y, v)) else None
    }
  }

  private val kernels: Seq[(String, Kernel)] = Seq(
    "quantile(1,0.4)" -> Kernels.QuantileFilter(1, 0.4, 300),
    "median(2)" -> Kernels.medianFilter(2, 500),
    "min(2)" -> Kernels.MinFilter(2, 100),
    "max(1)" -> Kernels.MaxFilter(1, 100),
    "edge" -> Kernels.EdgeFilter(5000),
    "well" -> Kernels.WellFilter(1000),
    "spike" -> Kernels.SpikeFilter(1000),
    "tree" -> Kernels.TreeFilter(30000, 1500))

  for ((name, k) <- kernels; density <- Seq(0.25, 0.9); tile <- Seq(7, 16, 128)) {
    test(s"$name == dense (density=$density, tile=$tile)") {
      import spark.implicits._
      val b = Bounds(48, 37)
      val cells = randomCells(42 + name.hashCode % 97, b.w, b.h, density)
      val df = cells.toDF("gx", "gy", "v").repartition(5)
      val got = TileStencil(df, k, b, tileSize = tile)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      val want = dense(cells, k, b, all = k.writesVoids).sorted
      assert(got == want, s"${got.size} vs ${want.size} cells")
    }
  }

  test("edge filter at image border clamps like the reference") {
    import spark.implicits._
    val b = Bounds(4, 4)
    // uniform values: no kill anywhere, including corners (out-of-bounds
    // neighbors are omitted, not treated as void)
    val cells = (for (y <- 0 until 4; x <- 0 until 4) yield (x.toLong, y.toLong, 100)).toSeq
    val out = TileStencil(cells.toDF("gx", "gy", "v"), Kernels.EdgeFilter(10), b, 2)
      .collect()
    assert(out.length == 16)
  }
}
