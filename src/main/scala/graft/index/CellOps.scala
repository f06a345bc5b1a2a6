package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column-level (codegen'd, pure bit-arithmetic) cell-set operations that
 * complement the scalar [[Cells]] helpers: Morton de-interleave as
 * Column expressions, and cell-set BUFFERING (Chebyshev dilation by k
 * rings) — the AOI-expansion primitive ("everything within k cells of
 * the coverage") used as a proximity prefilter before exact geometry.
 * Same clipping semantics as [[Cells.disk]]: out-of-range neighbors are
 * excluded, not clamped.
 *
 * Scale shape: explode((2k+1)^2 literal offsets) + one distinct — a
 * generator and one hash agg, no join; output is bounded by
 * |cells| * (2k+1)^2 before the distinct collapses interior overlap.
 */
object CellOps {

  private val MortonMask = 0x00FFFFFFFFFFFFFFL

  /** Inverse of [[Cells.spread16]] as a Column (bits at even positions
    * collected down). */
  def unspreadCol(v: Column): Column = {
    val a = v.bitwiseAND(lit(0x55555555L))
    val b = a.bitwiseOR(shiftrightunsigned(a, 1)).bitwiseAND(lit(0x33333333L))
    val c = b.bitwiseOR(shiftrightunsigned(b, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftrightunsigned(c, 4)).bitwiseAND(lit(0x00FF00FFL))
    d.bitwiseOR(shiftrightunsigned(d, 8)).bitwiseAND(lit(0x0000FFFFL))
  }

  /** [[Cells.spread16]] as a Column (low 16 bits spread to even
    * positions). */
  def spreadCol(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  def cellCx(cell: Column): Column = unspreadCol(cell.bitwiseAND(lit(MortonMask)))
  def cellCy(cell: Column): Column =
    unspreadCol(shiftrightunsigned(cell.bitwiseAND(lit(MortonMask)), 1))

  /** Box-kernel point DENSITY raster: every input row (column `cell` at
    * resolution `res`, duplicates meaningful — one per point) splats a
    * +1 into each cell of its Chebyshev-k disk; output is (cell, n) —
    * the count of points within k cells, the classic smoothed heatmap
    * surface. Same shape as [[buffer]] plus a map-side-combined count
    * (generator + ONE hash agg, no join); kernel footprint (2k+1)^2
    * bounds the fan-out exactly. */
  def density(cells: DataFrame, res: Int, k: Int): DataFrame =
    dilated(cells, res, k).groupBy("cell").agg(count(lit(1)).as("n"))

  /** Buffer a single-resolution cell set (column `cell` at resolution
    * `res`) by Chebyshev distance k: the union of every cell's
    * (2k+1)^2 disk, edge-clipped, distinct. */
  def buffer(cells: DataFrame, res: Int, k: Int): DataFrame =
    dilated(cells, res, k).distinct()

  /** The dilation generator shared by [[density]] (count tail) and
    * [[buffer]] (distinct tail): de-interleave each input cell, splat
    * its (2k+1)^2 Chebyshev disk, edge-clip, re-pack — one row per
    * (input row, kernel offset), duplicates preserved. */
  private def dilated(cells: DataFrame, res: Int, k: Int): DataFrame = {
    require(res >= 0 && res <= Cells.MaxRes, s"bad res=$res")
    require(k >= 0, s"bad k=$k")
    val n = 1L << res
    val offs = for (dy <- -k to k; dx <- -k to k)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    cells
      .select(cellCx(col("cell")).as("cx"), cellCy(col("cell")).as("cy"))
      .select(col("cx"), col("cy"), explode(array(offs: _*)).as("o"))
      .select((col("cx") + col("o.dx")).as("nx"), (col("cy") + col("o.dy")).as("ny"))
      .filter(col("nx") >= 0L && col("nx") < n && col("ny") >= 0L && col("ny") < n)
      .select(shiftleft(lit(res.toLong), 56)
        .bitwiseOR(spreadCol(col("nx")))
        .bitwiseOR(shiftleft(spreadCol(col("ny")), 1)).as("cell"))
  }
}
