package graft.grid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Raster resampling beyond the nearest-neighbor upsample the void-fill
 * pyramid uses (pubgeo `shr3d.cpp`'s coarse-to-fine loop copies parents;
 * SURVEY.md §2.7 M2): an EXACT-integer bilinear 2x upsample with
 * half-pixel centers — the interpolation a DSM overview/serving stack
 * runs when it wants smooth zoom instead of blocky parent copies.
 *
 * Arithmetic: child (ux, uy) sits at parent position (ux/2 - 0.25,
 * uy/2 - 0.25), so per axis it mixes two parents with weights (1/4, 3/4)
 * and in 2D four parents with weights {9, 3, 3, 1}/16 — all
 * fixed-denominator rationals, so the whole filter is integer math
 * (weighted sum >> 4) and bit-exact across engines; no floats anywhere.
 *
 * Execution shape (the splat trick, same as [[Gridding]]'s 2x2 max
 * splat): instead of each child looking UP its 4 parents (a join per
 * tap), each parent PUSHES its 16 weighted contributions (4 child
 * columns x 4 child rows it participates in) and one hash aggregate
 * keyed by child cell folds them — one explode + one map-side-combined
 * aggregation, no join, no stencil halo. Children missing any of their
 * 4 parents (grid border, void neighbors) are dropped by the
 * full-support gate `count(*) = 4`, the standard nodata convention for
 * an interpolating filter.
 */
object Resample {

  /** Per-axis contribution weight of parent p to child 2p + d for
    * d in {-1, 0, 1, 2}: {1, 3, 3, 1} (see class doc). */
  private val taps = for {
    dx <- -1 to 2
    dy <- -1 to 2
  } yield (dx, dy, wt(dx) * wt(dy))

  private def wt(d: Int): Int = if (d == 0 || d == 1) 3 else 1

  /** Bilinear 2x upsample of a sparse cell table (gx, gy, v) with v > 0.
    * Returns (ux, uy, v) for every child with full 4-parent support. */
  def upsample2xBilinear(cells: DataFrame): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val tapDf = broadcast(taps.toDF("dx", "dy", "w"))
    cells.select(col("gx").cast("long"), col("gy").cast("long"),
        col("v").cast("long"))
      .crossJoin(tapDf)
      .select(
        (col("gx") * 2 + col("dx")).as("ux"),
        (col("gy") * 2 + col("dy")).as("uy"),
        (col("w") * col("v")).as("wv"))
      .groupBy("ux", "uy")
      .agg(count(lit(1)).as("n"), sum("wv").as("swv"))
      .filter(col("n") === 4)
      .select(col("ux"), col("uy"),
        shiftright(col("swv"), 4).cast("int").as("v"))
  }
}
