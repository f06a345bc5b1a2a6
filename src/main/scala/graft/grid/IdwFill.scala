package graft.grid

import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inverse-distance-weighted void interpolation — the classic
 * geostatistics fill, complementing the pyramid fill
 * ([[graft.pyramid.FillVoids]], pubgeo `shr3d.cpp:252-329` fills voids
 * from coarser levels; IDW fills from the in-level neighborhood): every
 * empty lattice cell within Chebyshev radius R of data takes
 * `Σ v·w / Σ w` over its occupied neighbors with `w = 1/d²`.
 *
 * Exactness: true 1/d² weights are irrational ratios once summed, so
 * engines would disagree in the last ulp; instead the weights are the
 * FIXED-POINT integers `w(dx,dy) = scale div (dx²+dy²)` (scale = 2^20)
 * — a deterministic quantization shared by the SQL dual, making num,
 * den, and the filled value `num div den` exact BIGINTs.
 *
 * Scale shape: INVERTED gather — each occupied cell SPLATS (v·w, w)
 * contributions to its (2R+1)²−1 neighbor positions (one explode of a
 * 48-literal offset array, codegen'd) followed by one hash aggregate;
 * void cells are wherever weight landed that no data occupies
 * (anti-join on the cell key). No per-void neighborhood search, no
 * range join: cost is 48× the OCCUPIED cells, independent of raster
 * area — the same aggregate-then-splat argument as [[Gridding.dsm]].
 */
object IdwFill {

  /** `cells`: (gx, gy, v) occupied integer-valued cells. Returns the
    * filled voids (gx, gy, v, n_src) — in-bounds empty cells with at
    * least one occupied neighbor within `radius`. */
  def fill(cells: DataFrame, bounds: Bounds, radius: Int = 3,
           scale: Long = 1L << 20): DataFrame = {
    require(radius >= 1, "radius >= 1")
    val offs = for {
      dx <- -radius to radius; dy <- -radius to radius
      if dx != 0 || dy != 0
    } yield (dx.toLong, dy.toLong, scale / (dx.toLong * dx + dy.toLong * dy))
    val offCol = array(offs.map { case (dx, dy, w) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(w).as("w")) }: _*)
    val splat = cells
      .select(col("gx"), col("gy"), col("v").cast("long").as("v"),
        explode(offCol).as("o"))
      .select((col("gx") + col("o.dx")).as("gx"),
        (col("gy") + col("o.dy")).as("gy"),
        (col("v") * col("o.w")).as("vw"), col("o.w").as("w"))
      .filter(col("gx") >= 0 && col("gx") < bounds.w &&
        col("gy") >= 0 && col("gy") < bounds.h)
      .groupBy("gx", "gy")
      .agg(sum(col("vw")).as("num"), sum(col("w")).as("den"),
        count(lit(1)).as("n_src"))
    splat.join(cells.select("gx", "gy"), Seq("gx", "gy"), "left_anti")
      .select(col("gx"), col("gy"), expr("num div den").as("v"),
        col("n_src"))
  }

  /** The offset/weight table as SQL VALUES rows — shared with the
    * DuckDB dual so both engines quantize identically. */
  def offsetsSql(radius: Int, scale: Long = 1L << 20): String =
    (for {
      dx <- -radius to radius; dy <- -radius to radius
      if dx != 0 || dy != 0
    } yield s"($dx, $dy, ${scale / (dx.toLong * dx + dy.toLong * dy)})")
      .mkString(", ")
}
