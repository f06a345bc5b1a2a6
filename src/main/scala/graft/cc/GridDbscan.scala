package graft.cc

import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Grid DBSCAN — density-based clustering of a point set on the cell
 * lattice (Ester et al. 1996, the grid-accelerated form): a cell is
 * CORE when the point count over its 3×3 neighborhood reaches `minPts`;
 * clusters are the 8-connected components of the core cells; an
 * occupied non-core cell adjacent to a core cell is a BORDER cell of
 * that cluster (smallest adjacent core label — deterministic, no
 * "first-reached" order dependence); everything else is NOISE.
 *
 * This is the SHR3D object-grouping machinery re-aimed at clustering:
 * the density pass is the same splat-then-aggregate shape as the
 * stencil kernels (9× explode + one hash agg, shuffle bounded by
 * OCCUPIED cells, not points — the points were already collapsed to
 * per-cell counts), and the cluster pass IS
 * [[ConnectedComponents.label]] (two-pass tiled CCL, labels = min
 * row-major cell id). Border attachment is one more splat + cell-keyed
 * equi-join. Nothing touches a per-point row after the first count
 * aggregate, so 10^12 points cost one map-side-combined count plus
 * grid-bounded stages.
 */
object GridDbscan {

  private val offs: Column = array(
    (for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)

  /** `cells`: (gx: long, gy: long, cnt: long) occupied-cell counts.
    * Returns (gx, gy, cnt, density, role ∈ core|border|noise,
    * label: long, null for noise). */
  def cluster(cells: DataFrame, bounds: Bounds, minPts: Long,
              tileSize: Int = 128): DataFrame = {
    val nbr = cells.select(col("gx"), col("gy"), col("cnt"),
        explode(offs).as("o"))
      .groupBy((col("gx") + col("o.dx")).as("gx"),
        (col("gy") + col("o.dy")).as("gy"))
      .agg(sum(col("cnt")).as("density"))
    // Pin the occupied-cell density table and the label tables once:
    // occ feeds four output branches (core/border×2/noise) and labeled/
    // coreNbr two each — unpinned, every branch re-ran the density
    // splat-aggregate (and the caller's per-point count) through its own
    // broadcast subtree. All three frames are grid-bounded (occupied
    // cells), so materializing them is safe at any input scale — the
    // same bound that makes the whole grid-DBSCAN shape work.
    val occ = cells.join(nbr, Seq("gx", "gy")).localCheckpoint(eager = true)

    val core = occ.filter(col("density") >= minPts)
    val labeled = ConnectedComponents
      .label(core.select(col("gx"), col("gy"), lit(0).as("v")), bounds,
        tileSize)
      .select(col("gx"), col("gy"), col("label"))
      .localCheckpoint(eager = true)

    // min core label over each cell's 3x3 — read by border cells only
    val coreNbr = labeled.select(col("gx"), col("gy"), col("label"),
        explode(offs).as("o"))
      .groupBy((col("gx") + col("o.dx")).as("gx"),
        (col("gy") + col("o.dy")).as("gy"))
      .agg(min(col("label")).as("_blabel"))
      .localCheckpoint(eager = true)

    val nonCore = occ.filter(col("density") < minPts)
    val coreOut = occ.filter(col("density") >= minPts)
      .join(labeled, Seq("gx", "gy"))
      .select(col("gx"), col("gy"), col("cnt"), col("density"),
        lit("core").as("role"), col("label"))
    val borderOut = nonCore.join(coreNbr, Seq("gx", "gy"))
      .select(col("gx"), col("gy"), col("cnt"), col("density"),
        lit("border").as("role"), col("_blabel").as("label"))
    val noiseOut = nonCore.join(coreNbr, Seq("gx", "gy"), "left_anti")
      .select(col("gx"), col("gy"), col("cnt"), col("density"),
        lit("noise").as("role"), lit(null).cast("long").as("label"))
    coreOut.unionByName(borderOut).unionByName(noiseOut)
  }
}
