package graft.queries

import graft.api.Shr3d
import graft.core.{Geo, Tables}
import graft.grid.Gridding
import org.apache.spark.sql.functions._

/** The full SHR3D product pipeline over the geocoded doc cloud on the
  * coarse grid (rows-only: the composed semantics are covered by
  * Shr3dSpec + the per-operator SQL oracles upstream). */
object Shr3dQueries {

  private def products(s: org.apache.spark.sql.SparkSession, dir: String) =
    Shr3d.run(s,
      Geo.withGeo(Tables.documents(s, dir)).select("lon", "lat", "z"),
      Shr3d.Config(spec = Gridding.GridSpec(gsd = 10.0), tileSize = 16,
        aglMeters = 6.0, minRegionCells = 2,
        // the doc cloud's building cells are scatter, not solid masks —
        // W15 opening would (correctly) erase them all
        openLabels = false))

  val q_shr3d_class: QueryDef = QueryDef.rowsOnly("q_shr3d_class") { (s, dir) =>
    products(s, dir).classification.orderBy(col("gx"), col("gy"))
  }

  val q_shr3d_outlines: QueryDef = QueryDef.rowsOnly("q_shr3d_outlines") { (s, dir) =>
    products(s, dir).outlines.orderBy(col("label"))
  }

  /** The reference DTM (5-iteration classifyGround loop + mirror/median
    * + final fill). Rows-only for the driver (no SQL dual exists for an
    * iterative raster loop); exact semantics are pinned by DtmSpec's
    * dense single-threaded oracle and the committed golden parquet. */
  val q_shr3d_dtm: QueryDef = QueryDef.rowsOnly("q_shr3d_dtm") { (s, dir) =>
    products(s, dir).dtm.orderBy(col("gx"), col("gy"))
  }

  /** V3 buildingSimplify outlines (findCorners -> addMissingPoints ->
    * improvePoints least-squares refit -> vwReduce) over the opened
    * high-cell mask. Rows-only: the pipeline's exact geometry is pinned
    * by VectorStressSpec's rectilinear exact-WKT fixpoint tests. */
  val q_outlines_v3: QueryDef = QueryDef.rowsOnly("q_outlines_v3") { (s, dir) =>
    import graft.cc.ConnectedComponents
    import graft.grid.Gridding
    import graft.stencil.{Kernels, TileStencil}
    val spec10 = Gridding.GridSpec(gsd = 10.0)
    val (w, h) = Gridding.boundsFor(spec10)
    val bounds = TileStencil.Bounds(w, h)
    val dsm = Gridding.dsm(Gridding.points(
      Geo.withGeo(Tables.documents(s, dir)), spec10))
    val mask = dsm.filter(col("v") > 40000)
      .select(col("gx"), col("gy"), org.apache.spark.sql.functions.lit(1).as("v"))
    val packed = TileStencil(mask, Kernels.MaskErodePack(), bounds, 8)
    val opened = TileStencil(packed, Kernels.MaskOpenResolve(), bounds, 8)
    val labeled = ConnectedComponents.label(opened, bounds, 16)
    graft.vector.Vectorize.outlinesSimplified(labeled, scale = 4)
      .orderBy(col("label"))
  }

  val all: Seq[QueryDef] =
    Seq(q_shr3d_class, q_shr3d_outlines, q_outlines_v3, q_shr3d_dtm)
}
