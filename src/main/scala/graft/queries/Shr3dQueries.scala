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

  /** Fixed side-table root for the staged-input oracle below. */
  final val SideRoot = "/tmp/graft_shr3d_side"

  /** W16/J3 per-cell classification, bit-exact over STAGED inputs: the
    * facade's dsm/dtm/dsm2 products are dumped to parquet side-tables
    * (the DTM itself is the iterative loop pinned by DtmSpec's dense
    * oracle + golden parquet — no SQL dual exists for it), and the
    * DuckDB dual replays the cross-grid when/otherwise classification
    * over the same bytes. */
  val q_shr3d_class: QueryDef = {
    // aglRaw at the query's config: aglMeters 6.0 at the standard fit
    val aglRaw = math.max(1,
      math.floor(6.0 / graft.core.Quant.Scale).toInt)
    QueryDef.sqlChecked(
      "q_shr3d_class",
      s"""WITH dsm AS (SELECT * FROM '$SideRoot/dsm/*.parquet'),
         |dtm AS (SELECT * FROM '$SideRoot/dtm/*.parquet'),
         |var2 AS (SELECT * FROM '$SideRoot/dsm2/*.parquet')
         |SELECT d.gx, d.gy,
         |  CASE WHEN (d.v - COALESCE(t.v, d.v)) > $aglRaw AND v2.v IS NOT NULL THEN 6
         |       WHEN (d.v - COALESCE(t.v, d.v)) > $aglRaw THEN 5
         |       ELSE 2 END AS cls
         |FROM dsm d
         |LEFT JOIN dtm t ON t.gx = d.gx AND t.gy = d.gy
         |LEFT JOIN var2 v2 ON v2.gx = d.gx AND v2.gy = d.gy
         |ORDER BY d.gx, d.gy""".stripMargin) { (s, dir) =>
      val p = products(s, dir)
      p.dsm.write.mode("overwrite").parquet(s"$SideRoot/dsm")
      p.dtm.write.mode("overwrite").parquet(s"$SideRoot/dtm")
      p.dsm2.write.mode("overwrite").parquet(s"$SideRoot/dsm2")
      p.classification.orderBy(col("gx"), col("gy"))
    }
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
