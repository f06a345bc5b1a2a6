package graft.api

import graft.cc.ConnectedComponents
import graft.core.Quant
import graft.grid.Gridding
import graft.pyramid.FillVoids
import graft.stencil.{Kernels, TileStencil}
import graft.stencil.TileStencil.Bounds
import graft.vector.Vectorize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SHR3D facade (reference `src/shr3d/shr3d.cpp`, product DAG in
 * SURVEY.md §3.1): point cloud -> DSM / MIN / DSM2 / DTM /
 * classification / building mask / labels / outline polygons, as lazily
 * composable Dataset products mirroring the reference's memoized
 * `getX()` accessors (`shr3d.h:153-172`).
 *
 * The DTM here is the morphological path (erosion + median + void fill
 * + DSM clamp) rather than the reference's 5-iteration
 * classifyGround/object-scan loop — same product surface, simplified
 * ground model; the object accept/reject passes are represented by the
 * component-size filter on the building mask.
 */
object Shr3d {

  final case class Config(
      spec: Gridding.GridSpec = Gridding.GridSpec(),
      dzMeters: Double = 0.5,
      aglMeters: Double = 2.0,
      maxTreeMeters: Double = 40.0,
      dtmErosionRadius: Int = 6,
      minRegionCells: Int = 2,
      tileSize: Int = 128)

  final class Products(spark: SparkSession, pts: DataFrame, cfg: Config) {
    private val (w, h) = Gridding.boundsFor(cfg.spec)
    private val bounds = Bounds(w, h)
    private val dzRaw = math.max(1, math.floor(cfg.dzMeters / Quant.Scale).toInt)
    private val aglRaw = math.max(1, math.floor(cfg.aglMeters / Quant.Scale).toInt)
    private val maxTreeRaw = math.floor(cfg.maxTreeMeters / Quant.Scale).toInt

    private val gridded = Gridding.points(pts, cfg.spec)

    /** DSM: max-grid -> despike (quantile + well) -> void fill. */
    lazy val dsm: DataFrame = {
      val a1 = Gridding.dsm(gridded)
      val q = TileStencil(a1, Kernels.QuantileFilter(1, 0.4, aglRaw), bounds, cfg.tileSize)
      val wl = TileStencil(q, Kernels.WellFilter(aglRaw), bounds, cfg.tileSize)
      FillVoids(wl, bounds, noSmoothing = false).localCheckpoint()
    }

    /** MIN: min-grid -> median smooth -> void fill. */
    lazy val minGrid: DataFrame = {
      val a1 = Gridding.minGrid(gridded)
      val q = TileStencil(a1, Kernels.QuantileFilter(2, 0.33, aglRaw), bounds, cfg.tileSize)
      FillVoids(q, bounds, noSmoothing = false).localCheckpoint()
    }

    /** DSM2: var = DSM - MIN with the tree filter (W8) applied. Solid
      * surfaces have var ~ 0 (roof: min == max within the cell), so var
      * is stored shifted by +1 to keep zero-spread cells distinct from
      * the void sentinel; thresholds shift accordingly. Cells surviving
      * the filter are "solid or adjacent to solid" (non-canopy). */
    lazy val dsm2: DataFrame = {
      val varGrid = Gridding.zipSubClamp(dsm, minGrid)
        .select(col("gx"), col("gy"), (col("v") + 1).cast("int").as("v"))
      TileStencil(varGrid, Kernels.TreeFilter(maxTreeRaw + 1, dzRaw + 1), bounds, cfg.tileSize)
        .localCheckpoint()
    }

    /** DTM: morphological ground estimate, clamped to <= DSM. */
    lazy val dtm: DataFrame = {
      // erosion radius must exceed half the widest building footprint,
      // or the ground estimate keeps the roof (reference solves this with
      // its multi-scale classifyGround loop)
      val eroded = TileStencil(dsm, Kernels.MinFilter(cfg.dtmErosionRadius, 0),
        bounds, cfg.tileSize)
      val smooth = TileStencil(eroded, Kernels.medianFilter(1, 0), bounds, cfg.tileSize)
      val filled = FillVoids(smooth, bounds, noSmoothing = false)
      filled.withColumnRenamed("v", "tv")
        .join(dsm.withColumnRenamed("v", "sv"), Seq("gx", "gy"), "left")
        .select(col("gx"), col("gy"),
          least(col("tv"), coalesce(col("sv"), col("tv"))).as("v"))
        .localCheckpoint()
    }

    /** Above-ground object cells via the classifyGround path
      * (W13 -> W14 -> G2 -> G5 -> G4), see GroundObjects. */
    lazy val objectCells: DataFrame =
      GroundObjects.acceptByGradient(
        GroundObjects.detect(dsm, bounds,
          GroundObjects.Config(dzRaw = dzRaw, tileSize = cfg.tileSize,
            minRegionCells = cfg.minRegionCells,
            // reference maxCount = 10000/gsd² (shr3d.cpp:913)
            maxCount = math.max(1L,
              (10000.0 / (cfg.spec.gsd * cfg.spec.gsd)).toLong))),
        dsm, dzRaw).localCheckpoint()

    /** DTM via object removal (the reference's classifyGround product,
      * `shr3d.cpp:900-960`): void the detected object cells out of the
      * DSM and pyramid-fill the holes from the surrounding ground. */
    lazy val dtmClassified: DataFrame = {
      val ground = dsm.join(objectCells.select("gx", "gy"), Seq("gx", "gy"),
        "left_anti")
      FillVoids(ground, bounds, noSmoothing = false).localCheckpoint()
    }

    final val ClsGround = 2
    final val ClsTree = 5
    final val ClsBuilding = 6

    /** W16 per-cell classification over the joined grids. */
    lazy val classification: DataFrame = {
      dsm.withColumnRenamed("v", "vDsm")
        .join(dtm.select(col("gx"), col("gy"), col("v").as("vDtm")), Seq("gx", "gy"), "left")
        .join(dsm2.select(col("gx"), col("gy"), col("v").as("vVar")), Seq("gx", "gy"), "left")
        .withColumn("agl", col("vDsm") - coalesce(col("vDtm"), col("vDsm")))
        .withColumn("cls",
          when(col("agl") > aglRaw && col("vVar").isNotNull, lit(ClsBuilding))
            .when(col("agl") > aglRaw, lit(ClsTree))
            .otherwise(lit(ClsGround)))
        .select(col("gx"), col("gy"), col("cls"))
        .localCheckpoint()
    }

    /** Building mask with small regions rejected (G4 min-area). */
    lazy val buildingLabels: DataFrame = {
      val mask = classification.filter(col("cls") === ClsBuilding)
        .select(col("gx"), col("gy"), lit(1).as("v"))
      val labeled = ConnectedComponents.label(mask, bounds, cfg.tileSize)
      val sizes = labeled.groupBy("label").agg(count(lit(1)).as("n"))
        .filter(col("n") >= cfg.minRegionCells)
      labeled.join(sizes.select("label"), Seq("label"), "left_semi")
        .localCheckpoint()
    }

    /** Outline polygons (V1-V3) of the building components. */
    lazy val outlines: DataFrame =
      Vectorize.outlines(buildingLabels, minArea = 0.25)
  }

  def run(spark: SparkSession, pts: DataFrame, cfg: Config = Config()): Products =
    new Products(spark, pts, cfg)
}
