package graft.api

import graft.cc.{ConnectedComponents, FillObjectBounds}
import graft.pyramid.FillVoids
import graft.stencil.{Kernels, TileStencil}
import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's DTM core: the iterative multi-scale classifyGround
 * loop (pubgeo `src/shr3d/shr3d.cpp:899-1013`), re-expressed as a
 * checkpointed DataFrame loop.
 *
 * Per the reference:
 *  1. the working DTM starts as the MIN surface and is void-filled
 *     (noSmoothing) to a dense lattice;
 *  2. `iterations` (= 5) passes of:
 *     W13 boundary seeds (`labelObjectBoundaries`, :592-624) ->
 *     W14 extension rounds (`extendObjectBoundaries`, :536-589) ->
 *     G2 dz-connected components with the maxCount region cap
 *     (`groupObjects`, :831-885) ->
 *     G5 interior fill per object (`fillObjectBounds`, :626-788);
 *     every cell any pass touched joins the accumulated VOID mask, is
 *     removed from the DTM, and the holes are pyramid-filled
 *     (noSmoothing except the final iteration, :951-960);
 *  3. DSM-restore: DTM cells at or above the (tree-voided) DSM take the
 *     DSM value and leave the void mask (:963-972);
 *  4. W12 single-cell spike removal joins the void mask (:975-994);
 *  5. all void-mask cells are re-voided and filled once more WITH
 *     smoothing (:996-1003).
 *
 * Returns the final dense DTM and the void mask (the reference's LBL
 * product: mask cell = labeled/removed, absent = ground).
 *
 * Determinism: every stage is partitioning-independent (stencil kernels,
 * canonical CCL chunking, per-object independent fills, exact integer
 * pyramid fills), so the product is bit-identical at any parallelism —
 * asserted by DtmSpec against the committed golden parquet and a dense
 * single-threaded oracle.
 */
object ClassifyGround {

  final case class Config(
      dzRaw: Int, dhBins: Int = 1, iterations: Int = 5,
      maxCount: Long = 40000L, tileSize: Int = 64)

  final case class Result(dtm: DataFrame, voidMask: DataFrame)

  def run(minGrid: DataFrame /* gx, gy, v */,
          solidDsm: DataFrame /* gx, gy, v — DSM with tree cells voided */,
          bounds: Bounds, cfg: Config): Result = {
    val spark = minGrid.sparkSession
    import spark.implicits._
    val dz = cfg.dzRaw
    val tile = cfg.tileSize

    var dtm = FillVoids(minGrid, bounds, noSmoothing = true).localCheckpoint()
    var voidMask = Seq.empty[(Long, Long)].toDF("gx", "gy").localCheckpoint()

    for (k <- 0 until cfg.iterations) {
      // W13 seeds over the evolving DTM
      val seeds = TileStencil(dtm, Kernels.RefBoundaryGradient(dz, cfg.dhBins),
        bounds, tile)
      // W14 extension: dhBins relaxation rounds over (label << 17 | dtm)
      val packed = dtm.join(seeds.select(col("gx"), col("gy"), lit(1).as("lbl")),
          Seq("gx", "gy"), "left")
        .select(col("gx"), col("gy"),
          (coalesce(col("lbl"), lit(0)) * lit(131072) + col("v")).cast("int").as("v"))
      val relaxed = (0 until cfg.dhBins).foldLeft(packed) { (df, _) =>
        val marked = TileStencil(df, Kernels.RefExtendMark(dz), bounds, tile)
        TileStencil(marked, Kernels.RefExtendResolve(dz), bounds, tile)
          .localCheckpoint()
      }
      val objCells = relaxed
        .filter(shiftrightunsigned(col("v").cast("long"), 17) === 1)
        .select(col("gx"), col("gy"),
          col("v").bitwiseAND(lit(0x1FFFF)).cast("int").as("v"))
      // G2: dz-connected labels with the region cap
      val labeled = ConnectedComponents.label(objCells, bounds, tile,
        maxDz = Some(dz), maxCount = Some(cfg.maxCount))
      // G5: per-object interior fill -> this iteration's void cells
      val voided = FillObjectBounds(labeled.select("gx", "gy", "label"),
        dtm, bounds, cfg.dhBins)
      voidMask = voidMask.unionByName(voided).distinct().localCheckpoint()
      val ground = dtm.join(voidMask, Seq("gx", "gy"), "left_anti")
      dtm = FillVoids(ground, bounds,
        noSmoothing = k < cfg.iterations - 1).localCheckpoint()
    }

    // DSM-restore (dtm >= dsm and dsm non-void -> take dsm, leave mask)
    val joined = dtm.withColumnRenamed("v", "tv")
      .join(solidDsm.select(col("gx"), col("gy"), col("v").as("sv")),
        Seq("gx", "gy"), "left")
      .withColumn("restored", col("sv").isNotNull && col("tv") >= col("sv"))
      .localCheckpoint()
    val restoredDtm = joined.select(col("gx"), col("gy"),
      when(col("restored"), col("sv")).otherwise(col("tv")).cast("int").as("v"))
    voidMask = voidMask
      .join(joined.filter(col("restored")).select("gx", "gy"),
        Seq("gx", "gy"), "left_anti")
      .localCheckpoint()

    // W12 spike removal joins the mask
    val despiked = TileStencil(restoredDtm, Kernels.SpikeFilter(dz), bounds, tile)
    val spikes = restoredDtm.join(despiked.select("gx", "gy"),
      Seq("gx", "gy"), "left_anti").select("gx", "gy")
    voidMask = voidMask.unionByName(spikes).distinct().localCheckpoint()

    // final: re-void every masked cell, fill with smoothing
    val finalGround = restoredDtm.join(voidMask, Seq("gx", "gy"), "left_anti")
    val dtmFinal = FillVoids(finalGround, bounds, noSmoothing = false)
      .localCheckpoint()
    Result(dtmFinal, voidMask)
  }
}
