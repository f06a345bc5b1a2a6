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
      maxCount: Long = 40000L, tileSize: Int = 64,
      // strategy gate (like Spark's broadcast threshold): rasters up to
      // this many lattice cells run the whole loop as ONE dense executor
      // task — the reference's own working set fits one node, and ~40
      // tiny Spark stages per iteration cost more than the raster;
      // larger rasters take the tiled distributed path. Both paths are
      // asserted equal in DtmSpec.
      denseThreshold: Long = 1L << 20)

  final case class Result(dtm: DataFrame, voidMask: DataFrame)

  def run(minGrid: DataFrame /* gx, gy, v */,
          solidDsm: DataFrame /* gx, gy, v — DSM with tree cells voided */,
          bounds: Bounds, cfg: Config): Result =
    if (bounds.w.toLong * bounds.h <= cfg.denseThreshold)
      runDense(minGrid, solidDsm, bounds, cfg)
    else runTiled(minGrid, solidDsm, bounds, cfg)

  private def runTiled(minGrid: DataFrame, solidDsm: DataFrame,
                       bounds: Bounds, cfg: Config): Result = {
    val spark = minGrid.sparkSession
    import spark.implicits._
    val dz = cfg.dzRaw
    val tile = cfg.tileSize

    var dtm = FillVoids(minGrid, bounds, noSmoothing = true,
      denseThreshold = 0L).localCheckpoint()
    var voidMask = Seq.empty[(Long, Long)].toDF("gx", "gy").localCheckpoint()
    var maskCount = 0L
    var converged = false

    for (k <- 0 until cfg.iterations if !converged) {
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
      // G2: dz-connected labels with the region cap (distributed — the
      // dense/tiled choice is runTiled-vs-runDense's, made once above)
      val labeled = ConnectedComponents.label(objCells, bounds, tile,
        maxDz = Some(dz), maxCount = Some(cfg.maxCount), denseThreshold = 0L)
      // G5: per-object interior fill -> this iteration's void cells
      val voided = FillObjectBounds(labeled.select("gx", "gy", "label"),
        dtm, bounds, cfg.dhBins)
      voidMask = voidMask.unionByName(voided).distinct().localCheckpoint()
      val n = voidMask.count()
      // Fixpoint early exit — EXACT, not approximate: every stage is a
      // deterministic function of (dtm, voidMask), and dtm is a
      // deterministic function of voidMask, so an iteration that adds
      // no mask cell reproduces itself verbatim; the remaining
      // iterations reduce to the final smoothed fill below.
      converged = n == maskCount && k < cfg.iterations - 1
      maskCount = n
      val ground = dtm.join(voidMask, Seq("gx", "gy"), "left_anti")
      dtm = FillVoids(ground, bounds,
        noSmoothing = !converged && k < cfg.iterations - 1,
        denseThreshold = 0L).localCheckpoint()
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
    val dtmFinal = FillVoids(finalGround, bounds, noSmoothing = false,
      denseThreshold = 0L).localCheckpoint()
    Result(dtmFinal, voidMask)
  }

  // ---- dense single-task strategy --------------------------------------

  private type LMap = java.util.HashMap[java.lang.Long, java.lang.Integer]
  @inline private def key(x: Long, y: Long): Long = (x << 32) | y

  /** The full loop over local maps, reusing the SAME kernel objects and
    * the same per-object fill as the tiled path. */
  private[api] def denseLoop(min: LMap, solid: LMap, w: Int, h: Int,
                             cfg: Config): (LMap, java.util.HashSet[java.lang.Long]) = {
    val dz = cfg.dzRaw
    var dtm = FillVoids.dense(min, w, h, noSmoothing = true)
    val voidMask = new java.util.HashSet[java.lang.Long]()
    def get(m: LMap)(x: Int, y: Int): Int = {
      val v = m.get(key(x, y)); if (v == null) 0 else v.intValue()
    }
    def applyKernel(m: LMap, k: graft.stencil.TileStencil.Kernel): LMap = {
      val out = new LMap()
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val x = (e.getKey >>> 32).toInt; val y = (e.getKey & 0xFFFFFFFFL).toInt
        val nv = k(get(m), x, y, w, h)
        if (nv != 0) out.put(e.getKey, nv)
      }
      out
    }
    var converged = false
    var prevMask = 0
    for (k <- 0 until cfg.iterations if !converged) {
      val seeds = applyKernel(dtm, Kernels.RefBoundaryGradient(dz, cfg.dhBins))
      var packed = new LMap()
      val dIt = dtm.entrySet().iterator()
      while (dIt.hasNext) {
        val e = dIt.next()
        val lbl = if (seeds.containsKey(e.getKey)) 1 else 0
        packed.put(e.getKey, lbl * 131072 + e.getValue.intValue())
      }
      for (_ <- 0 until cfg.dhBins) {
        packed = applyKernel(packed, Kernels.RefExtendMark(dz))
        packed = applyKernel(packed, Kernels.RefExtendResolve(dz))
      }
      // local CCL with dz + canonical chunk crop
      val objCells = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
      val pIt = packed.entrySet().iterator()
      while (pIt.hasNext) {
        val e = pIt.next()
        if ((e.getValue.intValue() >>> 17) == 1)
          objCells.put(e.getKey, e.getValue.intValue() & 0x1FFFF)
      }
      val cellIds = new java.util.ArrayList[java.lang.Long](objCells.keySet())
      java.util.Collections.sort(cellIds,
        java.util.Comparator.comparingLong((kk: java.lang.Long) =>
          (kk & 0xFFFFFFFFL) * w + (kk >>> 32)))
      val seen = new java.util.HashSet[java.lang.Long]()
      val objects = scala.collection.mutable.ArrayBuffer[Array[Long]]()
      val cIt = cellIds.iterator()
      while (cIt.hasNext) {
        val start = cIt.next()
        if (!seen.contains(start)) {
          val comp = scala.collection.mutable.ArrayBuffer[Long]()
          val q = new java.util.ArrayDeque[java.lang.Long]()
          q.add(start); seen.add(start)
          while (!q.isEmpty) {
            val cur = q.poll()
            comp += cur.longValue()
            val cx = cur >>> 32; val cy = cur & 0xFFFFFFFFL
            val cv = objCells.get(cur).intValue()
            var dx = -1
            while (dx <= 1) {
              var dy = -1
              while (dy <= 1) {
                if (dx != 0 || dy != 0) {
                  val nk: java.lang.Long = key(cx + dx, cy + dy)
                  val nv = objCells.get(nk)
                  if (nv != null && !seen.contains(nk) &&
                    math.abs(nv.intValue() - cv) <= dz) {
                    seen.add(nk); q.add(nk)
                  }
                }
                dy += 1
              }
              dx += 1
            }
          }
          comp.sortInPlaceBy(kk => (kk & 0xFFFFFFFFL) * w + (kk >>> 32))
          objects ++= comp.grouped(math.min(cfg.maxCount, Int.MaxValue).toInt).map(_.toArray)
        }
      }
      // per-object fill via the shared fillOne
      val m = cfg.dhBins + 1
      for (obj <- objects) {
        var xmin = Long.MaxValue; var xmax = Long.MinValue
        var ymin = Long.MaxValue; var ymax = Long.MinValue
        val objSet = new java.util.HashSet[java.lang.Long]()
        obj.foreach { kk =>
          objSet.add(kk)
          val x = kk >>> 32; val y = kk & 0xFFFFFFFFL
          if (x < xmin) xmin = x
          if (x > xmax) xmax = x
          if (y < ymin) ymin = y
          if (y > ymax) ymax = y
        }
        val cells = scala.collection.mutable.ArrayBuffer[FillObjectBounds.CellIn]()
        var y = math.max(0L, ymin - m)
        val yMax = math.min(ymax + m, h - 1L)
        val xMin = math.max(0L, xmin - m)
        val xMax = math.min(xmax + m, w - 1L)
        while (y <= yMax) {
          var x = xMin
          while (x <= xMax) {
            val v = dtm.get(key(x, y))
            if (v != null)
              cells += FillObjectBounds.CellIn(0L, x, y, v.intValue(),
                objSet.contains(key(x, y)))
            x += 1
          }
          y += 1
        }
        FillObjectBounds.fillOne(cells.toArray, w, h, cfg.dhBins)
          .foreach { case (x, yy) => voidMask.add(key(x, yy)) }
      }
      converged = voidMask.size == prevMask && k < cfg.iterations - 1
      prevMask = voidMask.size
      val ground = new LMap(dtm)
      val vIt = voidMask.iterator()
      while (vIt.hasNext) ground.remove(vIt.next())
      dtm = FillVoids.dense(ground, w, h,
        noSmoothing = !converged && k < cfg.iterations - 1)
    }
    // restore, spikes, final fill — identical order to the tiled path
    val rIt = dtm.entrySet().iterator()
    val restored = scala.collection.mutable.ArrayBuffer[(java.lang.Long, Int)]()
    while (rIt.hasNext) {
      val e = rIt.next()
      val sv = solid.get(e.getKey)
      if (sv != null && e.getValue.intValue() >= sv.intValue())
        restored += ((e.getKey, sv.intValue()))
    }
    restored.foreach { case (kk, sv) => dtm.put(kk, sv); voidMask.remove(kk) }
    val despiked = applyKernel(dtm, Kernels.SpikeFilter(dz))
    val sIt = dtm.keySet().iterator()
    val spikes = scala.collection.mutable.ArrayBuffer[java.lang.Long]()
    while (sIt.hasNext) {
      val kk = sIt.next()
      if (!despiked.containsKey(kk)) spikes += kk
    }
    spikes.foreach(voidMask.add)
    val finalGround = new LMap(dtm)
    val fIt = voidMask.iterator()
    while (fIt.hasNext) finalGround.remove(fIt.next())
    (FillVoids.dense(finalGround, w, h, noSmoothing = false), voidMask)
  }

  private def runDense(minGrid: DataFrame, solidDsm: DataFrame,
                       bounds: Bounds, cfg: Config): Result = {
    val spark = minGrid.sparkSession
    import spark.implicits._
    val tagged = minGrid.select(lit(0).as("t"), col("gx").cast("long"),
        col("gy").cast("long"), col("v").cast("int"))
      .unionByName(solidDsm.select(lit(1).as("t"), col("gx").cast("long"),
        col("gy").cast("long"), col("v").cast("int")))
      .as[(Int, Long, Long, Int)]
    val w = bounds.w; val h = bounds.h
    val out = tagged.repartition(1).mapPartitions { it =>
      val min = new LMap(); val solid = new LMap()
      it.foreach { case (t, x, y, v) =>
        (if (t == 0) min else solid).put(key(x, y), v)
      }
      if (min.isEmpty) Iterator.empty
      else {
        val (dtm, mask) = denseLoop(min, solid, w, h, cfg)
        val o = Array.newBuilder[(Int, Long, Long, Int)]
        val dIt = dtm.entrySet().iterator()
        while (dIt.hasNext) {
          val e = dIt.next()
          o += ((0, e.getKey >>> 32, e.getKey & 0xFFFFFFFFL, e.getValue.intValue()))
        }
        val mIt = mask.iterator()
        while (mIt.hasNext) {
          val kk = mIt.next()
          o += ((1, kk >>> 32, kk & 0xFFFFFFFFL, 0))
        }
        o.result().iterator
      }
    }.toDF("t", "gx", "gy", "v").localCheckpoint()
    Result(
      out.filter(col("t") === 0).select(col("gx"), col("gy"), col("v")),
      out.filter(col("t") === 1).select(col("gx"), col("gy")))
  }
}
