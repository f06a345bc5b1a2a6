package graft.pyramid

import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * fillVoidsPyramid (SURVEY.md §2.7 M1; pubgeo
 * `src/common/orthoimage.h:447-543`): build a coarsening pyramid while
 * voids remain, then fill voids top-down from the coarser levels.
 *
 * Re-specification over the sparse int cell table (this engine's frozen
 * spec, mirrored by the dense oracle in tests):
 *  - Coarse level k+1 has size (floor(w/2), floor(h/2)). Coarse cell
 *    (j, i) averages the non-void fine cells in the 3x3 block centered
 *    at (2j+1, 2i+1), clamped in-bounds; mean = floor(sum / count).
 *  - Fill-down for a void fine cell (x, y):
 *      noSmoothing: the single parent (x/2, y/2) value;
 *      smoothing: floor(sum(w*v) / sum(w)) over the non-void 3x3 parent
 *      block centered at (x/2, y/2) with weights center=4, cross=2,
 *      diagonal=1.
 *  - Cells whose entire parent block is void stay void (possible only
 *    when maxLevel stops the pyramid early).
 *
 * Spark shape: the up-phase is an A1-style splat (each fine cell feeds
 * <=4 coarse cells) + hash aggregate; the down-phase joins the level
 * lattice against its (tiny, broadcastable) parent level. Each level is
 * localCheckpoint'ed — the loop would otherwise stack ~log2(maxdim)
 * plan copies (SURVEY.md §7.4 risk 6).
 *
 * Strategy gate (like Spark's broadcast threshold): lattices up to
 * `denseThreshold` cells run the whole pyramid as ONE executor task —
 * ~2 jobs instead of ~3·log2(maxdim) — via the same dense algorithm
 * the oracle uses; bigger lattices take the distributed path. The two
 * are asserted equal in PyramidSpec.
 */
object FillVoids {

  final case class Cell(gx: Long, gy: Long, v: Int)

  private def asCells(df: DataFrame): Dataset[Cell] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("gx").cast("long"), col("gy").cast("long"),
      col("v").cast("int")).as[Cell]
  }

  private type LMap = java.util.HashMap[java.lang.Long, java.lang.Integer]
  @inline private def key(x: Long, y: Long): Long = (x << 32) | y

  /** The dense single-task pyramid — the exact same spec over a local
    * map (also reused by ClassifyGround's dense strategy). */
  def dense(g0: LMap, w: Int, h: Int, noSmoothing: Boolean,
            maxLevel: Int = 32): LMap = {
    var levels = List((g0, w, h))
    var k = 0
    while (k < maxLevel && levels.head._2 / 2 >= 1 && levels.head._3 / 2 >= 1 &&
      levels.head._1.size < levels.head._2.toLong * levels.head._3) {
      val (g, lw, lh) = levels.head
      val cw = lw / 2; val ch = lh / 2
      val coarse = new LMap()
      var j = 0L
      while (j < cw) {
        var i = 0L
        while (i < ch) {
          var sum = 0L; var cnt = 0
          var dx = -1
          while (dx <= 1) {
            var dy = -1
            while (dy <= 1) {
              val x = 2 * j + 1 + dx; val y = 2 * i + 1 + dy
              if (x >= 0 && x < lw && y >= 0 && y < lh) {
                val v = g.get(key(x, y))
                if (v != null) { sum += v.intValue(); cnt += 1 }
              }
              dy += 1
            }
            dx += 1
          }
          if (cnt > 0) coarse.put(key(j, i), Math.floorDiv(sum, cnt).toInt)
          i += 1
        }
        j += 1
      }
      levels ::= ((coarse, cw, ch))
      k += 1
    }
    var filled = levels.head._1
    for ((g, lw, lh) <- levels.tail) {
      val out = new LMap(g)
      var y = 0L
      while (y < lh) {
        var x = 0L
        while (x < lw) {
          if (!g.containsKey(key(x, y))) {
            if (noSmoothing) {
              val p = filled.get(key(x / 2, y / 2))
              if (p != null) out.put(key(x, y), p)
            } else {
              var sw = 0L; var swv = 0L
              val offs = Array((-1, -1, 1), (0, -1, 2), (1, -1, 1), (-1, 0, 2),
                (0, 0, 4), (1, 0, 2), (-1, 1, 1), (0, 1, 2), (1, 1, 1))
              var oi = 0
              while (oi < offs.length) {
                val (dx, dy, wt) = offs(oi)
                val p = filled.get(key(x / 2 + dx, y / 2 + dy))
                if (p != null) { sw += wt; swv += wt.toLong * p.intValue() }
                oi += 1
              }
              if (sw > 0) out.put(key(x, y), Math.floorDiv(swv, sw).toInt)
            }
          }
          x += 1
        }
        y += 1
      }
      filled = out
    }
    filled
  }

  /** One coarsening step: fine cells -> coarse means. */
  def coarsen(cells: Dataset[Cell], fine: Bounds): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val cw = fine.w / 2; val ch = fine.h / 2
    cells.flatMap { c =>
      // coarse j with |gx - (2j+1)| <= 1  <=>  j in {floor((gx-1)/2), floor(gx/2)}
      val js = Set(Math.floorDiv(c.gx - 1, 2), Math.floorDiv(c.gx, 2))
        .filter(j => j >= 0 && j < cw)
      val is = Set(Math.floorDiv(c.gy - 1, 2), Math.floorDiv(c.gy, 2))
        .filter(i => i >= 0 && i < ch)
      for (j <- js; i <- is) yield (j, i, c.v)
    }.toDF("gx", "gy", "v")
      .groupBy("gx", "gy")
      .agg(floor(sum("v") / count(lit(1))).cast("int").as("v"))
  }

  /** Default strategy-gate size (lattice cells). */
  final val DefaultDenseThreshold: Long = 1L << 20

  /** Full pyramid fill. Returns the level-0 grid with voids filled
    * (columns gx, gy, v). */
  def apply(cells: DataFrame, bounds: Bounds, noSmoothing: Boolean = false,
            maxLevel: Int = 32,
            denseThreshold: Long = DefaultDenseThreshold): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._

    if (bounds.w.toLong * bounds.h <= denseThreshold) {
      return asCells(cells).repartition(1).mapPartitions { it =>
        val g = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
        it.foreach(c => g.put((c.gx << 32) | c.gy, c.v))
        val filled = dense(g, bounds.w, bounds.h, noSmoothing, maxLevel)
        val out = Array.newBuilder[Cell]
        val fIt = filled.entrySet().iterator()
        while (fIt.hasNext) {
          val e = fIt.next()
          out += Cell(e.getKey >>> 32, e.getKey & 0xFFFFFFFFL, e.getValue.intValue())
        }
        out.result().iterator
      }.toDF("gx", "gy", "v")
    }

    // ---- up phase ----
    var levels = List((asCells(cells).toDF("gx", "gy", "v").localCheckpoint(), bounds))
    var k = 0
    while (k < maxLevel && levels.head._2.w / 2 >= 1 && levels.head._2.h / 2 >= 1 && {
      val (df, b) = levels.head
      df.count() < b.w.toLong * b.h.toLong // voids remain
    }) {
      val (df, b) = levels.head
      val coarse = coarsen(asCells(df), b).localCheckpoint()
      levels ::= (coarse, Bounds(b.w / 2, b.h / 2))
      k += 1
    }

    // ---- down phase ----
    // levels.head is the coarsest; fill each finer level in turn.
    var filled = levels.head._1
    for (((df, b), idx) <- levels.tail.zipWithIndex) {
      val parent = filled
      val lattice = spark.range(b.w.toLong * b.h.toLong)
        .select((col("id") % b.w).as("gx"), (col("id") / b.w).cast("long").as("gy"))
      val known = lattice.join(df, Seq("gx", "gy"), "left")
      val holes = known.filter(col("v").isNull).select("gx", "gy")
      val fills =
        if (noSmoothing) {
          holes
            .withColumn("pgx", (col("gx") / 2).cast("long"))
            .withColumn("pgy", (col("gy") / 2).cast("long"))
            .join(parent.select(col("gx").as("pgx"), col("gy").as("pgy"),
              col("v").as("pv")), Seq("pgx", "pgy"))
            .select(col("gx"), col("gy"), col("pv").cast("int").as("v"))
        } else {
          val offs = Seq(
            (-1, -1, 1), (0, -1, 2), (1, -1, 1),
            (-1, 0, 2), (0, 0, 4), (1, 0, 2),
            (-1, 1, 1), (0, 1, 2), (1, 1, 1))
          val offDf = offs.toDF("dx", "dy", "wgt")
          holes
            .crossJoin(broadcast(offDf))
            .withColumn("pgx", (col("gx") / 2).cast("long") + col("dx"))
            .withColumn("pgy", (col("gy") / 2).cast("long") + col("dy"))
            .join(parent.select(col("gx").as("pgx"), col("gy").as("pgy"),
              col("v").as("pv")), Seq("pgx", "pgy"))
            .groupBy("gx", "gy")
            .agg(floor(sum(col("wgt") * col("pv")) / sum(col("wgt"))).cast("int").as("v"))
        }
      filled = df.select(col("gx"), col("gy"), col("v").cast("int"))
        .unionByName(fills)
        .localCheckpoint()
      val _ = idx
    }
    filled
  }
}
