package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tile-pyramid rollup (slippy-map / overview levels): from the level-0
 * cell table `(gx, gy, v)`, derive coarser levels where each parent cell
 * aggregates its up-to-4 children — the standard raster overview /
 * map-tile pyramid every serving stack builds over a DSM (the reference
 * builds the dual structure downward in `shr3d.cpp`'s void-fill pyramid;
 * this is the upward product-serving one, SURVEY.md §2.7 family).
 *
 * Scale shape: level k has <= 1/4 the cells of level k-1, so the whole
 * pyramid costs <= 1/3 of one level-0 pass (geometric series) — each
 * level is ONE hash aggregation keyed by the parent cell, map-side
 * combined, no joins. Each derived level is localCheckpoint'ed: the
 * levels are returned unioned, and without pinning, level k's branch of
 * the union would recompute levels 1..k-1 (Spark does not share common
 * subplans across union branches), turning the geometric series
 * quadratic in the number of levels.
 */
object Pyramid {

  /** Levels 0..`levels` as one DataFrame `(level, gx, gy, v)`. Parent
    * coords are floor(child/2) (shiftright — coords are non-negative by
    * the grid construction). `agg` is the parent combiner (max for a
    * DSM overview, min for a MIN-grid one, sum for counts). `v` stays
    * LONG through every level: a `sum` combiner compounds 4 children per
    * level, so an int-typed rollup would silently wrap at coarse levels
    * of a count pyramid. */
  def rollup(cells: DataFrame, levels: Int,
             agg: Column => Column = max): DataFrame = {
    require(levels >= 0, "levels must be non-negative")
    // the base level is consumed twice (the level-1 aggregation chain
    // AND its own union branch), so pin it too: one materialization of
    // the upstream lineage (often a full splat aggregate) instead of
    // two executions — the same reason the derived levels are pinned
    val l0 = cells.select(col("gx").cast("long"), col("gy").cast("long"),
      col("v").cast("long")).localCheckpoint(eager = true)
    val all = Iterator.iterate(l0) { prev =>
      prev.groupBy(shiftright(col("gx"), 1).as("gx"),
          shiftright(col("gy"), 1).as("gy"))
        .agg(agg(col("v")).cast("long").as("v"))
        .localCheckpoint(eager = true)
    }.take(levels + 1).zipWithIndex
      .map { case (df, k) => df.select(lit(k).as("level"), col("gx"),
        col("gy"), col("v")) }
      .toSeq
    all.reduce(_ union _)
  }
}
