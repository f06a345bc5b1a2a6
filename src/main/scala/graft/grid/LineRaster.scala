package graft.grid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-density rasterization: splat integer segments onto the cell
 * lattice and count traversals per cell — the trajectory-heatmap
 * product (user click paths, shipping lanes, flow maps) in the same
 * raster family as [[Gridding]]'s point splat, one dimension up.
 *
 * Semantics (deterministic, integer-exact): each segment
 * (x0,y0)->(x1,y1) contributes every cell of its rounded-parametric
 * discrete line ([[Rays.pointAt]], n = max(|dx|,|dy|) steps, endpoints
 * inclusive) exactly once — step k advances the major axis by exactly
 * one cell, so the k-explode never revisits a cell within a segment. A
 * degenerate segment (n = 0) contributes its single cell once.
 *
 * Scale shape: one map-side explode of each segment into its <= n+1
 * cells (bounded by the lattice diameter, the [[Viewshed]] contract)
 * followed by ONE hash aggregate keyed by cell — identical shuffle
 * shape to the point-splat DSM build; AQE absorbs hot cells.
 */
object LineRaster {

  /** (gx, gy, n_visits) over segments (x0, y0, x1, y1). */
  def density(segs: DataFrame): DataFrame = {
    val dx = col("x1") - col("x0")
    val dy = col("y1") - col("y0")
    val withK = segs
      .withColumn("n", greatest(abs(dx), abs(dy)))
      .withColumn("k", explode(sequence(lit(0L), col("n"))))
    def at(o: String, d: org.apache.spark.sql.Column) =
      when(col("n") === 0, col(o))
        .otherwise(Rays.pointAt(col(o), d, col("k"), col("n")))
    withK
      .select(at("x0", col("x1") - col("x0")).as("gx"),
        at("y0", col("y1") - col("y0")).as("gy"))
      .groupBy("gx", "gy")
      .agg(count(lit(1)).as("n_visits"))
  }
}
