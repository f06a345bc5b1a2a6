package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact single-observer viewshed (line-of-sight) over the sparse cell
 * table — the classic DSM consumer pubgeo's raster products feed (the
 * reference stops at the DSM/DTM rasters, `shr3d.cpp`'s products; this
 * extends the same terrain-analysis family as the D8 flow operators).
 *
 * Semantics (deterministic, integer-exact): a target cell is VISIBLE
 * from the observer iff NO intermediate cell on the discrete ray blocks
 * it. The ray is the rounded-parametric line: for displacement
 * (dx, dy), n = max(|dx|, |dy|) steps, intermediate k in 1..n-1 sits at
 * ox + floor((2*k*dx + n) / (2*n)) (round-half-up of k*dx/n) — computed
 * as a floor division via the sign-safe positive remainder so Spark
 * (`div` truncates) and ANSI SQL (`//` floors) agree: on the exact
 * multiple `a - pmod(a, b)`, truncation == floor. An intermediate at
 * elevation vi blocks iff its elevation angle is >= the target's:
 * (vi - vo)/sqrt(hi) >= (vt - vo)/sqrt(ht), decided EXACTLY by sign
 * split + cross-multiplied squares (dz^2 * h fits a long: dz <= 2^16,
 * h <= 2 * diameter^2). Void (absent) intermediate cells never block.
 * Cells with n <= 1 (the observer and its 8-neighbors) are visible by
 * construction.
 *
 * Scale shape: one explode of each target into its <= diameter
 * intermediate probes (O(N * D) rows, D = grid diameter in cells — the
 * standard exact-join shape; R3-style sweeps trade exactness for less
 * fan-out), one equi-join of probes against the cell table keyed by
 * (px, py) — broadcastable when the grid is lattice-bounded, a plain
 * shuffle join otherwise — and one hash aggregate back to the target
 * key. No driver-side state; the observer row rides along as a
 * broadcast crossJoin.
 */
object Viewshed {

  /** Visibility of every cell in `cells` (gx, gy, v) from the single
    * observer row `obs` (ox, oy, vo — vo already includes any observer
    * height offset): (gx, gy, v, visible). */
  def viewshed(cells: DataFrame, obs: DataFrame): DataFrame = {
    val t = cells.crossJoin(broadcast(obs))
    val dxT = col("gx") - col("ox")
    val dyT = col("gy") - col("oy")
    val withK = t
      .withColumn("n", greatest(abs(dxT), abs(dyT)))
      .withColumn("k",
        explode_outer(when(col("n") >= 2, sequence(lit(1L), col("n") - 1))))
    val probes = withK
      .withColumn("px",
        Rays.pointAt(col("ox"), col("gx") - col("ox"), col("k"), col("n")))
      .withColumn("py",
        Rays.pointAt(col("oy"), col("gy") - col("oy"), col("k"), col("n")))
    val blockers = cells.select(
      col("gx").as("px"), col("gy").as("py"), col("v").as("bv"))
    val j = probes.join(blockers, Seq("px", "py"), "left")

    val a = col("bv") - col("vo") // blocker dz
    val b = col("v") - col("vo") // target dz
    val hi = (col("px") - col("ox")) * (col("px") - col("ox")) +
      (col("py") - col("oy")) * (col("py") - col("oy"))
    val ht = (col("gx") - col("ox")) * (col("gx") - col("ox")) +
      (col("gy") - col("oy")) * (col("gy") - col("oy"))
    val blocks = when(col("k").isNull || col("bv").isNull, lit(false))
      .when(a >= 0 && b < 0, lit(true))
      .when(a < 0 && b >= 0, lit(false))
      .when(a >= 0 && b >= 0, a * a * ht >= b * b * hi)
      .otherwise(a * a * ht <= b * b * hi)
    j.groupBy("gx", "gy", "v")
      .agg((sum(blocks.cast("long")) === 0).as("visible"))
  }

  /** Convenience: observer = the LOWEST cell (min (v, gx, gy) — a
    * valley floor sees a non-trivial horizon), raised by `hObs` quant
    * units. Declarative: the observer is a one-row aggregate broadcast
    * into the plan, never collected. */
  def fromLowest(cells: DataFrame, hObs: Long): DataFrame = {
    val obs = cells
      .agg(min(struct(col("v"), col("gx"), col("gy"))).as("o"))
      .select(col("o.gx").as("ox"), col("o.gy").as("oy"),
        (col("o.v") + hObs).as("vo"))
    viewshed(cells, obs)
  }
}
