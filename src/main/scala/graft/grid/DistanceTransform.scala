package graft.grid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded-radius multi-source chamfer distance transform over the
 * sparse cell table — the proximity product ("distance to the nearest
 * X within R") a raster consumer derives next after classification,
 * and the raster dual of the kNN/radius joins in `graft.join`.
 *
 * Semantics (deterministic, integer-exact): the chamfer-10/14 metric
 * (rook step = 10, diagonal = 14 — the classic integer approximation
 * of Euclidean grid distance) over OCCUPIED cells only: void cells are
 * obstacles that paths cannot cross. Every occupied cell within
 * chamfer distance `radius` of any source gets its exact minimum
 * distance; farther cells are absent from the output (honest
 * unreached, never a sentinel). The radius bound is part of the
 * operator contract, not a tuning knob: it makes BOTH the engine loop
 * and any sequential re-implementation provably terminating — rounds
 * <= radius/10 — and at 100 TB it bounds the frontier expansion the
 * same way.
 *
 * Scale shape: Bellman-Ford over the implicit 8-neighbor grid graph,
 * active-frontier form — each round explodes ONLY the cells improved
 * last round into their 8 neighbor candidates (map-side), hash-joins
 * them against the occupied-cell table, and keeps genuine improvements
 * (left join vs the running distances). Work per round is O(frontier),
 * not O(grid); total shuffle volume is O(reached * rounds_bounded).
 * Both running tables are localCheckpoint'd per round to cut lineage,
 * the same discipline as [[FlowBasins]].
 */
object DistanceTransform {

  private val Offsets8 = Seq(
    (-1L, -1L, 14L), (-1L, 0L, 10L), (-1L, 1L, 14L), (0L, -1L, 10L),
    (0L, 1L, 10L), (1L, -1L, 14L), (1L, 0L, 10L), (1L, 1L, 14L))

  /** (gx, gy, d) for every occupied cell whose chamfer distance to the
    * nearest source is <= radius. `sources` rows not present in
    * `cells` are ignored (a source must be an occupied cell). */
  def chamferWithin(cells: DataFrame, sources: DataFrame, radius: Long,
                    maxRounds: Int = 64): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    val occ = cells.select("gx", "gy").localCheckpoint(eager = true)
    var dist = sources.select(col("gx"), col("gy"), lit(0L).as("d"))
      .distinct()
      .join(occ, Seq("gx", "gy"))
      .localCheckpoint(eager = true)
    var frontier = dist
    var rounds = 0
    val offs = array(Offsets8.map { case (dx, dy, w) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(w).as("w"))
    }: _*)
    while (rounds < maxRounds && !frontier.isEmpty) {
      val cand = frontier
        .select(explode(offs).as("o"), col("gx"), col("gy"), col("d"))
        .select((col("gx") + col("o.dx")).as("gx"),
          (col("gy") + col("o.dy")).as("gy"),
          (col("d") + col("o.w")).as("d"))
        .filter(col("d") <= radius)
        .join(occ, Seq("gx", "gy"))
        .groupBy("gx", "gy").agg(min("d").as("d"))
      val improved = cand
        .join(dist.withColumnRenamed("d", "od"), Seq("gx", "gy"), "left")
        .filter(col("od").isNull || col("d") < col("od"))
        .select("gx", "gy", "d")
        .localCheckpoint(eager = true)
      dist = dist
        .join(improved.select("gx", "gy"), Seq("gx", "gy"), "left_anti")
        .unionByName(improved)
        .localCheckpoint(eager = true)
      frontier = improved
      rounds += 1
    }
    dist
  }
}
