package graft.grid

import graft.stencil.{Kernels, TileStencil}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * D8 drainage-basin labeling over a DSM — the hydrology companion of
 * [[graft.stencil.Kernels.AspectD8]]: every cell is labeled with the
 * sink its steepest-descent (D8) path terminates in. The reference's
 * raster family stops at per-cell products (slope/aspect are local
 * stencils); basins are the canonical NON-local raster derivative, and
 * the reason this module exists as a distributed graph loop instead of a
 * kernel: a flow path can cross the whole grid, so no bounded halo can
 * compute it.
 *
 * Graph shape: the D8 next-pointer is a total function on the cell set
 * (full-support descending cells point at their lowest neighbor —
 * smallest-index tie-break, exactly [[Kernels.AspectD8]]; everything
 * else, i.e. local minima, flats, and support-less border cells, is a
 * sink pointing at itself). A functional graph with self-loop sinks has
 * no cycles to detect — every path ends in a sink — so basin labeling is
 * pure pointer DOUBLING: after k rounds each cell's pointer has advanced
 * 2^k hops, so the loop converges in ceil(log2(longest flow path))
 * rounds, each round ONE equi-join of the still-active frontier against
 * the full (cell, pointer) lookup on packed Long ids; a row converges
 * exactly when it hops through a self-loop (detected inside the same
 * join), so convergence needs no separate sink anti-join, and converged
 * rows leave the frontier while staying on the lookup side (path
 * compression). At 100 TB the lookup table shuffles by cell id each
 * round — O(|V|) per round, O(|V| log d) total, with the streamed side
 * shrinking geometrically; the same contract as
 * [[graft.dedup.DupClusters]] (label propagation), but doubling not
 * halving, because a functional graph needs no neighbor-min step.
 *
 * Determinism: the next-pointer is a pure function of cell values (the
 * kernel's tie-break), and doubling composes it — output independent of
 * partitioning, round pacing, or tile size (pinned by FlowSpec across
 * tile sizes and against a sequential walker).
 */
object FlowBasins {

  /** Basin label per DSM cell: (gx, gy, sink_x, sink_y) where
    * (sink_x, sink_y) is the terminal cell of the cell's D8 path.
    *
    * @param dsm       sparse cell table (gx, gy, v) with v > 0
    * @param bounds    grid bounds for the stencil pass
    * @param tileSize  stencil tile size (forwarded to [[TileStencil]])
    * @param maxRounds doubling-round bound; 64 covers any path that fits
    *                  in a 2^63-cell grid, so hitting it means a bug, and
    *                  the loop throws instead of returning partial labels
    */
  def basins(dsm: DataFrame, bounds: TileStencil.Bounds,
             tileSize: Int = 128, maxRounds: Int = 64): DataFrame = {
    val cells = dsm.select(col("gx").cast("long"), col("gy").cast("long"),
      col("v").cast("int"))

    // D8 aspect: 1..8 index of the steepest-descent neighbor; absent for
    // sinks (local minima / flats / no full support)
    val aspect = TileStencil(cells, Kernels.AspectD8, bounds, tileSize)
      .select(col("gx"), col("gy"), col("v").as("idx"))

    // idx -> (dx, dy) via a broadcast 8-row join, NOT element_at over a
    // literal array: Spark 4.1's SimplifyExtractValueOps folds
    // element_at(CreateArray(lits), idx) into a CASE whose ELSE branch is
    // the LAST element, so a null idx (our sinks, from the left join)
    // silently reads as offset (1,1) instead of null — measured, not
    // hypothesized: every sink vanished and the doubling loop never
    // converged.
    val spark = dsm.sparkSession
    import spark.implicits._
    val offDf = broadcast(
      Kernels.AspectD8.Offsets.zipWithIndex
        .map { case ((dx, dy), i) => (i + 1, dx.toLong, dy.toLong) }
        .toDF("idx", "dx", "dy"))

    def packed(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      shiftleft(x, 32).bitwiseOR(y) // coords non-negative and < 2^31

    // total next-pointer: descending cells step to offs(idx-1); sinks self
    val next = cells.join(aspect, Seq("gx", "gy"), "left")
      .join(offDf, Seq("idx"), "left")
      .select(
        packed(col("gx"), col("gy")).as("id"),
        packed(
          col("gx") + coalesce(col("dx"), lit(0L)),
          col("gy") + coalesce(col("dy"), lit(0L)))
          .as("nid"))
      .localCheckpoint(eager = true)

    // Active-frontier doubling with path compression. A row is converged
    // exactly when its pointer IS a sink, and the compose join sees that
    // for free: the row it hops through self-loops (jid === jnid), so the
    // separate sinks table and the per-round anti-join convergence probe
    // of the first cut are gone — each round is ONE join + checkpoint,
    // and convergence is a trivial filter over the checkpointed result.
    // Converged rows leave the frontier (their labels are final; keeping
    // them on the lookup side path-compresses later hops straight to the
    // sink), so the streamed side shrinks geometrically while the lookup
    // side stays O(|V|) — the same per-round shuffle bound as plain
    // doubling with roughly half the join actions.
    var frontier = next
    var finished = List.empty[DataFrame]
    var round = 0
    while (!frontier.isEmpty) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"flow-basin pointer doubling did not converge in $maxRounds rounds")
      val lookup = (frontier :: finished).reduce(_ unionByName _)
        .select(col("id").as("jid"), col("nid").as("jnid"))
      val composed = frontier.join(lookup, frontier("nid") === lookup("jid"))
        .select(frontier("id"), col("jnid").as("nid"),
          (col("jid") === col("jnid")).as("done"))
        .localCheckpoint(eager = true)
      finished = composed.filter(col("done")).select(col("id"), col("nid")) ::
        finished
      frontier = composed.filter(!col("done")).select(col("id"), col("nid"))
    }

    val pt = (next.limit(0) :: finished).reduce(_ unionByName _)
    pt.select(
      shiftrightunsigned(col("id"), 32).as("gx"),
      col("id").bitwiseAND(lit(0xFFFFFFFFL)).as("gy"),
      shiftrightunsigned(col("nid"), 32).as("sink_x"),
      col("nid").bitwiseAND(lit(0xFFFFFFFFL)).as("sink_y"))
  }
}
