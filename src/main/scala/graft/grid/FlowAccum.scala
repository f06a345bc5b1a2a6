package graft.grid

import graft.stencil.TileStencil
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * D8 flow ACCUMULATION (upstream contributing-cell count, O'Callaghan &
 * Mark 1984) — for every DSM cell, the number of cells whose
 * steepest-descent path passes through it, itself included. The classic
 * sequential algorithm walks cells in descending height order pushing
 * counts downstream (O(n) but inherently ordered); the naive parallel
 * rendition pushes deltas one hop per round — O(longest flow path)
 * rounds, unbounded on river-length paths. This module instead treats
 * the D8 pointer forest as what it is — a forest — and computes every
 * cell's accumulation as its SUBTREE SIZE in the upstream-edge forest
 * via the textbook Euler-tour technique (Tarjan & Vishkin 1985):
 *
 *   1. tree edges (child c -> parent p) are the non-self-loop D8
 *      pointers ([[FlowBasins.nextPointer]]);
 *   2. each edge becomes two tour arcs, down D(p->c) and up U(c->p);
 *      the tour successor is pure local bookkeeping — first child, next
 *      sibling (a lead() window per parent), grandparent — built with
 *      one window + two equi-joins, no iteration;
 *   3. the successor list is list-RANKED with the same weighted
 *      pointer-doubling loop as basin labeling
 *      ([[FlowBasins.resolve]], Wyllie): dist(arc) = #arcs after it in
 *      its tree's tour, in ceil(log2(tour length)) join rounds;
 *   4. subtree(c) = (dist(D(p->c)) - dist(U(c->p)) + 1) / 2 — the arcs
 *      strictly between a node's down and up visits are exactly its
 *      subtree's tour; roots (sinks) close with the local identity
 *      accum(v) = 1 + sum(subtree(children)).
 *
 * So the whole product is O(|V| log d) shuffle volume with d = longest
 * flow path — the same bound as basin labeling, where delta-pushing
 * would be O(|V| d). Arc ids pack the tree edge's child id with a
 * direction bit (`id*2 | dir`), which bounds grid coordinates at 2^30
 * per axis (vs the packer's native 2^31) — a billion cells per side.
 *
 * Determinism: child order within a parent is fixed (packed-id order),
 * and subtree sizes are order-independent anyway; pinned by FlowSpec
 * against a sequential counter across tile sizes and partitionings.
 */
object FlowAccum {

  private def down(c: Column): Column = shiftleft(c, 1)
  private def up(c: Column): Column = shiftleft(c, 1).bitwiseOR(lit(1L))

  /** Accumulation per DSM cell: (gx, gy, acc) with acc >= 1 (cast long).
    * Cells are counted into every cell on their D8 path, themselves
    * included; sinks therefore carry their whole basin's size. */
  def accumulation(dsm: DataFrame, bounds: TileStencil.Bounds,
                   tileSize: Int = 128, maxRounds: Int = 64): DataFrame = {
    val next = FlowBasins.nextPointer(dsm, bounds, tileSize)
      .localCheckpoint(eager = true)
    // the (id*2 | dir) arc packing narrows the packer's native 2^31
    // coordinate bound to 2^30 per axis; fail loudly instead of letting
    // arc ids silently wrap into the sign bit (one cheap agg over the
    // already-materialized pointer table)
    val maxIdRow = next.agg(max(greatest(col("id"), col("nid")))).head()
    if (!maxIdRow.isNullAt(0))
      require(maxIdRow.getLong(0) < (1L << 62),
        s"accumulation: packed cell id ${maxIdRow.getLong(0)} >= 2^62 — " +
          "the (id*2|dir) arc packing needs gx < 2^30; tile the grid")
    val edges = next.filter(col("id") =!= col("nid"))
      .select(col("id").as("c"), col("nid").as("p"))

    // per-parent sibling order (packed-id ascending) + first child
    val sib = edges.withColumn("ns",
      lead(col("c"), 1).over(Window.partitionBy(col("p")).orderBy(col("c"))))
    val firstChild = edges.groupBy(col("p")).agg(min(col("c")).as("fc"))
      .select(col("p").as("fcNode"), col("fc"))
    val parentOf = edges.select(col("c").as("poNode"), col("p").as("gp"))

    // Down arc D(p->c), id = c*2: succ descends into c's first child if
    // any, else bounces straight back up. Weight 1 (never terminal: its
    // successor exists in both branches).
    val downArcs = sib
      .join(firstChild, sib("c") === firstChild("fcNode"), "left")
      .select(down(col("c")).as("id"),
        when(col("fc").isNotNull, down(col("fc")))
          .otherwise(up(col("c"))).as("nid"),
        lit(1L).as("w"))

    // Up arc U(c->p), id = c*2+1: succ crosses to the next sibling if
    // any, else climbs to U(p->gp); the up arc of a root's last child is
    // its tree's tour END and self-loops with weight 0 (the resolve
    // contract's sink form).
    val upArcs = sib
      .join(parentOf, sib("p") === parentOf("poNode"), "left")
      .select(up(col("c")).as("id"),
        when(col("ns").isNotNull, down(col("ns")))
          .when(col("gp").isNotNull, up(col("p")))
          .otherwise(up(col("c"))).as("nid"),
        when(col("ns").isNotNull || col("gp").isNotNull, 1L)
          .otherwise(0L).as("w"))

    // list-rank the tour: dist = #arcs after this arc in its tree's tour
    val ranked = FlowBasins.resolve(downArcs.unionByName(upArcs), maxRounds)
      .select(col("id"), col("w").as("dist"))

    // subtree size per non-root node from its D/U rank gap
    val dArc = ranked.select(shiftrightunsigned(col("id"), 1).as("c"),
      col("dist").as("dd")).where(col("id").bitwiseAND(lit(1L)) === 0L)
    val uArc = ranked.select(shiftrightunsigned(col("id"), 1).as("c"),
      col("dist").as("du")).where(col("id").bitwiseAND(lit(1L)) === 1L)
    val subtree = dArc.join(uArc, "c")
      .select(col("c").as("node"),
        // exact integer halving (the gap is odd by construction); `/`
        // would detour through double and lose exactness past 2^52
        shiftrightunsigned(col("dd") - col("du") + lit(1L), 1).as("acc"))

    // roots (sinks) by the local identity: 1 + sum over child subtrees;
    // isolated sinks (no upstream cell) never joined and coalesce to 1
    val rootAcc = edges.join(subtree, edges("c") === subtree("node"))
      .groupBy(col("p")).agg(sum(col("acc")).as("childAcc"))
      .select(col("p").as("rNode"), col("childAcc"))
    val sinks = next.filter(col("id") === col("nid"))
      .join(rootAcc, col("id") === col("rNode"), "left")
      .select(col("id").as("node"),
        (coalesce(col("childAcc"), lit(0L)) + 1L).as("acc"))

    subtree.unionByName(sinks)
      .select(
        shiftrightunsigned(col("node"), 32).as("gx"),
        col("node").bitwiseAND(lit(0xFFFFFFFFL)).as("gy"),
        col("acc"))
  }
}
