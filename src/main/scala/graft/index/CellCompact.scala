package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hierarchical cell-set compaction/expansion — the H3 `compactCells` /
 * S2 `S2CellUnion::Normalize` operation over the engine's quad cell ids
 * ([[Cells]]): a set of cells at one resolution is rewritten as the
 * minimal mixed-resolution set covering exactly the same area, by
 * recursively replacing every complete 4-sibling group with its parent.
 * The reference has no index layer (its AOI analog is a dense pixel
 * mask, pubgeo `shr3d.cpp:1482-1519`); this is the north rule's index
 * layer storing coverages (AOIs, crawled-region footprints) compactly.
 *
 * Scale shape: one groupBy(parent) per level, NO join — the aggregate
 * carries `collect_list(cell)`, which geometry caps at 4 elements, so
 * incomplete groups re-emit their children from the grouped row itself.
 * Levels run highest-res first and the live set shrinks by 4x wherever
 * compaction fires; at most [[Cells.MaxRes]] (16) shuffles total, each
 * keyed by parent id — a prefix of the child key, so Morton locality is
 * preserved and AQE sees geometrically shrinking stages.
 *
 * Determinism: set-in, set-out — no ordering anywhere.
 */
object CellCompact {

  private val MortonMask = 0x00FFFFFFFFFFFFFFL

  /** Parent cell id as a pure bit-arithmetic Column (codegen'd):
    * res byte decremented, Morton bits shifted out by one level. */
  def parentCol(cell: org.apache.spark.sql.Column, toRes: Int): org.apache.spark.sql.Column =
    shiftleft(lit(toRes.toLong), 56)
      .bitwiseOR(shiftrightunsigned(cell.bitwiseAND(lit(MortonMask)), 2))

  /** Compact a DISTINCT single-resolution cell set (column `cell`, ids
    * at resolution `res`) to the minimal mixed-resolution cover. */
  def compact(cells: DataFrame, res: Int): DataFrame = {
    require(res >= 0 && res <= Cells.MaxRes, s"bad res=$res")
    var cur = cells.select(col("cell").cast("long")).distinct()
      .localCheckpoint(eager = true)
    var kept = List.empty[DataFrame]
    var level = res
    while (level > 0 && !cur.isEmpty) {
      val g = cur.groupBy(parentCol(col("cell"), level - 1).as("p"))
        .agg(count(lit(1)).as("n"), collect_list(col("cell")).as("kids"))
        .localCheckpoint(eager = true)
      kept = g.filter(col("n") < 4)
        .select(explode(col("kids")).as("cell")) :: kept
      cur = g.filter(col("n") === 4).select(col("p").as("cell"))
        .localCheckpoint(eager = true)
      level -= 1
    }
    (cur :: kept).reduce(_ unionByName _)
  }

  /** Inverse: expand a mixed-resolution cell set to uniform resolution
    * `res` (every cell's res must be <= res). Explodes 4 children per
    * level — worst-case 4^(res - minRes) fan-out, exactly the area being
    * covered, arriving incrementally level by level. */
  def uncompact(cells: DataFrame, res: Int): DataFrame = {
    require(res >= 0 && res <= Cells.MaxRes, s"bad res=$res")
    var out = cells.select(col("cell").cast("long"))
    var level = 0
    while (level < res) {
      // cells sitting at the sweep level expand into their 4 children;
      // everything else passes through as a 1-element array (explode is
      // a generator, so the conditional lives inside the array argument)
      val r = shiftrightunsigned(col("cell"), 56)
      val children = array((0L until 4L).map { q =>
        shiftleft(lit(level + 1L), 56).bitwiseOR(
          shiftleft(col("cell").bitwiseAND(lit(MortonMask)), 2)
            .bitwiseOR(lit(q)))
      }: _*)
      out = out.select(explode(
        when(r === lit(level.toLong), children)
          .otherwise(array(col("cell")))).as("cell"))
      level += 1
    }
    out.distinct()
  }
}
