package graft.queries

import graft.core.{Geo, Tables}
import graft.grid.Gridding
import graft.stencil.{Kernels, TileStencil}
import org.apache.spark.sql.functions._

/**
 * SQL-checked stencil queries (SURVEY.md §2.5). Run on a coarse
 * 10-degree grid where the doc scatter is dense enough for neighborhoods
 * to be non-trivial. Engine side uses the halo-exchange tile operator
 * with a deliberately small tile size so multiple tiles + halos are
 * exercised even at smoke SF; the DuckDB dual is an explicit neighbor
 * self-join — structurally different machinery, same semantics.
 */
object StencilQueries {

  private val spec = Gridding.GridSpec(gsd = 10.0)
  private val (w, h) = Gridding.boundsFor(spec) // (38, 19)
  private val bounds = TileStencil.Bounds(w, h)
  private val EdgeDz = 40000

  private def dsm10(s: org.apache.spark.sql.SparkSession, dir: String) =
    Gridding.dsm(Gridding.points(Geo.withGeo(Tables.documents(s, dir)), spec))

  private val offsets8 =
    "(VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,1), (1,-1), (1,0), (1,1)) o(dx, dy)"
  private val offsets9 =
    "(VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,0), (0,1), (1,-1), (1,0), (1,1)) o(dx, dy)"

  /** W6 edgeFilter: void any cell with a neighbor (absent = 0) differing
    * by more than dz. */
  val q_edge_filter: QueryDef = QueryDef.sqlChecked(
    "q_edge_filter",
    s"""WITH ${Gridding.splatCte(spec)},
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |nb AS (SELECT d.gx, d.gy, d.v, coalesce(n.v, 0) AS nv
       |  FROM dsm d CROSS JOIN $offsets8
       |  LEFT JOIN dsm n ON n.gx = d.gx + o.dx AND n.gy = d.gy + o.dy
       |  WHERE d.gx + o.dx BETWEEN 0 AND ${w - 1}
       |    AND d.gy + o.dy BETWEEN 0 AND ${h - 1})
       |SELECT gx, gy, CAST(v AS INT) AS v FROM nb GROUP BY gx, gy, v
       |HAVING max(abs(nv - v)) <= $EdgeDz ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    TileStencil(dsm10(s, dir), Kernels.EdgeFilter(EdgeDz), bounds, tileSize = 8)
      .orderBy(col("gx"), col("gy"))
  }

  /** Morphological opening (W4 erosion then W5 dilation, r=1, dz=0) —
    * the DTM0 ground-surface primitive. */
  val q_morph_open: QueryDef = QueryDef.sqlChecked(
    "q_morph_open",
    s"""WITH ${Gridding.splatCte(spec)},
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |erode AS (SELECT d.gx, d.gy, min(n.v) AS v
       |  FROM dsm d CROSS JOIN $offsets9
       |  JOIN dsm n ON n.gx = d.gx + o.dx AND n.gy = d.gy + o.dy
       |  GROUP BY d.gx, d.gy),
       |dilate AS (SELECT d.gx, d.gy, max(n.v) AS v
       |  FROM erode d CROSS JOIN $offsets9
       |  JOIN erode n ON n.gx = d.gx + o.dx AND n.gy = d.gy + o.dy
       |  GROUP BY d.gx, d.gy)
       |SELECT gx, gy, CAST(v AS INT) AS v FROM dilate ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val eroded = TileStencil(dsm10(s, dir), Kernels.MinFilter(1, 0), bounds, tileSize = 8)
    TileStencil(eroded, Kernels.MaxFilter(1, 0), bounds, tileSize = 8)
      .orderBy(col("gx"), col("gy"))
  }

  /** W15 label erode+dilate (pubgeo `shr3d.cpp:1091-1139`): mask
    * morphology on a 0/1 label mask — erosion keeps a cell iff every
    * in-bounds 3x3 neighbor is labeled; a cell survives the pass iff
    * any in-bounds 3x3 cell (incl. itself) survived erosion. Removes
    * narrow/1-px objects, keeps bodies >= 3 wide with their rims. */
  val q_mask_open: QueryDef = QueryDef.sqlChecked(
    "q_mask_open",
    s"""WITH ${Gridding.splatCte(spec)},
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |mask AS (SELECT gx, gy FROM dsm WHERE v > 40000),
       |er AS (SELECT m.gx, m.gy FROM mask m JOIN mask n
       |    ON abs(m.gx - n.gx) <= 1 AND abs(m.gy - n.gy) <= 1
       |  GROUP BY m.gx, m.gy
       |  HAVING count(*) = (least(m.gx + 1, ${w - 1}) - greatest(m.gx - 1, 0) + 1)
       |                  * (least(m.gy + 1, ${h - 1}) - greatest(m.gy - 1, 0) + 1)),
       |keep AS (SELECT DISTINCT m.gx, m.gy FROM mask m JOIN er e
       |    ON abs(m.gx - e.gx) <= 1 AND abs(m.gy - e.gy) <= 1)
       |SELECT gx, gy, 1 AS v FROM keep ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val mask = dsm10(s, dir).filter(col("v") > 40000)
      .select(col("gx"), col("gy"), lit(1).as("v"))
    val packed = TileStencil(mask, Kernels.MaskErodePack(), bounds, tileSize = 8)
    TileStencil(packed, Kernels.MaskOpenResolve(), bounds, tileSize = 8)
      .select(col("gx"), col("gy"), col("v").cast("int").as("v"))
      .orderBy(col("gx"), col("gy"))
  }

  /** M1 fillVoidsPyramid, single level, noSmoothing: every lattice hole
    * takes its parent's mean value. The SQL dual reproduces the
    * fine->coarse splat and the parent lookup explicitly. */
  val q_fill_voids: QueryDef = {
    val (cw, ch) = (w / 2, h / 2)
    QueryDef.sqlChecked(
      "q_fill_voids",
      s"""WITH ${Gridding.splatCte(spec)},
         |dsm AS (SELECT gx, gy, CAST(max(qz) AS INT) AS v FROM splat GROUP BY gx, gy),
         |cand AS (
         |  SELECT gx, gy, v, (gx - 1) // 2 AS j, (gy - 1) // 2 AS i FROM dsm
         |  UNION SELECT gx, gy, v, (gx - 1) // 2, gy // 2 FROM dsm
         |  UNION SELECT gx, gy, v, gx // 2, (gy - 1) // 2 FROM dsm
         |  UNION SELECT gx, gy, v, gx // 2, gy // 2 FROM dsm),
         |coarse AS (SELECT j, i, CAST(floor(sum(v) / count(*)) AS INT) AS pv
         |  FROM cand WHERE j >= 0 AND j < $cw AND i >= 0 AND i < $ch
         |  GROUP BY j, i),
         |lattice AS (SELECT x.range AS gx, y.range AS gy FROM range(0, $w) x, range(0, $h) y),
         |filled AS (SELECT l.gx, l.gy,
         |    coalesce(d.v, c.pv) AS v
         |  FROM lattice l LEFT JOIN dsm d ON d.gx = l.gx AND d.gy = l.gy
         |  LEFT JOIN coarse c ON c.j = l.gx // 2 AND c.i = l.gy // 2 AND d.v IS NULL)
         |SELECT gx, gy, v FROM filled WHERE v IS NOT NULL ORDER BY gx, gy""".stripMargin) { (s, dir) =>
      graft.pyramid.FillVoids(dsm10(s, dir), bounds, noSmoothing = true, maxLevel = 1)
        .orderBy(col("gx"), col("gy"))
    }
  }

  /** Full smoothing pyramid (rows-only check; semantics covered by the
    * dense oracle in PyramidSpec). */
  val q_fill_pyramid: QueryDef = QueryDef.rowsOnly("q_fill_pyramid") { (s, dir) =>
    graft.pyramid.FillVoids(dsm10(s, dir), bounds).orderBy(col("gx"), col("gy"))
  }

  val all: Seq[QueryDef] =
    Seq(q_edge_filter, q_morph_open, q_mask_open, q_fill_voids, q_fill_pyramid)
}
