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

  val all: Seq[QueryDef] = Seq(q_edge_filter, q_morph_open)
}
