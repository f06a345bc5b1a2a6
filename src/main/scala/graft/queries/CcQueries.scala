package graft.queries

import graft.cc.ConnectedComponents
import graft.core.{Geo, Tables}
import graft.grid.Gridding
import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.functions._

/**
 * Connected-component queries (G1/G2) with a recursive-CTE DuckDB
 * oracle: min-label propagation as a transitive closure pruned to
 * labels smaller than each cell's own id. Restricted to doc_id < 150 on
 * the fine world grid so components stay small (the engine runs the
 * full distributed tile-merge machinery regardless; tileSize 16 forces
 * many cross-tile merges even at smoke SF).
 */
object CcQueries {

  private val (w, h) = Gridding.boundsFor(Gridding.WorldGrid) // (722, 342)
  private val bounds = Bounds(w, h)

  private def dsmSubset(s: org.apache.spark.sql.SparkSession, dir: String) =
    Gridding.dsm(Gridding.points(
      Geo.withGeo(Tables.documents(s, dir).filter(col("doc_id") < 150))))

  private def oracleSql(dzCond: String): String =
    s"""WITH RECURSIVE ${Gridding.splatCte},
       |g AS (SELECT gx, gy, max(qz) AS v FROM
       |  (SELECT * FROM splat WHERE doc_id < 150) s GROUP BY gx, gy),
       |reach(gx, gy, l) AS (
       |  SELECT gx, gy, gy * $w + gx FROM g
       |  UNION
       |  SELECT n.gx, n.gy, r.l FROM reach r
       |  JOIN g c ON c.gx = r.gx AND c.gy = r.gy
       |  JOIN g n ON abs(n.gx - r.gx) <= 1 AND abs(n.gy - r.gy) <= 1
       |    AND r.l < n.gy * $w + n.gx $dzCond)
       |SELECT gx, gy, min(l) AS label FROM reach GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin

  /** Plain 8-connected CCL over occupied DSM cells. */
  val q_cc_labels: QueryDef = QueryDef.sqlChecked(
    "q_cc_labels", oracleSql("")) { (s, dir) =>
    ConnectedComponents.label(dsmSubset(s, dir), bounds, tileSize = 16)
      .select(col("gx"), col("gy"), col("label"))
      .orderBy(col("gx"), col("gy"))
  }

  /** G2: region growing constrained by |dz| <= 3000 (~1 m). */
  val q_cc_dz: QueryDef = QueryDef.sqlChecked(
    "q_cc_dz", oracleSql("AND abs(n.v - c.v) <= 3000")) { (s, dir) =>
    ConnectedComponents.label(dsmSubset(s, dir), bounds, tileSize = 16,
        maxDz = Some(3000))
      .select(col("gx"), col("gy"), col("label"))
      .orderBy(col("gx"), col("gy"))
  }

  /** G2 with the region cap engaged (maxCount = 4, far below the real
    * 10000/gsd² so the canonical chunk crop actually fires at smoke SF):
    * over-cap components split into cell-id-order chunks of 4, each
    * relabeled by its min cell id. The oracle reproduces the chunking
    * with a row_number window over the recursive-CTE labels. */
  val q_cc_chunked: QueryDef = QueryDef.sqlChecked(
    "q_cc_chunked",
    s"""WITH RECURSIVE ${Gridding.splatCte},
       |g AS (SELECT gx, gy, max(qz) AS v FROM
       |  (SELECT * FROM splat WHERE doc_id < 150) s GROUP BY gx, gy),
       |reach(gx, gy, l) AS (
       |  SELECT gx, gy, gy * $w + gx FROM g
       |  UNION
       |  SELECT n.gx, n.gy, r.l FROM reach r
       |  JOIN g c ON c.gx = r.gx AND c.gy = r.gy
       |  JOIN g n ON abs(n.gx - r.gx) <= 1 AND abs(n.gy - r.gy) <= 1
       |    AND r.l < n.gy * $w + n.gx),
       |lbl AS (SELECT gx, gy, min(l) AS label FROM reach GROUP BY gx, gy),
       |chunked AS (SELECT gx, gy, label,
       |  (row_number() OVER (PARTITION BY label ORDER BY gy * $w + gx) - 1) // 4
       |    AS chunk FROM lbl)
       |SELECT gx, gy,
       |  min(gy * $w + gx) OVER (PARTITION BY label, chunk) AS label
       |FROM chunked ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    ConnectedComponents.label(dsmSubset(s, dir), bounds, tileSize = 16,
        maxCount = Some(4L))
      .select(col("gx"), col("gy"), col("label"))
      .orderBy(col("gx"), col("gy"))
  }

  /** A7-style object stats: per component bbox + size. */
  val q_cc_stats: QueryDef = QueryDef.sqlChecked(
    "q_cc_stats",
    s"""WITH RECURSIVE ${Gridding.splatCte},
       |g AS (SELECT gx, gy, max(qz) AS v FROM
       |  (SELECT * FROM splat WHERE doc_id < 150) s GROUP BY gx, gy),
       |reach(gx, gy, l) AS (
       |  SELECT gx, gy, gy * $w + gx FROM g
       |  UNION
       |  SELECT n.gx, n.gy, r.l FROM reach r
       |  JOIN g n ON abs(n.gx - r.gx) <= 1 AND abs(n.gy - r.gy) <= 1
       |    AND r.l < n.gy * $w + n.gx),
       |lbl AS (SELECT gx, gy, min(l) AS label FROM reach GROUP BY gx, gy)
       |SELECT label, count(*) AS n_cells, min(gx) AS xmin, max(gx) AS xmax,
       |  min(gy) AS ymin, max(gy) AS ymax
       |FROM lbl GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
    ConnectedComponents.label(dsmSubset(s, dir), bounds, tileSize = 16)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_cells"), min("gx").as("xmin"), max("gx").as("xmax"),
        min("gy").as("ymin"), max("gy").as("ymax"))
      .orderBy(col("label"))
  }

  /** G4 object accept/reject (pubgeo `shr3d.cpp:1037-1087`): per high
    * component, the mean step from its cells down to 8-adjacent GROUND
    * (non-object) DSM cells; objects with 0 < mean < dz/2 are noise
    * ridges and are rejected (components with no ground-adjacent cell
    * are dropped with them — no mean exists). Dense 10-degree grid so
    * components actually touch ground cells. */
  val q_accept_gradient: QueryDef = {
    import graft.grid.Gridding.GridSpec
    val spec10 = GridSpec(gsd = 10.0)
    val (w10, h10) = Gridding.boundsFor(spec10)
    val dz = 30000 // threshold 15000 raw: splits the smoke components
    QueryDef.sqlChecked(
      "q_accept_gradient",
      s"""WITH RECURSIVE ${Gridding.splatCte(spec10)},
         |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
         |hi AS (SELECT gx, gy, v FROM dsm WHERE v > 50000),
         |reach(gx, gy, l) AS (
         |  SELECT gx, gy, gy * $w10 + gx FROM hi
         |  UNION
         |  SELECT n.gx, n.gy, r.l FROM reach r
         |  JOIN hi n ON abs(n.gx - r.gx) <= 1 AND abs(n.gy - r.gy) <= 1
         |    AND r.l < n.gy * $w10 + n.gx),
         |lbl AS MATERIALIZED (SELECT gx, gy, min(l) AS label FROM reach GROUP BY gx, gy),
         |nb AS (SELECT l.label, d.v AS ov, n.v AS nv
         |  FROM lbl l JOIN dsm d ON d.gx = l.gx AND d.gy = l.gy
         |  CROSS JOIN (VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,1),
         |    (1,-1), (1,0), (1,1)) o(dx, dy)
         |  JOIN dsm n ON n.gx = l.gx + o.dx AND n.gy = l.gy + o.dy
         |  LEFT JOIN lbl ln ON ln.gx = l.gx + o.dx AND ln.gy = l.gy + o.dy
         |  WHERE ln.gx IS NULL),
         |st AS (SELECT label, sum(ov - nv) / count(*) AS mg FROM nb GROUP BY label),
         |keep AS (SELECT label FROM st WHERE NOT (mg > 0.0 AND mg < ${dz / 2.0}))
         |SELECT l.gx, l.gy, l.label FROM lbl l JOIN keep k ON k.label = l.label
         |ORDER BY l.gx, l.gy""".stripMargin) { (s, dir) =>
      import graft.api.GroundObjects
      val dsm = Gridding.dsm(Gridding.points(
        Geo.withGeo(Tables.documents(s, dir)), spec10))
      val hi = dsm.filter(col("v") > 50000)
      val labeled = ConnectedComponents.label(hi, Bounds(w10, h10), tileSize = 8)
      GroundObjects.acceptByGradient(
          labeled.select("gx", "gy", "label"), dsm.select("gx", "gy", "v"), dz)
        .select(col("gx"), col("gy"), col("label"))
        .orderBy(col("gx"), col("gy"))
    }
  }

  /** Grid DBSCAN ([[graft.cc.GridDbscan]]) over geocoded documents on a
    * 5-degree lattice: density = 3×3 point count, core at density ≥
    * minPts, clusters = 8-connected core components (min-cell-id
    * labels), borders take the smallest adjacent core label, the rest
    * is noise. minPts is data-derived — well above the mean 3×3
    * density, `18·N/cells + 1` (2× the mean) in exact integer arithmetic on both
    * engines — so the clustering stays non-trivial at every SF. The
    * dual re-derives every stage relationally (9-offset density join,
    * recursive min-label closure, min-over-neighbors border
    * attachment). */
  val q_dbscan: QueryDef = {
    import graft.grid.Gridding.GridSpec
    val spec5 = GridSpec(gsd = 5.0)
    val (w5, h5) = Gridding.boundsFor(spec5)
    val lc = w5.toLong * h5
    QueryDef.sqlChecked(
      "q_dbscan",
      s"""WITH RECURSIVE ${Gridding.splatCte(spec5)},
         |cells AS (SELECT bx AS gx, by AS gy,
         |    CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2),
         |np AS (SELECT 18 * count(*) // $lc + 1 AS minpts FROM documents),
         |o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
         |  (1,-1),(1,0),(1,1)),
         |dens AS (SELECT c.gx + o.dx AS gx, c.gy + o.dy AS gy,
         |    CAST(sum(c.cnt) AS BIGINT) AS density
         |  FROM cells c CROSS JOIN o GROUP BY 1, 2),
         |occ AS (SELECT c.gx, c.gy, c.cnt, d.density
         |  FROM cells c JOIN dens d ON d.gx = c.gx AND d.gy = c.gy),
         |core AS (SELECT occ.gx, occ.gy FROM occ, np
         |  WHERE occ.density >= np.minpts),
         |reach(gx, gy, l) AS (
         |  SELECT gx, gy, gy * $w5 + gx FROM core
         |  UNION
         |  SELECT n.gx, n.gy, r.l FROM reach r
         |  JOIN core n ON abs(n.gx - r.gx) <= 1 AND abs(n.gy - r.gy) <= 1
         |    AND r.l < n.gy * $w5 + n.gx),
         |lbl AS (SELECT gx, gy, min(l) AS label FROM reach GROUP BY 1, 2),
         |cnbr AS (SELECT l.gx + o.dx AS gx, l.gy + o.dy AS gy,
         |    min(l.label) AS blabel
         |  FROM lbl l CROSS JOIN o GROUP BY 1, 2)
         |SELECT occ.gx, occ.gy, occ.cnt, occ.density, 'core' AS role,
         |  lbl.label
         |FROM occ JOIN lbl ON lbl.gx = occ.gx AND lbl.gy = occ.gy
         |UNION ALL
         |SELECT occ.gx, occ.gy, occ.cnt, occ.density, 'border', c.blabel
         |FROM occ JOIN cnbr c ON c.gx = occ.gx AND c.gy = occ.gy, np
         |WHERE occ.density < np.minpts
         |UNION ALL
         |SELECT occ.gx, occ.gy, occ.cnt, occ.density, 'noise',
         |  CAST(NULL AS BIGINT)
         |FROM occ, np
         |WHERE occ.density < np.minpts
         |  AND NOT EXISTS (SELECT 1 FROM cnbr c
         |                  WHERE c.gx = occ.gx AND c.gy = occ.gy)
         |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val minPts = 18L * docs.count() / lc + 1L
      val cells = Gridding.points(Geo.withGeo(docs), spec5)
        .groupBy(col("bx").as("gx"), col("by").as("gy"))
        .agg(count(lit(1)).as("cnt"))
      graft.cc.GridDbscan.cluster(cells, Bounds(w5, h5), minPts,
          tileSize = 16)
        .orderBy(col("gx"), col("gy"))
    }
  }

  val all: Seq[QueryDef] =
    Seq(q_cc_labels, q_cc_dz, q_cc_chunked, q_cc_stats, q_accept_gradient,
      q_dbscan)
}
