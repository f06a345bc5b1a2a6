package graft.queries

import graft.core.{Geo, Tables}
import graft.grid.Gridding
import org.apache.spark.sql.functions._

/**
 * Second gridding pack: the reference's conditional aggregations and
 * resampling (SURVEY.md §2.3 A2/A3, §2.7 M2), all with exact DuckDB
 * oracles. `n_chars` plays the role of lidar intensity.
 */
object GridQueries2 {

  private val DzRaw = 3000L  // ~1 m in raw units
  private val AglRaw = 6000L // ~2 m

  private def docsPts(s: org.apache.spark.sql.SparkSession, dir: String) =
    Gridding.points(Geo.withGeo(Tables.documents(s, dir)))

  /** A2 intensity mean-grid (pubgeo `shr3d.cpp:319-368`): per cell,
    * mean n_chars over splatted points whose qz is within dz of the
    * cell's DSM; scaled to u16 by the global max mean; then
    * createIntensity's trailing `fillVoidsPyramid(true, 2)`
    * (shr3d.cpp:368) — a 2-level noSmoothing pyramid where each lattice
    * hole takes its (filled) parent's mean, unrolled into a static CTE
    * chain in the DuckDB dual like q_fill_pyramid's. */
  val q_intensity_grid: QueryDef = {
    val (w0, h0) = Gridding.boundsFor(Gridding.WorldGrid)
    val dims = Seq((w0, h0), (w0 / 2, h0 / 2), (w0 / 4, h0 / 4))
    def coarsenCte(src: String, out: String, k: Int): String = {
      val (cw, ch) = dims(k)
      s"""$out AS (SELECT j AS gx, i AS gy,
         |  CAST(floor(sum(v) / count(*)) AS INT) AS v FROM (
         |    SELECT gx, gy, v, (gx - 1) // 2 AS j, (gy - 1) // 2 AS i FROM $src
         |    UNION SELECT gx, gy, v, (gx - 1) // 2, gy // 2 FROM $src
         |    UNION SELECT gx, gy, v, gx // 2, (gy - 1) // 2 FROM $src
         |    UNION SELECT gx, gy, v, gx // 2, gy // 2 FROM $src)
         |  WHERE j >= 0 AND j < $cw AND i >= 0 AND i < $ch
         |  GROUP BY j, i)""".stripMargin
    }
    // noSmoothing fill: a hole takes its single FILLED parent's value
    def fillCte(src: String, parent: String, out: String, k: Int): String = {
      val (lw, lh) = dims(k)
      s"""$out AS (
         |  SELECT gx, gy, v FROM $src
         |  UNION ALL
         |  SELECT l.gx, l.gy, p.v
         |  FROM (SELECT x.range AS gx, y.range AS gy
         |        FROM range(0, $lw) x, range(0, $lh) y) l
         |  LEFT JOIN $src s ON s.gx = l.gx AND s.gy = l.gy
         |  JOIN $parent p ON p.gx = l.gx // 2 AND p.gy = l.gy // 2
         |  WHERE s.v IS NULL)""".stripMargin
    }
    QueryDef.sqlChecked(
      "q_intensity_grid",
      s"""WITH ${Gridding.splatCte},
         |doc AS (SELECT doc_id, n_chars FROM documents),
         |sp AS (SELECT s.gx, s.gy, s.qz, d.n_chars FROM splat s JOIN doc d USING (doc_id)),
         |dsm AS (SELECT gx, gy, max(qz) AS dv FROM splat GROUP BY gx, gy),
         |acc AS (SELECT sp.gx, sp.gy, sum(sp.n_chars) AS s, count(*) AS c
         |  FROM sp JOIN dsm ON sp.gx = dsm.gx AND sp.gy = dsm.gy
         |  WHERE abs(sp.qz - dsm.dv) < $DzRaw GROUP BY sp.gx, sp.gy),
         |mx AS (SELECT max(s / c) AS m FROM acc),
         |g0 AS (SELECT gx, gy,
         |  CAST(floor(65535.0 / mx.m * (s / c)) AS INT) AS v
         |  FROM acc CROSS JOIN mx),
         |${coarsenCte("g0", "g1", 1)},
         |${coarsenCte("g1", "g2", 2)},
         |${fillCte("g1", "g2", "f1", 1)},
         |${fillCte("g0", "f1", "f0", 0)}
         |SELECT gx, gy, CAST(v AS BIGINT) AS v FROM f0 ORDER BY gx, gy""".stripMargin) { (s, dir) =>
      val pts = docsPts(s, dir)
      val sp = Gridding.splat2x2(pts).select("gx", "gy", "qz", "n_chars")
      val dsm = Gridding.dsm(pts).withColumnRenamed("v", "dv")
      val acc = sp.join(dsm, Seq("gx", "gy"))
        .filter(abs(col("qz") - col("dv")) < DzRaw)
        .groupBy("gx", "gy")
        .agg(sum("n_chars").as("s"), count(lit(1)).as("c"))
      val mx = acc.agg(max(col("s") / col("c")).as("m"))
      val scaled = acc.crossJoin(broadcast(mx))
        .select(col("gx"), col("gy"),
          floor(lit(65535.0) / col("m") * (col("s") / col("c"))).cast("int").as("v"))
      graft.pyramid.FillVoids(scaled,
          graft.stencil.TileStencil.Bounds(w0, h0), noSmoothing = true, maxLevel = 2)
        .select(col("gx"), col("gy"), col("v").cast("long").as("v"))
        .orderBy(col("gx"), col("gy"))
    }
  }

  /** A3 minAGL grid (pubgeo `shr3d.cpp:372-415`): per-cell min of qz
    * restricted to points at least `agl` above the cell's MIN grid.
    * Runs on the dense 10-degree grid — on the fine world grid the doc
    * scatter rarely stacks two docs > 2 m apart in one cell. */
  val q_minagl_grid: QueryDef = QueryDef.sqlChecked(
    "q_minagl_grid",
    s"""WITH ${Gridding.splatCte(Gridding.GridSpec(gsd = 10.0))},
       |mn AS (SELECT gx, gy, min(qz) AS mv FROM splat GROUP BY gx, gy)
       |SELECT s.gx, s.gy, min(s.qz) AS v
       |FROM splat s JOIN mn ON s.gx = mn.gx AND s.gy = mn.gy
       |WHERE s.qz > mn.mv + $AglRaw
       |GROUP BY s.gx, s.gy ORDER BY s.gx, s.gy""".stripMargin) { (s, dir) =>
    val pts = Gridding.points(Geo.withGeo(Tables.documents(s, dir)),
      Gridding.GridSpec(gsd = 10.0))
    val sp = Gridding.splat2x2(pts)
    val mn = Gridding.minGrid(pts).withColumnRenamed("v", "mv")
    sp.join(mn, Seq("gx", "gy"))
      .filter(col("qz") > col("mv") + AglRaw)
      .groupBy("gx", "gy").agg(min("qz").as("v"))
      .orderBy(col("gx"), col("gy"))
  }

  /** W11: the MINAGL product's r=2 median filter (pubgeo
    * `shr3d.cpp:420-432`): replace a cell with the neighborhood median
    * (quantile 0.5 over the sorted NON-VOID in-bounds 5x5 window, self
    * included, index min(floor(0.5*n), n-1) = n//2) only when it differs
    * from the cell by more than the DZ threshold — the reference's
    * active branch compares against `dz_short` (the `agl_short` variant
    * at shr3d.cpp:418 is commented out there). Void cells stay void
    * (the reference's `ref &&` guard + skipVoids). */
  val q_minagl_filtered: QueryDef = QueryDef.sqlChecked(
    "q_minagl_filtered",
    s"""WITH ${Gridding.splatCte(Gridding.GridSpec(gsd = 10.0))},
       |mn AS (SELECT gx, gy, min(qz) AS mv FROM splat GROUP BY gx, gy),
       |magl AS (SELECT s.gx, s.gy, min(s.qz) AS v
       |  FROM splat s JOIN mn ON s.gx = mn.gx AND s.gy = mn.gy
       |  WHERE s.qz > mn.mv + $AglRaw GROUP BY s.gx, s.gy),
       |nb AS (SELECT a.gx, a.gy, a.v, b.v AS nv
       |  FROM magl a JOIN magl b
       |  ON abs(a.gx - b.gx) <= 2 AND abs(a.gy - b.gy) <= 2),
       |agg AS (SELECT gx, gy, v,
       |  list_sort(list(nv))[CAST(count(*) // 2 AS INT) + 1] AS qv
       |  FROM nb GROUP BY gx, gy, v)
       |SELECT gx, gy,
       |  CAST(CASE WHEN abs(qv - v) > $DzRaw THEN qv ELSE v END AS INT) AS v
       |FROM agg ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val spec10 = Gridding.GridSpec(gsd = 10.0)
    val pts = Gridding.points(Geo.withGeo(Tables.documents(s, dir)), spec10)
    val sp = Gridding.splat2x2(pts)
    val mn = Gridding.minGrid(pts).withColumnRenamed("v", "mv")
    val magl = sp.join(mn, Seq("gx", "gy"))
      .filter(col("qz") > col("mv") + AglRaw)
      .groupBy("gx", "gy").agg(min("qz").as("v"))
    val (w, h) = Gridding.boundsFor(spec10)
    graft.stencil.TileStencil(magl,
        graft.stencil.Kernels.QuantileFilter(2, 0.5, DzRaw.toInt),
        graft.stencil.TileStencil.Bounds(w, h), tileSize = 8)
      .orderBy(col("gx"), col("gy"))
  }

  /** M2 nn_upsample x2 (pubgeo `Image.h:329-356`): every cell replicated
    * into a 2x2 block at doubled resolution. */
  val q_upsample: QueryDef = QueryDef.sqlChecked(
    "q_upsample",
    s"""WITH ${Gridding.splatCte},
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy)
       |SELECT gx * 2 + dx AS ux, gy * 2 + dy AS uy, v
       |FROM dsm CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) o(dx, dy)
       |ORDER BY ux, uy""".stripMargin) { (s, dir) =>
    val dsm = Gridding.dsm(docsPts(s, dir))
    val offs = Seq((0, 0), (0, 1), (1, 0), (1, 1))
    import s.implicits._
    dsm.crossJoin(broadcast(offs.toDF("dx", "dy")))
      .select((col("gx") * 2 + col("dx")).as("ux"),
        (col("gy") * 2 + col("dy")).as("uy"), col("v"))
      .orderBy(col("ux"), col("uy"))
  }

  /** Exact-integer bilinear 2x upsample ([[graft.grid.Resample]]):
    * half-pixel centers, {9,3,3,1}/16 weights as a pure integer weighted
    * sum >> 4, full-support (4-parent) nodata gate. Engine side runs the
    * splat shape (parent pushes 16 weighted taps, one hash agg); the
    * dual expresses the identical arithmetic as a 16-tap cross join. */
  val q_upsample_bilinear: QueryDef = QueryDef.sqlChecked(
    "q_upsample_bilinear",
    s"""WITH ${Gridding.splatCte},
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |c AS (SELECT gx * 2 + t.dx AS ux, gy * 2 + t.dy AS uy,
       |  (CASE WHEN t.dx IN (0, 1) THEN 3 ELSE 1 END)
       |  * (CASE WHEN t.dy IN (0, 1) THEN 3 ELSE 1 END)
       |  * CAST(v AS BIGINT) AS wv
       |  FROM dsm CROSS JOIN (VALUES (-1,-1), (-1,0), (-1,1), (-1,2),
       |    (0,-1), (0,0), (0,1), (0,2), (1,-1), (1,0), (1,1), (1,2),
       |    (2,-1), (2,0), (2,1), (2,2)) t(dx, dy))
       |SELECT ux, uy, CAST(sum(wv) >> 4 AS INT) AS v
       |FROM c GROUP BY ux, uy HAVING count(*) = 4
       |ORDER BY ux, uy""".stripMargin) { (s, dir) =>
    graft.grid.Resample.upsample2xBilinear(Gridding.dsm(docsPts(s, dir)))
      .orderBy(col("ux"), col("uy"))
  }

  /** Tile-pyramid rollup (§2.7 family, the upward overview dual of the
    * reference's downward void-fill pyramid): DSM level 0 plus three
    * overview levels, each parent the max of its up-to-4 children. The
    * dual chains the same floor-div-2 regrouping; `//` in DuckDB and
    * shiftright in Spark agree on non-negative coords. */
  val q_tile_pyramid: QueryDef = QueryDef.sqlChecked(
    "q_tile_pyramid",
    s"""WITH ${Gridding.splatCte},
       |l0 AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |l1 AS (SELECT gx // 2 AS gx, gy // 2 AS gy, max(v) AS v FROM l0 GROUP BY 1, 2),
       |l2 AS (SELECT gx // 2 AS gx, gy // 2 AS gy, max(v) AS v FROM l1 GROUP BY 1, 2),
       |l3 AS (SELECT gx // 2 AS gx, gy // 2 AS gy, max(v) AS v FROM l2 GROUP BY 1, 2)
       |SELECT 0 AS level, gx, gy, CAST(v AS BIGINT) AS v FROM l0
       |UNION ALL SELECT 1, gx, gy, CAST(v AS BIGINT) FROM l1
       |UNION ALL SELECT 2, gx, gy, CAST(v AS BIGINT) FROM l2
       |UNION ALL SELECT 3, gx, gy, CAST(v AS BIGINT) FROM l3
       |ORDER BY level, gx, gy""".stripMargin) { (s, dir) =>
    graft.grid.Pyramid.rollup(Gridding.dsm(docsPts(s, dir)), levels = 3)
      .orderBy(col("level"), col("gx"), col("gy"))
  }

  /** §2.12 streaming tile aggregation, batch-interpreted: the SAME
    * `StreamOps.tileMax` operator body (splat -> watermark ->
    * window(ts) x cell max) run over the doc cloud with a
    * deterministically derived capture timestamp. The streaming-mode
    * equivalence (update emissions, watermark late-drop, state shape)
    * is pinned by StreamingSpec; this oracle pins the windowed-grid
    * VALUES bit-exactly. Spark's window() aligns to the epoch, so the
    * dual's floor(epoch/3600)*3600 is the same bucketing. */
  val q_tile_window: QueryDef = {
    val spec10 = Gridding.GridSpec(gsd = 10.0)
    QueryDef.sqlChecked(
      "q_tile_window",
      s"""WITH ${Gridding.splatCte(spec10)},
         |t AS (SELECT doc_id, (1700000000 + (doc_id * 7919) % 86400) AS es
         |  FROM documents)
         |SELECT (t.es // 3600) * 3600 AS ws, s.gx, s.gy, max(s.qz) AS v
         |FROM splat s JOIN t ON t.doc_id = s.doc_id
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val docs = Geo.withGeo(Tables.documents(s, dir))
        .withColumn("ts",
          (lit(1700000000L) + (col("doc_id") * 7919) % 86400).cast("timestamp"))
      graft.streaming.StreamOps.tileMax(docs, spec10,
          window = "60 minutes", watermark = "2 hours")
        .select(col("window.start").cast("long").as("ws"),
          col("gx"), col("gy"), col("v"))
        .orderBy(col("ws"), col("gx"), col("gy"))
    }
  }

  val all: Seq[QueryDef] =
    Seq(q_intensity_grid, q_minagl_grid, q_minagl_filtered, q_upsample,
      q_upsample_bilinear, q_tile_pyramid, q_tile_window)
}
