package graft.queries

import graft.core.{Geo, Quant, Tables}
import graft.grid.Gridding
import graft.index.{CellFunctions, Cells}
import org.apache.spark.sql.functions._

/**
 * Spatial layer: geocode -> cell index -> gridding (SURVEY.md §2.3, §2.11
 * and the north rule's H3/S2 index). Every query here has a bit-exact
 * DuckDB oracle: the geocode and quantization are integer-derived and the
 * cell id is pure bit arithmetic, so Spark and DuckDB agree to the last
 * bit.
 */
object Spatial {
  final val Res = 10 // standard index resolution for the oracle queries

  private def docsGeo(s: org.apache.spark.sql.SparkSession, dir: String) =
    Geo.withGeo(Tables.documents(s, dir))

  private val cellCte: String =
    s"""pts AS (SELECT doc_id, n_chars, ${Geo.lonSql("doc_id")} AS lon,
       |  ${Geo.latSql("doc_id")} AS lat FROM documents),
       |cxy AS (SELECT doc_id, n_chars, lon, lat,
       |  ${Cells.cxSql("lon", Res)} AS cx, ${Cells.cySql("lat", Res)} AS cy FROM pts),
       |cells AS (SELECT doc_id, n_chars, lon, lat,
       |  ${Cells.packSql("cx", "cy", Res)} AS cell FROM cxy)""".stripMargin

  /** Geocode + codegen'd cell-id expression; checks tile assignments
    * (north rule: "matching ... tile assignments"). */
  val q_geocode_cell: QueryDef = QueryDef.sqlChecked(
    "q_geocode_cell",
    s"""WITH $cellCte
       |SELECT doc_id, lon, lat, cell FROM cells ORDER BY doc_id""".stripMargin) { (s, dir) =>
    docsGeo(s, dir)
      .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), Res))
      .select("doc_id", "lon", "lat", "cell")
      .orderBy(col("doc_id"))
  }

  /** Per-cell doc count + payload bytes — the skew/partition histogram
    * the engine's salted repartitioning is driven by. */
  val q_cell_hist: QueryDef = QueryDef.sqlChecked(
    "q_cell_hist",
    s"""WITH $cellCte
       |SELECT cell, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM cells GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
    docsGeo(s, dir)
      .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), Res))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("cell"))
  }

  /** The q_cell_hist aggregation routed through the EXPLICIT two-level
    * salting path (`Skew.saltedCount`/`saltedSum`, 8 buckets keyed on
    * doc_id): salt spreads a hot cell over 8 reducers, partials re-merge
    * per cell. Count/sum are algebraic, so the result is exactly the
    * plain GROUP BY — which is the DuckDB dual, proving the salting is
    * lossless on the real (Zipf-skewed) cell distribution. */
  val q_salted_cell_hist: QueryDef = QueryDef.sqlChecked(
    "q_salted_cell_hist",
    s"""WITH $cellCte
       |SELECT cell, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM cells GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
    val cells = docsGeo(s, dir)
      .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), Res))
    val n = graft.core.Skew
      .saltedCount(cells, col("cell"), col("doc_id"), 8, "n_docs")
      .withColumnRenamed("__key", "cell")
    val sc = graft.core.Skew
      .saltedSum(cells, col("cell"), col("n_chars"), col("doc_id"), 8, "sum_chars")
      .withColumnRenamed("__key", "cell")
    n.join(sc, Seq("cell")).orderBy(col("cell"))
  }

  /** DSM max-grid with the reference's 2x2 splat (operator A1). */
  val q_dsm_grid: QueryDef = QueryDef.sqlChecked(
    "q_dsm_grid",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    Gridding.dsm(Gridding.points(docsGeo(s, dir))).orderBy(col("gx"), col("gy"))
  }

  /** MIN-grid (A1 min mode). */
  val q_min_grid: QueryDef = QueryDef.sqlChecked(
    "q_min_grid",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy, min(qz) AS v FROM splat GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    Gridding.minGrid(Gridding.points(docsGeo(s, dir))).orderBy(col("gx"), col("gy"))
  }

  /** Exact per-cell median, upper-middle sorted[n/2] (A8). */
  val q_median_grid: QueryDef = QueryDef.sqlChecked(
    "q_median_grid",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy,
       |  list_sort(list(qz))[CAST(count(*) // 2 AS INT) + 1] AS v
       |FROM splat GROUP BY gx, gy ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    Gridding.medianGrid(Gridding.points(docsGeo(s, dir))).orderBy(col("gx"), col("gy"))
  }

  /** Grid zip J1: DSM - MIN with clamp at 0 (pubgeo orthoimage.h:612-647
    * via shr3d.cpp:146 — the "var" grid feeding tree detection). */
  val q_grid_zip: QueryDef = QueryDef.sqlChecked(
    "q_grid_zip",
    s"""WITH ${Gridding.splatCte},
       |dsm AS (SELECT gx, gy, max(qz) AS va FROM splat GROUP BY gx, gy),
       |mn  AS (SELECT gx, gy, min(qz) AS vb FROM splat GROUP BY gx, gy)
       |SELECT dsm.gx AS gx, dsm.gy AS gy, greatest(0, va - vb) AS v
       |FROM dsm JOIN mn ON dsm.gx = mn.gx AND dsm.gy = mn.gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val pts = Gridding.points(docsGeo(s, dir))
    Gridding.zipSubClamp(Gridding.dsm(pts), Gridding.minGrid(pts))
      .orderBy(col("gx"), col("gy"))
  }

  /** Dequantize round-trip (P6): raw -> meters for the DSM grid, checked
    * as exact doubles. */
  val q_dsm_meters: QueryDef = QueryDef.sqlChecked(
    "q_dsm_meters",
    s"""WITH ${Gridding.splatCte}
       |SELECT gx, gy,
       |  CAST(max(qz) AS DOUBLE) * (22.0 / 65535.0) + (-1.0) AS z_m
       |FROM splat GROUP BY gx, gy ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    Gridding.dsm(Gridding.points(docsGeo(s, dir)))
      .select(col("gx"), col("gy"), Quant.deq(col("v")).as("z_m"))
      .orderBy(col("gx"), col("gy"))
  }

  /** H3-facade hexagonal index histogram, bit-exact DuckDB dual: the
    * axial transform + cube rounding re-expressed in SQL with the SAME
    * IEEE op sequence. Two portability traps: Java Math.round(double)
    * is floor(x + 0.5) — NOT DuckDB round()'s half-away-from-zero — and
    * the branch reassignments use the ORIGINAL rounded values. */
  val q_hex_hist: QueryDef = {
    val hexRes = 8
    val s8 = s"(360.0 / ${4.0 * (1L << hexRes)})" // hex circumradius
    val off = 1L << 27
    QueryDef.sqlChecked(
      "q_hex_hist",
      s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
         |  ${Geo.latSql("doc_id")} AS lat FROM documents),
         |frac AS (SELECT doc_id,
         |  ((sqrt(3.0) / 3.0 * lon - 1.0 / 3.0 * lat) / $s8) AS xf,
         |  ((2.0 / 3.0 * lat) / $s8) AS zf FROM pts),
         |rounded AS (SELECT doc_id, xf, zf, -xf - zf AS yf,
         |  floor(xf + 0.5) AS rx, floor(-xf - zf + 0.5) AS ry,
         |  floor(zf + 0.5) AS rz FROM frac),
         |fixed AS (SELECT doc_id,
         |  CASE WHEN abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf)
         |       THEN -ry - rz ELSE rx END AS q,
         |  CASE WHEN NOT (abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf))
         |        AND NOT (abs(ry - yf) > abs(rz - zf))
         |       THEN -rx - ry ELSE rz END AS r FROM rounded),
         |cells AS (SELECT doc_id,
         |  ${hexRes.toLong << 56} + (CAST(q AS BIGINT) + $off) * ${1L << 28}
         |    + (CAST(r AS BIGINT) + $off) AS hex FROM fixed)
         |SELECT hex, COUNT(*) AS n_docs FROM cells GROUP BY hex
         |ORDER BY hex""".stripMargin) { (s, dir) =>
      docsGeo(s, dir)
        .withColumn("hex",
          graft.index.HexCellFunctions.hexCellId(col("lon"), col("lat"), hexRes))
        .groupBy(col("hex"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("hex"))
    }
  }

  /** Unrolled DuckDB dual of [[graft.index.CellCompact.compact]]: one
    * (group-by-parent, keep-incomplete, promote-complete) CTE triple per
    * level from `startRes` down to 0, then the union of every level's
    * survivors. */
  private def compactOracle(startRes: Int): String = {
    val mask = 0x00FFFFFFFFFFFFFFL
    def par(c: String, toRes: Int) =
      s"((CAST($toRes AS BIGINT) << 56) | ((($c) & $mask) >> 2))"
    val sb = new StringBuilder(
      s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
         |  ${Geo.latSql("doc_id")} AS lat FROM documents),
         |cxy AS (SELECT ${Cells.cxSql("lon", startRes)} AS cx,
         |  ${Cells.cySql("lat", startRes)} AS cy FROM pts),
         |lvl$startRes AS (SELECT DISTINCT ${Cells.packSql("cx", "cy", startRes)} AS cell
         |  FROM cxy)""".stripMargin)
    for (l <- startRes to 1 by -1) {
      sb ++= s""",
         |g$l AS (SELECT ${par("cell", l - 1)} AS p, count(*) AS n
         |  FROM lvl$l GROUP BY 1),
         |keep$l AS (SELECT cell FROM lvl$l
         |  WHERE ${par("cell", l - 1)} IN (SELECT p FROM g$l WHERE n < 4)),
         |lvl${l - 1} AS (SELECT p AS cell FROM g$l WHERE n = 4)""".stripMargin
    }
    val union = ((1 to startRes).map(l => s"SELECT cell FROM keep$l") :+
      "SELECT cell FROM lvl0").mkString(" UNION ALL ")
    sb ++= s"\nSELECT cell FROM ($union) ORDER BY cell"
    sb.toString
  }

  private val CompactRes = 4 // coarse enough that sibling groups complete

  /** Hierarchical cell-set compaction ([[graft.index.CellCompact]], the
    * H3 compactCells / S2 Normalize op): the doc coverage at res 4
    * rewritten as the minimal mixed-res cover. Engine is one
    * groupBy(parent) per level with the 4-bounded collect_list re-emit;
    * the dual unrolls the same recursion as static CTEs. */
  val q_cell_compact: QueryDef = QueryDef.sqlChecked(
    "q_cell_compact",
    compactOracle(CompactRes)) { (s, dir) =>
    val cells = docsGeo(s, dir)
      .select(CellFunctions.cellId(col("lon"), col("lat"), CompactRes).as("cell"))
    graft.index.CellCompact.compact(cells, CompactRes).orderBy(col("cell"))
  }

  private val BufferRes = 6
  private val BufferK = 2

  /** Cell-cover BUFFER ([[graft.index.CellOps.buffer]]): the doc
    * coverage at res 6 dilated by Chebyshev distance 2, edge-clipped —
    * the AOI proximity-prefilter primitive. Engine is a literal-offset
    * explode + distinct (generator + one hash agg, no join, pure
    * codegen'd bit arithmetic incl. the Morton de/re-interleave); the
    * dual dilates on (cx, cy) coordinates and repacks. */
  val q_cover_buffer: QueryDef = QueryDef.sqlChecked(
    "q_cover_buffer", {
      val offs = (for (dy <- -BufferK to BufferK; dx <- -BufferK to BufferK)
        yield s"($dx, $dy)").mkString(", ")
      val n = 1L << BufferRes
      s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
         |  ${Geo.latSql("doc_id")} AS lat FROM documents),
         |cxy AS (SELECT DISTINCT ${Cells.cxSql("lon", BufferRes)} AS cx,
         |  ${Cells.cySql("lat", BufferRes)} AS cy FROM pts),
         |dil AS (SELECT DISTINCT cx + o.dx AS nx, cy + o.dy AS ny
         |  FROM cxy CROSS JOIN (VALUES $offs) o(dx, dy)
         |  WHERE cx + o.dx BETWEEN 0 AND ${n - 1}
         |    AND cy + o.dy BETWEEN 0 AND ${n - 1})
         |SELECT ${Cells.packSql("nx", "ny", BufferRes)} AS cell FROM dil
         |ORDER BY cell""".stripMargin
    }) { (s, dir) =>
    val cells = docsGeo(s, dir)
      .select(CellFunctions.cellId(col("lon"), col("lat"), BufferRes).as("cell"))
      .distinct()
    graft.index.CellOps.buffer(cells, BufferRes, BufferK).orderBy(col("cell"))
  }

  /** Box-kernel point density ([[graft.index.CellOps.density]]): every
    * doc splats +1 into its Chebyshev-2 disk at res 6 — the smoothed
    * heatmap surface over the crawl's geocoded scatter. Duplicates count
    * (unlike q_cover_buffer's set semantics); the engine is a generator
    * + one map-side-combined hash agg, the dual dilates-and-counts on
    * raw coordinates. */
  val q_density_grid: QueryDef = QueryDef.sqlChecked(
    "q_density_grid", {
      val offs = (for (dy <- -BufferK to BufferK; dx <- -BufferK to BufferK)
        yield s"($dx, $dy)").mkString(", ")
      val n = 1L << BufferRes
      s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
         |  ${Geo.latSql("doc_id")} AS lat FROM documents),
         |cxy AS (SELECT ${Cells.cxSql("lon", BufferRes)} AS cx,
         |  ${Cells.cySql("lat", BufferRes)} AS cy FROM pts),
         |dil AS (SELECT cx + o.dx AS nx, cy + o.dy AS ny
         |  FROM cxy CROSS JOIN (VALUES $offs) o(dx, dy)
         |  WHERE cx + o.dx BETWEEN 0 AND ${n - 1}
         |    AND cy + o.dy BETWEEN 0 AND ${n - 1})
         |SELECT ${Cells.packSql("nx", "ny", BufferRes)} AS cell,
         |  count(*) AS n
         |FROM dil GROUP BY 1 ORDER BY cell""".stripMargin
    }) { (s, dir) =>
    val cells = docsGeo(s, dir)
      .select(CellFunctions.cellId(col("lon"), col("lat"), BufferRes).as("cell"))
    graft.index.CellOps.density(cells, BufferRes, BufferK).orderBy(col("cell"))
  }

  /** Compaction ROUND-TRIP at the gate ([[graft.index.CellCompact]]):
    * uncompact(compact(S)) must be S itself — the oracle is simply the
    * original distinct cell set, so the whole mixed-res recursion is
    * pinned invertible by the driver hash. */
  val q_cell_uncompact: QueryDef = QueryDef.sqlChecked(
    "q_cell_uncompact",
    s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
       |  ${Geo.latSql("doc_id")} AS lat FROM documents),
       |cxy AS (SELECT ${Cells.cxSql("lon", CompactRes)} AS cx,
       |  ${Cells.cySql("lat", CompactRes)} AS cy FROM pts)
       |SELECT DISTINCT ${Cells.packSql("cx", "cy", CompactRes)} AS cell
       |FROM cxy ORDER BY cell""".stripMargin) { (s, dir) =>
    val cells = docsGeo(s, dir)
      .select(CellFunctions.cellId(col("lon"), col("lat"), CompactRes).as("cell"))
    graft.index.CellCompact.uncompact(
        graft.index.CellCompact.compact(cells, CompactRes), CompactRes)
      .orderBy(col("cell"))
  }

  /** Geohash encode ([[graft.index.Geohash]], codegen'd expression) at
    * precision 8 plus the nesting prefix at precision 4 — the
    * string-keyed third index family next to the Morton cells and the
    * hex lattice. The dual rebuilds the 40-bit lon-first interleave
    * relationally: per-axis 20-bit integer refinement (one IEEE
    * multiply + floor, identical both engines), a 40-row bit-position
    * join summing shifted bits, then base-32 character extraction via
    * an 8-row join + ordered string_agg — so the oracle match pins
    * every bit of every hash, not just a spot value. */
  val q_geohash: QueryDef = QueryDef.sqlChecked(
    "q_geohash",
    s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
       |    ${Geo.latSql("doc_id")} AS lat FROM documents),
       |ix AS (SELECT doc_id,
       |    CAST(least(greatest(floor((lon + 180.0) / 360.0 * 1048576), 0),
       |      1048575) AS BIGINT) AS li,
       |    CAST(least(greatest(floor((lat + 90.0) / 180.0 * 1048576), 0),
       |      1048575) AS BIGINT) AS la
       |  FROM pts),
       |vals AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN i % 2 = 0
       |      THEN ((li >> (19 - i // 2)) & 1) << (39 - i)
       |      ELSE ((la >> (19 - i // 2)) & 1) << (39 - i) END)
       |      AS BIGINT) AS v
       |  FROM ix CROSS JOIN range(40) t(i) GROUP BY doc_id),
       |gh AS (SELECT doc_id,
       |    string_agg(substr('0123456789bcdefghjkmnpqrstuvwxyz',
       |      CAST((v >> (5 * (7 - k))) & 31 AS INTEGER) + 1, 1),
       |      '' ORDER BY k) AS gh8
       |  FROM vals CROSS JOIN range(8) t(k) GROUP BY doc_id)
       |SELECT doc_id, gh8, substr(gh8, 1, 4) AS gh4
       |FROM gh ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val gh = graft.index.GeohashFunctions.geohash(col("lon"), col("lat"), 8)
    docsGeo(s, dir)
      .select(col("doc_id"), gh.as("gh8"))
      .withColumn("gh4", substring(col("gh8"), 1, 4))
      .orderBy(col("doc_id"))
  }

  /** Hilbert curve index ([[graft.index.Hilbert]], codegen'd
    * expression) of the order-8 cell coordinates — the locality-
    * optimal layout curve next to Morton (HilbertSpec pins the
    * adjacent-successor property Morton lacks). The dual unrolls the
    * identical quadrant-rotation iteration into 8 chained CTE levels
    * (`HilbertFunctions.xy2dSqlCtes`), pinning every bit of every
    * index. */
  val q_hilbert: QueryDef = QueryDef.sqlChecked(
    "q_hilbert",
    s"""WITH pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
       |    ${Geo.latSql("doc_id")} AS lat FROM documents),
       |src AS (SELECT doc_id, CAST(0 AS BIGINT) AS d,
       |    ${Cells.cxSql("lon", 8)} AS x, ${Cells.cySql("lat", 8)} AS y,
       |    ${Cells.cxSql("lon", 8)} AS cx, ${Cells.cySql("lat", 8)} AS cy
       |  FROM pts),
       |${graft.index.HilbertFunctions.xy2dSqlCtes("src", 8,
            Seq("doc_id", "cx", "cy"))}
       |SELECT doc_id, cx, cy, h FROM out ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
    val cx = floor((col("lon") + 180.0) / 360.0 * 256.0).cast("long")
    val cy = floor((col("lat") + 90.0) / 180.0 * 256.0).cast("long")
    docsGeo(s, dir)
      .select(col("doc_id"), cx.as("cx"), cy.as("cy"))
      .withColumn("h",
        graft.index.HilbertFunctions.hilbert(col("cx"), col("cy"), 8))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(
    q_geocode_cell, q_cell_hist, q_salted_cell_hist, q_hex_hist, q_dsm_grid,
    q_min_grid, q_median_grid, q_grid_zip, q_dsm_meters, q_cell_compact,
    q_cover_buffer, q_density_grid, q_cell_uncompact, q_geohash, q_hilbert)
}
