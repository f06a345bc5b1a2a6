package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Built-in AOI polygon set (FIXTURES.md F4): rectangles (incl. a sliver),
 * a triangle, a concave L-shape, and a polygon with a hole. All vertex
 * coordinates sit on .0005 fractions while geocoded docs have exactly 3
 * decimals, so no document can ever fall on an AOI boundary — strict
 * (interior-only, JTS `contains`) and closed tests agree, and the DuckDB
 * oracle can use plain strict inequalities.
 */
object Aoi {
  final case class AoiDef(aoiId: Int, wkt: String, oracleSqlPredicate: String)

  private def rect(id: Int, x0: Double, y0: Double, x1: Double, y1: Double): AoiDef =
    AoiDef(id,
      s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))",
      s"lon > $x0 AND lon < $x1 AND lat > $y0 AND lat < $y1")

  /** Strictly-inside test for a CCW triangle: all edge cross products
    * positive — identical arithmetic in Spark (via JTS exact result) and
    * SQL (explicit cross products). */
  private def tri(id: Int, x1: Double, y1: Double, x2: Double, y2: Double,
                  x3: Double, y3: Double): AoiDef = {
    def edge(ax: Double, ay: Double, bx: Double, by: Double) =
      s"(($bx - $ax) * (lat - $ay) - (($by - $ay)) * (lon - $ax)) > 0"
    AoiDef(id,
      s"POLYGON (($x1 $y1, $x2 $y2, $x3 $y3, $x1 $y1))",
      s"${edge(x1, y1, x2, y2)} AND ${edge(x2, y2, x3, y3)} AND ${edge(x3, y3, x1, y1)}")
  }

  val defs: Seq[AoiDef] = Seq(
    rect(1, -120.0005, -40.0005, -60.0005, 10.0005),
    rect(2, 0.0005, 0.0005, 90.0005, 60.0005),
    // sub-cell sliver
    rect(3, 150.0005, -20.0005, 150.2005, 30.0005),
    // CCW triangle
    tri(4, -170.0005, -80.0005, -100.0005, -80.0005, -135.0005, -20.0005),
    // concave L-shape = union of two rectangles sharing the x=120.0005 seam
    AoiDef(5,
      "POLYGON ((100.0005 -70.0005, 140.0005 -70.0005, 140.0005 -50.0005, " +
        "120.0005 -50.0005, 120.0005 -30.0005, 100.0005 -30.0005, 100.0005 -70.0005))",
      "(lon > 100.0005 AND lon < 140.0005 AND lat > -70.0005 AND lat < -50.0005) OR " +
        "(lon > 100.0005 AND lon < 120.0005 AND lat > -50.0005 AND lat < -30.0005)"),
    // rectangle with a rectangular hole
    AoiDef(6,
      "POLYGON ((-60.0005 40.0005, -0.0005 40.0005, -0.0005 80.0005, -60.0005 80.0005, -60.0005 40.0005), " +
        "(-40.0005 50.0005, -20.0005 50.0005, -20.0005 70.0005, -40.0005 70.0005, -40.0005 50.0005))",
      "(lon > -60.0005 AND lon < -0.0005 AND lat > 40.0005 AND lat < 80.0005) AND NOT " +
        "(lon > -40.0005 AND lon < -20.0005 AND lat > 50.0005 AND lat < 70.0005)"))

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defs.map(a => (a.aoiId, a.wkt)).toDF("aoi_id", "wkt")
  }

  /** DuckDB oracle: UNION ALL of per-AOI strict predicates over the
    * geocoded point CTE (expects columns doc_id, lon, lat in `pts`). */
  def oracleHitsSql: String =
    defs.map(a => s"SELECT ${a.aoiId} AS aoi_id, doc_id FROM pts WHERE ${a.oracleSqlPredicate}")
      .mkString("\nUNION ALL\n")
}
