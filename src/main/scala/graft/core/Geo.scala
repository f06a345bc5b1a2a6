package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic geocoding of documents to (lon, lat, z) points.
 *
 * Mirrors the reference's point-cloud data model (pubgeo
 * `src/common/PointCloud.h:63-98`: x, y, z per point) over the web-doc
 * table: each document becomes one "point" whose coordinates derive from
 * pure integer arithmetic on `doc_id`, so that the DuckDB oracle can
 * reproduce them bit-exactly (IEEE-754 binary64 in both engines).
 *
 *   lon = (doc_id * 16807  mod 360000) / 1000 - 180      in [-180, 180)
 *   lat = (doc_id * 48271  mod 170000) / 1000 -  85      in [ -85,  85)
 *   z   = (doc_id * 69621  mod  20000) / 1000            in [   0,  20)
 *
 * Multipliers are classic Lehmer/minstd constants — the point is
 * deterministic scatter, not randomness quality.
 */
object Geo {
  final val LonM = 16807L
  final val LatM = 48271L
  final val ZM   = 69621L

  def lonCol(id: Column): Column = (id * LonM % 360000L) / lit(1000.0) - lit(180.0)
  def latCol(id: Column): Column = (id * LatM % 170000L) / lit(1000.0) - lit(85.0)
  def zCol(id: Column): Column   = (id * ZM   %  20000L) / lit(1000.0)

  /** Adds lon/lat/z columns to a DataFrame with a `doc_id` column. */
  def withGeo(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("lon", lonCol(col(idCol)))
      .withColumn("lat", latCol(col(idCol)))
      .withColumn("z", zCol(col(idCol)))

  // ---- DuckDB-SQL duals (same expression shape => same IEEE result) ----
  def lonSql(id: String): String = s"((($id * 16807) % 360000) / 1000.0 - 180.0)"
  def latSql(id: String): String = s"((($id * 48271) % 170000) / 1000.0 - 85.0)"
  def zSql(id: String): String   = s"((($id * 69621) % 20000) / 1000.0)"
}
