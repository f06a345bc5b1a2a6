package graft.vector

import graft.index.Cells
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKTReader

/**
 * Vector -> raster: burn polygons into the sparse cell table (the
 * inverse of Vectorize; together they close SURVEY.md's raster<->vector
 * loop). A cell is burned when the polygon covers its center — the
 * standard center-sampling rule, which makes
 * Vectorize(Rasterize(poly)) ~ poly up to half-cell quantization.
 *
 * Distribution: polygons explode to their covering lattice windows
 * (driver-side per polygon — windows only, not cells), the lattice
 * cells generate distributed via spark.range, and the exact JTS
 * covers() test runs per candidate cell with per-executor prepared
 * geometries.
 */
object Rasterize {

  /** polygons: (id, wkt) in CELL coordinates. Returns (gx, gy, id). */
  def apply(spark: SparkSession, polygons: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    val gf = new GeometryFactory()
    val windows = polygons.map { case (id, wkt) =>
      val env = new WKTReader(gf).read(wkt).getEnvelopeInternal
      (id, wkt, math.floor(env.getMinX).toLong, math.floor(env.getMinY).toLong,
        math.ceil(env.getMaxX).toLong, math.ceil(env.getMaxY).toLong)
    }
    val cand = windows.toDF("id", "wkt", "x0", "y0", "x1", "y1")
      .withColumn("gx", explode(sequence(col("x0"), col("x1"))))
      .withColumn("gy", explode(sequence(col("y0"), col("y1"))))
    val covers = udf { (wkt: String, gx: Long, gy: Long) =>
      Geoms.covers(wkt, gx + 0.5, gy + 0.5)
    }
    cand.filter(covers(col("wkt"), col("gx"), col("gy")))
      .select(col("gx"), col("gy"), col("id"))
  }

  /** Burn lon/lat polygons onto a grid spec: a cell is burned when the
    * polygon covers its CENTER lon/lat. Returns (gx, gy, id). */
  def geo(spark: SparkSession, polygons: Seq[(Long, String)],
          lon0: Double, lat0: Double, gsd: Double): DataFrame = {
    import spark.implicits._
    val gf = new GeometryFactory()
    val windows = polygons.map { case (id, wkt) =>
      val env = new WKTReader(gf).read(wkt).getEnvelopeInternal
      (id, wkt,
        math.floor((env.getMinX - lon0) / gsd).toLong,
        math.floor((env.getMinY - lat0) / gsd).toLong,
        math.ceil((env.getMaxX - lon0) / gsd).toLong,
        math.ceil((env.getMaxY - lat0) / gsd).toLong)
    }
    val cand = windows.toDF("id", "wkt", "x0", "y0", "x1", "y1")
      .withColumn("gx", explode(sequence(col("x0"), col("x1"))))
      .withColumn("gy", explode(sequence(col("y0"), col("y1"))))
    val covers = udf { (wkt: String, gx: Long, gy: Long) =>
      Geoms.covers(wkt, lon0 + (gx + 0.5) * gsd, lat0 + (gy + 0.5) * gsd)
    }
    cand.filter(covers(col("wkt"), col("gx"), col("gy")))
      .select(col("gx"), col("gy"), col("id"))
  }

  private object Geoms {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, org.locationtech.jts.geom.prep.PreparedGeometry]()
    @transient private lazy val gf = new GeometryFactory()
    def covers(wkt: String, x: Double, y: Double): Boolean =
      cache.computeIfAbsent(wkt,
          w => org.locationtech.jts.geom.prep.PreparedGeometryFactory
            .prepare(new WKTReader(gf).read(w)))
        .covers(gf.createPoint(new Coordinate(x, y)))
  }
}
