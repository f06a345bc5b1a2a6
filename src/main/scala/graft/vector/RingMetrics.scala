package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact polygon-ring metrics — the vector-analytics counterpart of the
 * outline tracers ([[Vectorize]], [[RefTrace]]): given a vertex table of
 * closed rings in INTEGER coordinates, compute per ring the shoelace
 * signed double-area, winding orientation, L1 perimeter, vertex count,
 * and area-weighted centroid (pubgeo stores traced building outlines as
 * exactly such vertex sequences, `src/common/geo_polygon.h:27-45`; area
 * / orientation are the standard post-trace products the reference's
 * consumers derive).
 *
 * Arithmetic contract: every aggregate is EXACT —
 *   area2 = Σ (x·y' − x'·y)                 (BIGINT; |coord| ≤ 2^21
 *                                            keeps terms ≪ 2^63)
 *   per_l1 = Σ |x−x'| + |y−y'|              (BIGINT)
 *   cx_num = Σ (x+x')·(x·y'−x'·y)           (DECIMAL(38,0): one term can
 *                                            exceed 2^63 at 10^7-unit
 *                                            coords, so terms and sums
 *                                            stay in exact decimal)
 * and the centroid is ONE IEEE division of two exactly-computed numbers
 * (`cx = cx_num / (3·area2)` — both casts round-to-nearest identically
 * in any engine), so results are bit-identical across engines.
 *
 * Scale shape: one window + one hash aggregate, both keyed by
 * (poly, ring) — a ring is bounded (the tracers cap component size), so
 * no task ever holds more than one ring's vertices, and 10^9 polygons
 * are just 10^9 independent groups. The successor vertex comes from a
 * per-ring `lead` with a `first_value` wrap — never a self-join.
 *
 * Input columns: `poly` (string key), `ring` (int, 0 = outer), `pos`
 * (0-based vertex order, closing vertex NOT repeated), `x`, `y` (long).
 */
object RingMetrics {

  def metrics(verts: DataFrame): DataFrame = {
    val w = Window.partitionBy("poly", "ring").orderBy("pos")
    val dec: Column => Column = _.cast("decimal(20,0)")
    val withNext = verts
      .withColumn("_nx", coalesce(lead(col("x"), 1).over(w),
        first(col("x")).over(w)))
      .withColumn("_ny", coalesce(lead(col("y"), 1).over(w),
        first(col("y")).over(w)))
      .withColumn("_cross", col("x") * col("_ny") - col("_nx") * col("y"))
    val g = withNext.groupBy("poly", "ring").agg(
      count(lit(1)).as("n_pts"),
      sum(col("_cross")).as("area2"),
      sum(dec(col("x") + col("_nx")) * dec(col("_cross"))).as("_cxn"),
      sum(dec(col("y") + col("_ny")) * dec(col("_cross"))).as("_cyn"),
      sum(abs(col("x") - col("_nx")) + abs(col("y") - col("_ny")))
        .as("per_l1"))
    g.select(col("poly"), col("ring"), col("n_pts"), col("area2"),
      when(col("area2") > 0, "ccw").when(col("area2") < 0, "cw")
        .otherwise("flat").as("orient"),
      when(col("area2") =!= 0,
        col("_cxn").cast("double") / (col("area2") * 3).cast("double"))
        .as("cx"),
      when(col("area2") =!= 0,
        col("_cyn").cast("double") / (col("area2") * 3).cast("double"))
        .as("cy"),
      col("per_l1"))
  }

  /** Parse the ring vertex lists out of a `POLYGON ((...), (...))` WKT
    * into (ring, pos, x, y) rows, coordinates scaled by `scale` and
    * rounded to long; a repeated closing vertex is dropped. Driver-side
    * helper for fixture polygons (rings stream through [[metrics]] as
    * rows either way). */
  def wktRings(wkt: String, scale: Double): Seq[(Int, Int, Long, Long)] = {
    val body = wkt.trim.stripPrefix("POLYGON").trim
      .stripPrefix("(").stripSuffix(")")
    // split top-level rings on "),(" boundaries
    val rings = body.split("\\)\\s*,\\s*\\(")
      .map(_.replace("(", "").replace(")", "").trim)
    rings.toIndexedSeq.zipWithIndex.flatMap { case (r, ri) =>
      val pts = r.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        val Array(xs, ys) = p.split("\\s+")
        (math.round(xs.toDouble * scale), math.round(ys.toDouble * scale))
      }
      val open =
        if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
      open.zipWithIndex.map { case ((x, y), i) => (ri, i, x, y) }
    }
  }
}
