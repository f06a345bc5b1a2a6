package graft.queries

import graft.core.{Geo, Quant, Tables}
import graft.grid.Gridding
import org.apache.spark.sql.functions._

/**
 * Data-derived quantization (A5) and adjust_scale (pubgeo
 * `orthoimage.h:373-378`, `shr3d.cpp:166-178,213-217`): the fixed world
 * constants in [[Quant]] are only valid for the geocoded doc cloud;
 * these queries fit offset/scale to a derived z whose range is NOT
 * [0, 20) and re-quantize between scales, both bit-exact against the
 * DuckDB dual (identical IEEE expression shapes; the fit parameters are
 * two driver-held doubles on the Spark side and an inlined aggregate on
 * the SQL side — same bits either way).
 */
object QuantQueries {

  private val spec = Gridding.GridSpec(gsd = 10.0)

  private def ptsZ2(s: org.apache.spark.sql.SparkSession, dir: String) =
    Geo.withGeo(Tables.documents(s, dir))
      .withColumn("z2", col("z") * 4.0 - 17.0) // range [-17, 63)

  private val ptsCte =
    s"""pts AS (SELECT doc_id, ${Geo.lonSql("doc_id")} AS lon,
       |  ${Geo.latSql("doc_id")} AS lat, ${Geo.zSql("doc_id")} AS z,
       |  (${Geo.zSql("doc_id")}) * 4.0 - 17.0 AS z2 FROM documents),
       |f AS (SELECT min(z2) AS zmin, max(z2) AS zmax FROM pts)""".stripMargin

  /** A5: grid quantized with the DATA-fitted offset/scale over a z range
    * that the fixed constants would clip. */
  val q_quant_fit: QueryDef = QueryDef.sqlChecked(
    "q_quant_fit",
    s"""WITH $ptsCte,
       |q AS (SELECT ${Gridding.bxSql("lon", spec)} AS bx,
       |  ${Gridding.bySql("lat", spec)} AS by,
       |  CAST(floor((z2 - (zmin - 1.0))
       |    / ((zmax + 1.0 - (zmin - 1.0)) / 65535.0)) AS BIGINT) AS qz
       |  FROM pts CROSS JOIN f),
       |splat AS (SELECT qz, bx + dx AS gx, by + dy AS gy
       |  FROM q CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(dx, dy))
       |SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy
       |ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val pts = ptsZ2(s, dir)
    val f = Quant.fit(pts, "z2")
    val based = pts
      .withColumn("bx", floor((col("lon") - lit(spec.lon0)) / lit(spec.gsd)).cast("long"))
      .withColumn("by", floor((col("lat") - lit(spec.lat0)) / lit(spec.gsd)).cast("long"))
      .withColumn("qz", Quant.q(col("z2"), f))
    Gridding.splat2x2(based).groupBy("gx", "gy").agg(max("qz").as("v"))
      .orderBy(col("gx"), col("gy"))
  }

  /** adjust_scale: the standard fixed-scale DSM re-quantized to the
    * reconciled scale of (fixed, fitted-z2) — the setDTM0 mixing rule. */
  val q_adjust_scale: QueryDef = QueryDef.sqlChecked(
    "q_adjust_scale",
    s"""WITH $ptsCte,
       |base AS (SELECT ${Quant.qSql("z")} AS qz,
       |  ${Gridding.bxSql("lon", spec)} AS bx,
       |  ${Gridding.bySql("lat", spec)} AS by FROM pts),
       |splat AS (SELECT qz, bx + dx AS gx, by + dy AS gy
       |  FROM base CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(dx, dy)),
       |dsm AS (SELECT gx, gy, max(qz) AS v FROM splat GROUP BY gx, gy),
       |params AS (SELECT
       |  least(-1.0, zmin - 1.0) AS t_off,
       |  (greatest((-1.0) + 65535.0 * (22.0 / 65535.0),
       |            (zmin - 1.0) + 65535.0 * ((zmax + 1.0 - (zmin - 1.0)) / 65535.0))
       |   - least(-1.0, zmin - 1.0)) / 65535.0 AS t_scale FROM f)
       |SELECT gx, gy,
       |  ${Quant.adjustScaleSql("v", "-1.0", "(22.0 / 65535.0)", "t_off", "t_scale")} AS v_adj
       |FROM dsm CROSS JOIN params ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val pts = ptsZ2(s, dir)
    val f0 = Quant.Fit(Quant.Offset, Quant.Scale)
    val f1 = Quant.fit(pts, "z2")
    val t = Quant.reconcile(f0, f1)
    val dsm = Gridding.dsm(Gridding.points(pts, spec))
    dsm.select(col("gx"), col("gy"),
      Quant.adjustScale(col("v"), f0, t).as("v_adj"))
      .orderBy(col("gx"), col("gy"))
  }

  /** The full setDTM0 mixing rule (shr3d.cpp:212-231): an external prior
    * DTM (here the fitted-z2 grid standing in for a read-from-file
    * prior) and the standard MIN grid are re-quantized to the reconciled
    * common fit, and MIN is clamped to >= DTM0 where both are non-void.
    * Exactly the ops Shr3d wires when Config.dtm0 is set (Shr3dSpec
    * covers the product path; this query pins the arithmetic). */
  val q_dtm0_mix: QueryDef = QueryDef.sqlChecked(
    "q_dtm0_mix",
    s"""WITH $ptsCte,
       |prior AS (SELECT ${Gridding.bxSql("lon", spec)} AS bx,
       |  ${Gridding.bySql("lat", spec)} AS by,
       |  CAST(floor((z2 - (zmin - 1.0))
       |    / ((zmax + 1.0 - (zmin - 1.0)) / 65535.0)) AS BIGINT) AS qz
       |  FROM pts CROSS JOIN f),
       |priorSplat AS (SELECT qz, bx + dx AS gx, by + dy AS gy
       |  FROM prior CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(dx, dy)),
       |dtm0 AS (SELECT gx, gy, max(qz) AS v FROM priorSplat GROUP BY gx, gy),
       |base AS (SELECT ${Quant.qSql("z")} AS qz,
       |  ${Gridding.bxSql("lon", spec)} AS bx,
       |  ${Gridding.bySql("lat", spec)} AS by FROM pts),
       |baseSplat AS (SELECT qz, bx + dx AS gx, by + dy AS gy
       |  FROM base CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) sp(dx, dy)),
       |mn AS (SELECT gx, gy, min(qz) AS v FROM baseSplat GROUP BY gx, gy),
       |params AS (SELECT
       |  least(-1.0, zmin - 1.0) AS t_off,
       |  (greatest((-1.0) + 65535.0 * (22.0 / 65535.0),
       |            (zmin - 1.0) + 65535.0 * ((zmax + 1.0 - (zmin - 1.0)) / 65535.0))
       |   - least(-1.0, zmin - 1.0)) / 65535.0 AS t_scale,
       |  zmin - 1.0 AS p_off,
       |  (zmax + 1.0 - (zmin - 1.0)) / 65535.0 AS p_scale FROM f),
       |adj AS (SELECT mn.gx, mn.gy,
       |  ${Quant.adjustScaleSql("mn.v", "-1.0", "(22.0 / 65535.0)", "t_off", "t_scale")} AS v_min,
       |  ${Quant.adjustScaleSql("d.v", "p_off", "p_scale", "t_off", "t_scale")} AS v_dtm0
       |  FROM mn CROSS JOIN params LEFT JOIN dtm0 d ON mn.gx = d.gx AND mn.gy = d.gy)
       |SELECT gx, gy,
       |  CASE WHEN v_dtm0 IS NOT NULL AND v_min < v_dtm0 THEN v_dtm0
       |       ELSE v_min END AS v_min, v_dtm0
       |FROM adj ORDER BY gx, gy""".stripMargin) { (s, dir) =>
    val pts = ptsZ2(s, dir)
    val f0 = Quant.Fit(Quant.Offset, Quant.Scale)
    val f1 = Quant.fit(pts, "z2")
    val t = Quant.reconcile(f0, f1)
    val based = pts
      .withColumn("bx", floor((col("lon") - lit(spec.lon0)) / lit(spec.gsd)).cast("long"))
      .withColumn("by", floor((col("lat") - lit(spec.lat0)) / lit(spec.gsd)).cast("long"))
    val dtm0 = Gridding.splat2x2(based.withColumn("qz", Quant.q(col("z2"), f1)))
      .groupBy("gx", "gy").agg(max("qz").as("v"))
      .select(col("gx"), col("gy"), Quant.adjustScale(col("v"), f1, t).as("pv"))
    val mn = Gridding.splat2x2(based.withColumn("qz", Quant.q(col("z"))))
      .groupBy("gx", "gy").agg(min("qz").as("v"))
      .select(col("gx"), col("gy"), Quant.adjustScale(col("v"), f0, t).as("mv"))
    mn.join(dtm0, Seq("gx", "gy"), "left")
      .select(col("gx"), col("gy"),
        when(col("pv").isNotNull && col("mv") < col("pv"), col("pv"))
          .otherwise(col("mv")).as("v_min"),
        col("pv").as("v_dtm0"))
      .orderBy(col("gx"), col("gy"))
  }

  val all: Seq[QueryDef] = Seq(q_quant_fit, q_adjust_scale, q_dtm0_mix)
}
