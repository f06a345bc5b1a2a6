package graft.cc

import graft.stencil.TileStencil.Bounds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * G3 fillInsideBuildings (pubgeo `src/shr3d/shr3d.cpp:1184-1265`): every
 * `target`-class component whose ENTIRE external 8-neighborhood is
 * `fill`-class is rewritten to `fill`. Absent or out-of-bounds
 * neighbors break enclosure (the reference's edge-touching rule).
 *
 * Pure composition: CCL on the target cells, one neighbor join, one
 * all-true aggregate per label, one rewrite join.
 */
object FillEnclosed {

  def apply(cells: DataFrame /* gx, gy, cls */, target: Int, fill: Int,
            bounds: Bounds, tileSize: Int = 128): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val tgt = cells.filter(col("cls") === target)
      .select(col("gx"), col("gy"), lit(1).as("v"))
    val labeled = ConnectedComponents.label(tgt, bounds, tileSize)
      .select(col("gx"), col("gy"), col("label"))

    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
      .toDF("dx", "dy")
    val nbp = labeled.crossJoin(broadcast(offs))
      .select(col("label"), (col("gx") + col("dx")).as("nx"),
        (col("gy") + col("dy")).as("ny"))
    val clsN = cells.select(col("gx").as("nx"), col("gy").as("ny"),
      col("cls").as("ncls"))
    // ok: 1 = fill neighbor, 0 = breaks enclosure, null = internal (skip)
    val ext = nbp.join(clsN, Seq("nx", "ny"), "left")
      .select(col("label"),
        when(col("nx") < 0 || col("nx") >= bounds.w
          || col("ny") < 0 || col("ny") >= bounds.h, lit(0))
          .when(col("ncls") === target, lit(null).cast("int"))
          .when(col("ncls") === fill, lit(1))
          .otherwise(lit(0)).as("ok"))
    val enclosed = ext.groupBy("label").agg(min("ok").as("m"))
      .filter(col("m") === 1).select("label")

    val rewrite = labeled.join(enclosed, Seq("label"), "left_semi")
      .select(col("gx"), col("gy"))
    cells.join(rewrite.withColumn("__hit", lit(1)), Seq("gx", "gy"), "left")
      .select(col("gx"), col("gy"),
        when(col("__hit") === 1, lit(fill)).otherwise(col("cls")).as("cls"))
  }
}
