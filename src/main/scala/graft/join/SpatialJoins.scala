package graft.join

import graft.index.{CellFunctions, Cells}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.WKTReader

/**
 * Spatial joins added by the north rule (SURVEY.md §2.4 J4/J5). The
 * reference has no relational joins; its nearest analog is the
 * point-to-grid splat (pubgeo `src/common/orthoimage.h:400-409`).
 *
 * Scale design:
 *  - PIP: polygons explode to covering index cells (small table,
 *    broadcast); points carry one codegen'd cell id; the join is a
 *    broadcast hash equi-join on the cell, and the exact JTS test runs
 *    only on cell-colocated candidates. No shuffle of the point table.
 *  - kNN: candidate cells grow in Chebyshev rings around each query
 *    (geometric radius growth) until the kth-neighbor distance is
 *    provably inside the ring (points outside disk(r) are at coordinate
 *    distance >= r * cellHeight). Per round: one broadcast join + one
 *    per-query window rank. Exact — matches brute force bit-for-bit.
 */
object SpatialJoins {

  /** Executor-side cache of prepared geometries, keyed by WKT. */
  private object Geoms {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, PreparedGeometry]()
    @transient private lazy val gf = new GeometryFactory()

    def prepared(wkt: String): PreparedGeometry =
      cache.computeIfAbsent(wkt, w =>
        PreparedGeometryFactory.prepare(new WKTReader(gf).read(w)))

    def contains(wkt: String, lon: Double, lat: Double): Boolean =
      prepared(wkt).contains(gf.createPoint(new Coordinate(lon, lat)))
  }

  /** Interior-only point-in-polygon join: docs (doc_id, lon, lat) x AOIs,
    * returns (aoi_id, doc_id, lon, lat). The session comes from `pts`,
    * and the body is stateless (one codegen'd cell id on the probe side,
    * a broadcast hash equi-join against the exploded cell-cover table,
    * then the exact JTS test on cell-colocated candidates only), so it
    * works unchanged on a STREAMING `pts`: Structured Streaming plans it
    * as a stream-static broadcast join — no watermark, no state store,
    * and the stream side is never shuffled. */
  def pipJoin(pts: DataFrame, aois: Seq[Aoi.AoiDef], res: Int = 7): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val gf = new GeometryFactory()
    val candRows = aois.flatMap { a =>
      val env = new WKTReader(gf).read(a.wkt).getEnvelopeInternal
      Cells.cover(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res)
        .map(c => (c, a.aoiId, a.wkt))
    }
    val cand = candRows.toDF("cell", "aoi_id", "wkt")
    val containsUdf = udf((wkt: String, lon: Double, lat: Double) =>
      Geoms.contains(wkt, lon, lat))
    pts.withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), res))
      .join(broadcast(cand), "cell")
      .filter(containsUdf(col("wkt"), col("lon"), col("lat")))
      .select(col("aoi_id"), col("doc_id"), col("lon"), col("lat"))
  }

  final case class KnnQuery(qid: Int, qlon: Double, qlat: Double)

  val DefaultKnnQueries: Seq[KnnQuery] = Seq(
    KnnQuery(0, -170.1005, -75.2005), KnnQuery(1, -120.3005, -45.6005),
    KnnQuery(2, -60.7005, -10.1005), KnnQuery(3, -10.2005, 5.3005),
    KnnQuery(4, 30.4005, 25.7005), KnnQuery(5, 80.6005, 45.2005),
    KnnQuery(6, 130.8005, 65.4005), KnnQuery(7, 179.0005, 80.0005))

  /** Exact kNN join via ring-expansion candidate join + window rank.
    * Output (qid, doc_id, d2, rank) equals brute force (ties broken by
    * doc_id). Distance is squared coordinate-space euclidean. */
  def knnJoin(spark: SparkSession, pts: DataFrame, queries: Seq[KnnQuery],
              k: Int = 5, res: Int = 6): DataFrame = {
    import spark.implicits._
    val ptsC = pts
      .withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), res))
      .persist()
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val cellH = 180.0 / (1L << res).toDouble
      val maxR = 1 << res
      var pending = queries
      var r = 1
      var done = Vector.empty[DataFrame]
      while (pending.nonEmpty) {
        val cand = pending.flatMap { q =>
          Cells.disk(Cells.encode(q.qlon, q.qlat, res), r)
            .map(c => (q.qid, q.qlon, q.qlat, c))
        }.toDF("qid", "qlon", "qlat", "cell")
        val joined = ptsC.join(broadcast(cand), "cell")
          .withColumn("d2",
            (col("lon") - col("qlon")) * (col("lon") - col("qlon"))
              + (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
        val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("doc_id"))
        val topk = joined.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid"), col("doc_id"), col("d2"), col("rank"))
          .persist()
        roundCaches += topk
        val stats = topk.groupBy(col("qid"))
          .agg(count(lit(1)).as("n"), max(col("d2")).as("maxd2"))
          .collect()
          .map(row => row.getInt(0) -> ((row.getLong(1), row.getDouble(2))))
          .toMap
        val guarantee = r.toDouble * cellH
        val finished = pending.filter { q =>
          r >= maxR || stats.get(q.qid).exists { case (n, maxd2) =>
            n >= k && math.sqrt(maxd2) <= guarantee
          }
        }
        if (finished.nonEmpty) {
          val ids = finished.map(_.qid)
          done :+= topk.filter(col("qid").isin(ids: _*))
        }
        pending = pending.filterNot(q => finished.exists(_.qid == q.qid))
        r = math.min(r * 2, maxR)
      }
      // localCheckpoint materializes the result so every per-round cache
      // (the point cells and each round's topk) can be released here —
      // a long-lived session would otherwise leak one cache per round
      val out = done.reduce(_ unionByName _).orderBy(col("qid"), col("rank"))
        .localCheckpoint()
      out
    } finally {
      ptsC.unpersist()
      roundCaches.foreach(_.unpersist())
    }
  }

  /** Point-in-polygon join for a LARGE polygon table — the
    * [[pipJoin]] twin for when the AOI set itself is too big to
    * broadcast (millions of parcels/tiles, not six fixtures). The
    * polygons arrive as a DataFrame (aoi_id, wkt); their covering index
    * cells are computed EXECUTOR-side (one flatMap over the polygon
    * table — never through the driver), and the candidate join is a
    * SHUFFLE hash/merge equi-join on the cell id: both sides
    * hash-partition by cell, so neither table needs to fit in driver or
    * executor memory whole. The exact JTS test still runs only on
    * cell-colocated candidates, with the per-executor prepared-geometry
    * cache keyed by WKT. Same semantics as [[pipJoin]] (interior-only),
    * asserted equal in JoinsSpec.
    *
    * Skew note: a polygon spanning many cells duplicates its (cell, wkt)
    * row per covered cell — bounded by cover size at `res`; a HOT CELL
    * (many polygons × many points) is the usual salting candidate, and
    * the output key (cell) is exactly what `graft.core.Skew` two-level
    * aggregation keys on downstream. */
  def pipJoinLarge(pts: DataFrame, aois: DataFrame, res: Int = 7): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val coverUdf = udf((wkt: String) => {
      val env = new WKTReader(new GeometryFactory()).read(wkt).getEnvelopeInternal
      Cells.cover(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res)
    })
    val cover = aois.select(col("aoi_id"), col("wkt"),
      explode(coverUdf(col("wkt"))).as("cell"))
    val containsUdf = udf((wkt: String, lon: Double, lat: Double) =>
      Geoms.contains(wkt, lon, lat))
    // shuffle_hash: the point of this variant is that the polygon side
    // must NOT be broadcast (at scale it can't be); the hint keeps the
    // test-scale plan shaped like the 100 TB plan
    pts.withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), res))
      .join(cover.hint("shuffle_hash"), "cell")
      .filter(containsUdf(col("wkt"), col("lon"), col("lat")))
      .select(col("aoi_id"), col("doc_id"), col("lon"), col("lat"))
  }

  /** Zonal statistics — the raster⟷vector aggregate: per zone polygon,
    * aggregate the grid cells it covers (count/min/max/sum of the cell
    * value). `zones` is a burned zone raster `(id, gx, gy)` (from
    * [[graft.vector.Rasterize]]), `cells` a value grid `(gx, gy, v)`;
    * both sides are keyed by the SAME (gx, gy), so after their
    * respective aggregations this is one co-partitioned equi-join plus
    * a hash aggregate with map-side combine — no driver state, no
    * broadcast needed at any zone-table size. */
  def zonalStats(cells: DataFrame, zones: DataFrame): DataFrame =
    zones.join(cells, Seq("gx", "gy"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_cells"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), sum(col("v")).as("sum_v"))

  /** Zonal MODE — the majority vote per zone (the categorical
    * counterpart of [[zonalStats]]: land-class / elevation-band
    * majority is the standard raster-classification zonal product).
    * Two hash aggregates, both map-side combined: (zone, class) counts
    * — bounded by zones × classes, not cells — then a per-zone
    * `max_by` with the deterministic (count desc, class asc)
    * tie-break. No window, no sort. */
  def zonalMode(cells: DataFrame, zones: DataFrame): DataFrame =
    zones.join(cells, Seq("gx", "gy"))
      .groupBy(col("id"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("v"), col("cnt")),
          struct(col("cnt"), (-col("v")).as("nv"))).as("m"),
        sum(col("cnt")).as("n_cells"))
      .select(col("id"), col("m.v").as("mode_v"),
        col("m.cnt").as("mode_n"), col("n_cells"))

  /** Exact radius (distance) join: all (query, point) pairs within
    * coordinate distance `radius` — the third classic spatial join next
    * to J4 PIP and J5 kNN (geofencing, "documents near this site").
    *
    * Scale shape: every point inside disk(q, radius) lies inside the
    * square [qlon ± radius, qlat ± radius], so each query explodes to
    * the index cells covering that square (bounded by
    * (radius/cellH + 2)^2 cells — small for sane radii, and broadcast),
    * the candidate join is a broadcast hash equi-join on the point's
    * codegen'd cell id, and the exact d2 <= r^2 test runs only on
    * cell-colocated candidates. The point table is never shuffled, so
    * the plan survives a 100 TB point side unchanged; output size is the
    * true pair count, which the caller bounds by choosing the radius. */
  def radiusJoin(pts: DataFrame, queries: Seq[KnnQuery], radius: Double,
                 res: Int = 6): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    require(radius > 0, s"radius must be positive: $radius")
    val cand = queries.flatMap { q =>
      Cells.cover(q.qlon - radius, q.qlat - radius,
          q.qlon + radius, q.qlat + radius, res)
        .map(c => (q.qid, q.qlon, q.qlat, c))
    }.toDF("qid", "qlon", "qlat", "cell")
    pts.withColumn("cell", CellFunctions.cellId(col("lon"), col("lat"), res))
      .join(broadcast(cand), "cell")
      .withColumn("d2",
        (col("lon") - col("qlon")) * (col("lon") - col("qlon"))
          + (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
      .filter(col("d2") <= lit(radius * radius))
      .select(col("qid"), col("doc_id"), col("d2"))
  }
}
