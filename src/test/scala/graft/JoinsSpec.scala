package graft

import graft.core.{Geo, Tables}
import graft.join.{Aoi, SpatialJoins}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  private lazy val pts =
    Geo.withGeo(Tables.documents(spark, sfSmoke)).select("doc_id", "lon", "lat")

  test("pip join equals per-AOI strict predicate evaluation") {
    val got = SpatialJoins.pipJoin(pts, Aoi.defs)
      .select("aoi_id", "doc_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    // independent Spark-side brute force from the SQL predicates
    val want = Aoi.defs.flatMap { a =>
      pts.filter(expr(a.oracleSqlPredicate))
        .select("doc_id").collect().map(r => (a.aoiId, r.getLong(0)))
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("knn join equals brute force") {
    val qs = SpatialJoins.DefaultKnnQueries
    val got = SpatialJoins.knnJoin(spark, pts, qs, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3))).toSeq
    import spark.implicits._
    val qdf = qs.map(q => (q.qid, q.qlon, q.qlat)).toDF("qid", "qlon", "qlat")
    val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("doc_id"))
    val want = pts.crossJoin(qdf)
      .withColumn("d2",
        (col("lon") - col("qlon")) * (col("lon") - col("qlon"))
          + (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .orderBy(col("qid"), col("rank"))
      .collect().map(r => (r.getInt(r.fieldIndex("qid")), r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("rank")))).toSeq
    assert(got == want)
    assert(got.size == qs.size * 5)
  }

  test("radius join equals brute force, including boundary radii") {
    val qs = SpatialJoins.DefaultKnnQueries
    import spark.implicits._
    val qdf = qs.map(q => (q.qid, q.qlon, q.qlat)).toDF("qid", "qlon", "qlat")
    for (radius <- Seq(0.5, 3.0, 12.0)) {
      val got = SpatialJoins.radiusJoin(pts, qs, radius)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val want = pts.crossJoin(qdf)
        .withColumn("d2",
          (col("lon") - col("qlon")) * (col("lon") - col("qlon"))
            + (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
        .filter(col("d2") <= radius * radius)
        .select("qid", "doc_id")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got == want, s"radius=$radius")
    }
    // a generous radius on a dense corpus must return hits
    assert(SpatialJoins.radiusJoin(pts, qs, 12.0).count() > 0)
  }

  test("pipJoinLarge equals broadcast pipJoin; polygon side not broadcast") {
    val large = SpatialJoins.pipJoinLarge(pts, Aoi.df(spark))
    val got = large.select("aoi_id", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val want = SpatialJoins.pipJoin(pts, Aoi.defs).select("aoi_id", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // the candidate join must be a shuffle join — the whole point of the
    // variant is that the polygon side can be 100M rows
    val plan = large.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("zonalStats equals per-zone brute force over the burned lattice") {
    val docs = Geo.withGeo(Tables.documents(spark, sfSmoke))
    val dsm = graft.grid.Gridding.dsm(graft.grid.Gridding.points(docs))
    val zones = graft.vector.Rasterize.geo(spark,
      Aoi.defs.map(a => (a.aoiId.toLong, a.wkt)), -180.0, -85.0, 0.5)
    val got = SpatialJoins.zonalStats(dsm, zones.select("id", "gx", "gy"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val cells = dsm.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = zones.select("id", "gx", "gy").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1)
      .map { case (id, zs) =>
        val vs = zs.flatMap(z => cells.get(z._2))
        id -> ((vs.length.toLong, vs.min, vs.max, vs.sum))
      }
    assert(got == want && got.nonEmpty)
  }

  test("zonalMode: majority vote with (count desc, class asc) tie-break") {
    import spark.implicits._
    val zones = Seq((1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 0L),
      (2L, 0L, 1L), (2L, 1L, 1L), (3L, 9L, 9L)).toDF("id", "gx", "gy")
    // zone 1: classes 7,7,3,3 -> tie, smaller class 3 wins
    // zone 2: one cell class 5, one cell missing -> mode 5 over 1 cell
    // zone 3: no cells -> absent
    val cells = Seq((0L, 0L, 7L), (1L, 0L, 7L), (2L, 0L, 3L), (3L, 0L, 3L),
      (0L, 1L, 5L)).toDF("gx", "gy", "v")
    val got = graft.join.SpatialJoins.zonalMode(cells, zones)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(1L -> (3L, 2L, 4L), 2L -> (5L, 1L, 1L)))
  }
}
