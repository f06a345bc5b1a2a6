package graft

import graft.index.{Geohash, GeohashFunctions}
import org.apache.spark.sql.functions._

class GeohashSpec extends SparkSpec {
  import spark.implicits._

  test("published test vectors") {
    // classic examples from the geohash literature
    assert(Geohash.encode(10.40744, 57.64911, 11) === "u4pruydqqvj")
    assert(Geohash.encode(-5.6, 42.6, 5) === "ezs42")
    assert(Geohash.encode(0.0, 0.0, 1) === "s")
    assert(Geohash.encode(-179.9999, -89.9999, 4) === "0000")
    assert(Geohash.encode(179.9999, 89.9999, 4) === "zzzz")
  }

  test("prefixes nest: precision p is a prefix of precision p+k") {
    for (lon <- Seq(-179.0, -5.6, 0.0, 77.7, 179.0);
         lat <- Seq(-88.0, -42.0, 0.0, 42.6, 88.0)) {
      val g12 = Geohash.encode(lon, lat, 12)
      for (p <- 1 to 11)
        assert(Geohash.encode(lon, lat, p) === g12.take(p), s"($lon,$lat,$p)")
    }
  }

  test("center decodes back into the encoding cell") {
    for (lon <- Seq(-179.0, -5.6, 0.0, 77.7); lat <- Seq(-88.0, 0.0, 42.6)) {
      val gh = Geohash.encode(lon, lat, 9)
      val (clon, clat) = Geohash.center(gh)
      assert(Geohash.encode(clon, clat, 9) === gh, s"($lon,$lat)")
      // cell width at p=9: 45 bits total, 23 lon bits -> 360/2^23 deg
      assert(math.abs(clon - lon) <= 360.0 / (1L << 23))
      assert(math.abs(clat - lat) <= 180.0 / (1L << 22))
    }
  }

  test("expression matches the scalar and stays in codegen") {
    val df = Seq((10.40744, 57.64911), (-5.6, 42.6), (0.0, 0.0))
      .toDF("lon", "lat")
      .select(GeohashFunctions.geohash(col("lon"), col("lat"), 7).as("gh"))
    assert(df.as[String].collect().toSeq ===
      Seq("u4pruyd", "ezs42e4", "s000000"))
    // non-literal source so the projection can't constant-fold away
    val ranged = spark.range(100).select(
      GeohashFunctions.geohash(col("id").cast("double") / 7.0,
        col("id").cast("double") / 13.0, 6).as("gh"))
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_geohash"), plan)
    assert(ranged.distinct().count() === 100)
  }

  test("value interleave: lon occupies the MSB and alternates") {
    // lon in the east half sets the very first bit regardless of lat
    assert((Geohash.value(1.0, -89.0, 4) >>> 19) === 1L)
    assert((Geohash.value(-1.0, 89.0, 4) >>> 19) === 0L)
  }
}
