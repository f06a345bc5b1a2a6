package graft

import graft.temporal.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def brute(
      probes: Seq[(Long, Long, Double)],  // (pid, key, t)
      builds: Seq[(Long, Double, Long)],  // (key, t, bid)
      lo: Double, hi: Double): Set[(Long, Long)] =
    (for {
      (pid, k, t) <- probes
      (bk, bt, bid) <- builds
      if bk == k && bt >= t + lo && bt <= t + hi
    } yield (pid, bid)).toSet

  private def run(probes: Seq[(Long, Long, Double)],
                  builds: Seq[(Long, Double, Long)],
                  lo: Double, hi: Double): Seq[(Long, Long)] = {
    import spark.implicits._
    val p = probes.toDF("pid", "key", "t").repartition(7)
    val b = builds.toDF("key", "t", "bid").repartition(5)
    RangeJoin.joinRange(p, b, Seq("key"), "t", lo, hi)
      .select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("matches brute force; each pair emitted exactly once") {
    val rnd = new scala.util.Random(17)
    val probes = (0L until 300L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(5000).toDouble))
    val builds = (0L until 300L).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(5000).toDouble, 1000L + i))
    for ((lo, hi) <- Seq((-600.0, 0.0), (-250.0, 250.0), (0.0, 100.0))) {
      val got = run(probes, builds, lo, hi)
      assert(got.toSet == brute(probes, builds, lo, hi), s"window ($lo,$hi)")
      assert(got.size == got.toSet.size, s"duplicate pairs at ($lo,$hi)")
    }
  }

  test("inclusive bounds: builds exactly at t+lo and t+hi match") {
    val probes = Seq((1L, 1L, 1000.0))
    val builds = Seq((1L, 400.0, 10L), (1L, 1000.0, 11L),
      (1L, 399.999, 12L), (1L, 1000.001, 13L))
    assert(run(probes, builds, -600.0, 0.0).toSet ==
      Set((1L, 10L), (1L, 11L)))
  }

  test("bucket-aligned times don't double-match") {
    // t+lo exactly on a bucket boundary -> probe expands to 2 buckets,
    // the build at the boundary lives in exactly one of them
    val probes = Seq((1L, 1L, 7200.0))
    val builds = Seq((1L, 3600.0, 20L), (1L, 7200.0, 21L))
    val got = run(probes, builds, -3600.0, 0.0)
    assert(got.sorted == Seq((1L, 20L), (1L, 21L)))
  }

  test("empty window (lo > hi) is rejected") {
    import spark.implicits._
    val d = Seq((1L, 1L, 1.0)).toDF("pid", "key", "t")
    val b = Seq((1L, 1.0, 2L)).toDF("key", "t", "bid")
    intercept[IllegalArgumentException] {
      RangeJoin.joinRange(d, b, Seq("key"), "t", 5.0, -5.0)
    }
  }
}
