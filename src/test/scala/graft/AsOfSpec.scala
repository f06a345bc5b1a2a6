package graft

import graft.temporal.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  private def brute(
      probes: Seq[(Long, Long, Double)],   // (pid, key, t)
      builds: Seq[(Long, Double, Double)]  // (key, t, v)
  ): Map[Long, Option[(Double, Double)]] =
    probes.map { case (pid, k, t) =>
      val cands = builds.filter(b => b._1 == k && b._2 <= t)
      pid -> (if (cands.isEmpty) None
              else { val m = cands.maxBy(_._2); Some((m._2, m._3)) })
    }.toMap

  private def mkDfs(probes: Seq[(Long, Long, Double)],
                    builds: Seq[(Long, Double, Double)]) = {
    import spark.implicits._
    (probes.toDF("pid", "key", "t").repartition(7),
      builds.toDF("key", "t", "v").repartition(5))
  }

  test("matches brute force on a seeded random workload") {
    val rnd = new scala.util.Random(42)
    val probes = (0L until 400L).map(i =>
      (i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toDouble))
    // unique (key, t) on the build side, as the contract requires
    val builds = rnd.shuffle(
      (for (k <- 0L until 12L; t <- 0 until 1000 if rnd.nextInt(20) == 0)
        yield (k, t.toDouble, (k * 10000 + t).toDouble)).toList)
    val (p, b) = mkDfs(probes, builds)
    val got = AsOf.joinAsOf(p, b, Seq("key"), "t", Seq("v"))
      .select("pid", "t_build", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getDouble(1), r.getDouble(2))))).toMap
    assert(got == brute(probes, builds))
    assert(got.size == probes.size, "left semantics: every probe kept")
  }

  test("probe at exactly t sees the build at t (>= semantics)") {
    val (p, b) = mkDfs(Seq((1L, 5L, 10.0), (2L, 5L, 9.999)),
      Seq((5L, 10.0, 77.0)))
    val rows = AsOf.joinAsOf(p, b, Seq("key"), "t", Seq("v"))
      .orderBy("pid").collect()
    assert(rows(0).getAs[Double]("v") == 77.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("v")))
  }

  test("later builds never leak backwards; newest earlier build wins") {
    val (p, b) = mkDfs(Seq((1L, 1L, 50.0)),
      Seq((1L, 10.0, 1.0), (1L, 40.0, 2.0), (1L, 60.0, 3.0)))
    val r = AsOf.joinAsOf(p, b, Seq("key"), "t", Seq("v")).head()
    assert(r.getAs[Double]("v") == 2.0 && r.getAs[Double]("t_build") == 40.0)
  }

  test("plan: one keyed window, no join operator, no pair blowup") {
    val rnd = new scala.util.Random(7)
    val (p, b) = mkDfs(
      (0L until 200L).map(i => (i, i % 5, rnd.nextInt(100).toDouble)),
      (0L until 5L).flatMap(k => (0 until 20).map(t => (k, t * 5.0, 1.0))))
    val df = AsOf.joinAsOf(p, b, Seq("key"), "t", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not be a theta/equi join")
    assert(plan.contains("Window"), "running-window carry missing")
  }
}
