package graft

import graft.similarity.{Ann, SemDedup}
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  /** Deterministic unit vectors in dim 8: a hash-angle base vector per
    * id, plus planted exact/near duplicates of ids 0 and 1. */
  private def corpus = {
    import spark.implicits._
    def unit(seed: Int): Seq[Double] = {
      val raw = (0 until 8).map { i =>
        var h = seed.toLong * 6364136223846793005L + i * 1442695040888963407L
        h ^= (h >>> 33)
        ((h & 0xFFFFL).toDouble / 65536.0) - 0.5
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val base = (0 until 12).map(i => (i.toLong, unit(i)))
    val exactDup = Seq((100L, unit(0))) // same vector as id 0
    val nearDup = Seq((101L, {
      val v = unit(1).updated(0, unit(1).head + 0.01)
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }))
    (base ++ exactDup ++ nearDup).toDF("vec_id", "v")
  }

  test("semDedup equals brute-force reference over its own member view") {
    val tau = 0.9
    val members = SemDedup.memberView(corpus, nList = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expectDropped = (for {
      (bid, bcid, bv, bccos) <- members
      (aid, acid, av, accos) <- members
      if acid == bcid &&
        (accos < bccos || (accos == bccos && aid < bid)) &&
        cos(av, bv) >= tau
    } yield bid).toSet
    val got = SemDedup.semDedup(corpus, nList = 3, tau = tau)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got.keySet == members.map(_._1).toSet)
    assert(got.filter(_._2 == 0).keySet == expectDropped)
    // the planted exact duplicate pair (0, 100) must lose exactly one
    // member, and some vector must survive every cluster
    assert(got(0L) + got(100L) == 1)
    assert(got.values.sum >= 3)
  }

  test("exact duplicates: identical ccos, min vec_id survives") {
    val got = SemDedup.semDedup(corpus, nList = 3, tau = 0.999999)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // at tau ~ 1 only the exact pair links; (ccos ties -> lower id kept)
    assert(got(0L) == 1 && got(100L) == 0)
    assert(got.count(_._2 == 0) == 1)
  }

  test("maxCluster cap: oversized clusters pair nothing, all kept") {
    val all = SemDedup.semDedup(corpus, nList = 3, tau = 0.0, maxCluster = 1L)
      .collect().map(r => r.getInt(3))
    assert(all.forall(_ == 1))
    val over = SemDedup.oversizedClusters(
      SemDedup.memberView(corpus, nList = 3), maxCluster = 1L).count()
    assert(over >= 1)
  }

  test("plan guard: pair join is a cid equi-join, never nested-loop") {
    val plan = SemDedup.semDedup(corpus, nList = 3, tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("partitioning invariance") {
    val a = SemDedup.semDedup(corpus.repartition(7), nList = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val b = SemDedup.semDedup(corpus.coalesce(1), nList = 3, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
