package graft

import graft.graph.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  private val S = PageRank.Scale

  test("one iteration matches hand-computed fixed-point recurrence") {
    import spark.implicits._
    // A->B, B->A, B->C (C dangling). deg A=1, B=2. r0 = S everywhere.
    // contrib: B <- S div 1; A <- S div 2; C <- S div 2
    // r1(A) = (15S + 85*(S div 2)) div 100 = 602931
    // r1(B) = (15S + 85*S) div 100 = S
    // r1(C) = 602931
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = PageRank.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 602931L, 2L -> S, 3L -> 602931L))
  }

  test("three iterations equal a driver-side integer reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var ref = nodes.map(_ -> S).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ref(s) / deg(s) }.sum
      }
      ref = nodes.map(n => n -> (15 * S + 85 * contrib.getOrElse(n, 0L)) / 100).toMap
    }
    val got = PageRank.pageRank(edges.toDF("src", "dst").repartition(5), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("clickEdges orders by (order, tie) within user; tail event emits none") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 0L, 100L), (1L, 10L, 1L, 200L), (1L, 20L, 0L, 300L),
      (2L, 5L, 0L, 400L)) // single-event user: no edge
      .toDF("user", "o", "t", "page")
    val got = PageRank.clickEdges(ev, col("page"), col("user"), col("o"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((100L, 200L), (200L, 300L)))
  }

  test("plan: pinned edges are not re-shuffled by the per-iteration join") {
    import spark.implicits._
    val edges = Seq.tabulate(50)(i => (i.toLong % 10, (i + 3).toLong % 10))
      .toDF("src", "dst")
    val plan = PageRank.pageRank(edges, iters = 1)
      .queryExecution.executedPlan.toString
    // edges were repartition(src)+localCheckpoint'd before the loop; the
    // rank join must only shuffle the (tiny) rank side, never the edges
    val edgeShuffles = "Exchange hashpartitioning\\(src".r
      .findAllIn(plan).size
    assert(edgeShuffles <= 2, s"edges re-shuffled per iteration:\n$plan")
  }

  test("resumable: continues from the last committed iteration, bit-exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-pr").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    // first run commits iterations 1..2
    PageRank.pageRankResumable(edges, iters = 2, root).collect()
    assert(graft.meta.Snapshots.committed(root, "pagerank_ranks").size == 2)
    // second run to 4 must resume (adds exactly 2 more commits) and
    // equal the direct 4-iteration result
    val resumed = PageRank.pageRankResumable(edges, iters = 4, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.meta.Snapshots.committed(root, "pagerank_ranks").size == 4)
    val direct = PageRank.pageRank(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == direct)
    // a DIFFERENT graph on the same root must not resume from these
    val other = Seq((7L, 8L), (8L, 7L)).toDF("src", "dst")
    val fresh = PageRank.pageRankResumable(other, iters = 1, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fresh.keySet == Set(7L, 8L))
    assert(graft.meta.Snapshots.committed(root, "pagerank_ranks").size == 5)
  }

  test("mass accounting: total rank stays within (1-d) floor and input mass") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst") // a cycle
    val got = PageRank.pageRank(edges, iters = 5)
      .agg(sum("rank_fp")).head().getLong(0)
    // a pure cycle conserves mass exactly (up to div truncation)
    assert(got <= 3 * S && got > 3 * S - 100)
  }
}
