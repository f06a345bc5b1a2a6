package graft

import graft.dedup.SimJoin
import org.apache.spark.sql.functions._

class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, Seq[String])], tNum: Long, tDen: Long)
      : Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, ts) => id -> ts.toSet }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size.toLong
      u = (sets(a) | sets(b)).size.toLong
      if tDen * i >= tNum * u
    } yield (a, b, i, u)).toSet
  }

  private def run(docs: Seq[(Long, Seq[String])], tNum: Long, tDen: Long,
                  parts: Int = 1) =
    SimJoin.jaccardJoin(
        docs.toDF("doc_id", "toks").repartition(parts),
        "doc_id", "toks", tNum, tDen)
      .select("a", "b", "inter", "uni")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private val corpus: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("a", "b", "c", "d", "e"),
    2L -> Seq("a", "b", "c", "d", "f"),      // J(1,2) = 4/6 = 2/3
    3L -> Seq("a", "b", "c", "d", "e"),      // J(1,3) = 1
    4L -> Seq("x", "y", "z"),
    5L -> Seq("x", "y", "z", "w"),           // J(4,5) = 3/4
    6L -> Seq("q"),
    7L -> (0 until 40).map(i => s"t$i"),
    8L -> ((0 until 32).map(i => s"t$i") :+ "other")) // J(7,8) = 32/41

  test("matches brute force across thresholds, exact boundary inclusive") {
    for ((n, d) <- Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 1L))) {
      assert(run(corpus, n, d) === brute(corpus, n, d), s"t=$n/$d")
    }
    // J(4,5) = 3/4 exactly -> kept at t=3/4, cut at t=4/5
    assert(run(corpus, 3, 4).contains((4L, 5L, 3L, 4L)))
    assert(!run(corpus, 4, 5).contains((4L, 5L, 3L, 4L)))
  }

  test("arrays are sets: duplicated tokens collapse before sizing") {
    val docs = Seq(1L -> Seq("a", "a", "a", "b"), 2L -> Seq("a", "b", "b"))
    // as sets both are {a,b}: J = 1
    assert(run(docs, 1, 1) === Set((1L, 2L, 2L, 2L)))
  }

  test("identical docs at t=1 and fully disjoint corpus at any t") {
    assert(run(corpus, 1, 1) === Set((1L, 3L, 5L, 5L)))
    val disjoint = (0L until 20L).map(i => i -> Seq(s"u${i}a", s"u${i}b"))
    assert(run(disjoint, 1L, 5L) === Set.empty)
  }

  test("partitioning invariance and jac division") {
    assert(run(corpus, 2, 3, parts = 7) === run(corpus, 2, 3))
    val jac = SimJoin.jaccardJoin(corpus.toDF("doc_id", "toks"),
        "doc_id", "toks", 2, 3)
      .filter(col("a") === 7 && col("b") === 8)
      .select("jac").as[Double].head()
    assert(jac === 32.0 / 41.0)
  }
}
