package graft

import graft.graph.Triangles
import org.apache.spark.sql.functions.col

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  /** Brute-force scalar counter over the simple undirected graph. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = nodes.map(n =>
      n -> und.collect { case (a, b) if a == n => b
                         case (a, b) if b == n => a }).toMap
    nodes.map { n =>
      val nb = adj(n).toSeq.sorted
      val t = (for {
        i <- nb.indices; j <- i + 1 until nb.size
        if und((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
      } yield 1).size.toLong
      val d = nb.size.toLong
      val c = if (d >= 2) (2.0 * t) / (d * (d - 1)) else 0.0
      n -> ((t, d, c))
    }.toMap
  }

  test("K4: every node in 3 triangles, clustering 1.0") {
    val k4 = for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)
    val got = run(k4)
    assert(got.values.toSet == Set((3L, 3L, 1.0)))
  }

  test("matches brute force on a mixed graph with dups/loops/reverses") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L), (4L, 5L), (5L, 6L), (6L, 4L),
      (7L, 8L), (1L, 2L))
    assert(run(edges) == ref(edges))
  }

  test("triangle-free graph: all zero triangles, zero clustering") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val got = run(star)
    assert(got.values.forall(v => v._1 == 0L && v._3 == 0.0))
    assert(got(0L)._2 == 4L)
  }

  test("invariant under edge partitioning") {
    val edges = (for (a <- 0L until 30L; b <- 0L until 30L
      if a != b && (a * 31 + b * 17) % 5 == 0) yield (a, b)).toSeq
    val df = edges.toDF("src", "dst")
    val a = Triangles.perNode(df.repartition(1))
      .orderBy(col("node")).collect().map(_.toSeq).toSeq
    val b = Triangles.perNode(df.repartition(7, col("dst")))
      .orderBy(col("node")).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(run(edges) == ref(edges))
  }
}
