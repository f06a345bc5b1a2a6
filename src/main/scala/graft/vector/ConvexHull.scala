package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Per-group 2-D convex hull — Andrew's monotone chain over integer
 * coordinates, exact cross-product turns only (no doubles anywhere).
 * The hull is returned as a VERTEX SET (strict corners; collinear
 * points interior to an edge are not vertices), which gives it a
 * definition independent of traversal order: a point is a hull vertex
 * iff it is NOT in the convex hull of the other points — exactly the
 * Carathéodory triangle test the DuckDB dual runs, so the oracle pins
 * the semantics without sharing any code shape with the chain.
 *
 * Distributed shape: the bounded-component pattern ([[RefTrace]],
 * [[DouglasPeucker]]): one `groupByKey(key).flatMapGroups`, per-group
 * O(n log n) chain under a `maxPts` refusal, parallelism across
 * groups. (The hull is associative — local-hull-then-merge extends
 * this to unbounded groups; at this engine's group contracts the
 * bounded chain is the honest shape.) Duplicate points collapse
 * before the chain, so a doubled corner is still one vertex.
 */
object ConvexHull {

  /** Hull vertices of each group. `pts`: (key: string, x: long,
    * y: long) → (key, x, y), one row per strict hull corner. */
  def hull(pts: DataFrame, maxPts: Int = 1 << 20): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    pts.select(col("key").cast("string"), col("x").cast("long"),
        col("y").cast("long")).distinct()
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val p = it.map(t => (t._2, t._3)).toArray
        require(p.length <= maxPts,
          s"group $key has ${p.length} points > maxPts=$maxPts")
        chain(p).iterator.map { case (x, y) => (key, x, y) }
      }(Encoders.product[(String, Long, Long)])
      .toDF("key", "x", "y")
  }

  /** Strict-turn monotone chain; input need not be sorted or distinct.
    * Returns the corner set (unordered collection of ring vertices). */
  def chain(points: Array[(Long, Long)]): Array[(Long, Long)] = {
    val p = points.distinct.sorted
    if (p.length <= 2) return p
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): BigInt =
      BigInt(a._1 - o._1) * (b._2 - o._2) - BigInt(a._2 - o._2) * (b._1 - o._1)
    def half(src: Iterator[(Long, Long)]): List[(Long, Long)] = {
      var h = List.empty[(Long, Long)]
      var n = 0 // tracked length: List.length inside the loop is O(n^2)
      for (pt <- src) {
        // strict turns: collinear middles (cross == 0) are dropped too
        while (n >= 2 && cross(h.tail.head, h.head, pt) <= 0) {
          h = h.tail
          n -= 1
        }
        h = pt :: h
        n += 1
      }
      h
    }
    val lower = half(p.iterator)
    val upper = half(p.reverseIterator)
    // each half includes both endpoints; drop the duplicated ends
    (lower.tail ++ upper.tail).toArray
  }
}
