package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Douglas-Peucker polyline simplification — the second classic
 * simplifier next to the Visvalingam-Whyatt min-area reduce inside
 * `buildingSimplify` ([[Vectorize]], pubgeo `geo_polygon.h:216-244`
 * uses area-based elimination; DP is the max-deviation counterpart
 * users expect from a vector toolbox).
 *
 * EXACT arithmetic: a vertex k splits segment (i, j) iff
 * `dev(k)² · epsDen² > epsNum² · |ij|²` where `dev(k) = |cross(j−i,
 * k−i)|` — the perpendicular-distance test cleared of division and
 * sqrt. Cross products of 10^5-unit integer coordinates square past
 * 2^63, so comparisons run in BigInt (per-vertex, allocation-bounded
 * by the line cap). The split vertex is the (deviation desc, pos asc)
 * argmax — a total order, so the kept set is partitioning-invariant.
 *
 * Distributed shape: one `groupByKey(line).flatMapGroups` — the
 * bounded-component pattern every tracer here uses ([[RefTrace]]):
 * lines are bounded (`maxPts` refusal, like maxCells), parallelism
 * comes from the number of lines, and the per-line walk is the
 * textbook stack algorithm, not |V| join rounds. The DuckDB dual runs
 * the same recursion as a recursive CTE with an anti-join argmax, so
 * the oracle pins the exact kept set including tie behavior.
 */
object DouglasPeucker {

  /** Keep-set of each polyline. `verts`: (line: string, pos: int/long
    * contiguous from 0, x: long, y: long) → kept rows (line, pos, x, y). */
  def simplify(verts: DataFrame, epsNum: Long, epsDen: Long = 1L,
               maxPts: Int = 1 << 20): DataFrame = {
    require(epsNum >= 0 && epsDen > 0, "eps must be a non-negative rational")
    val spark = verts.sparkSession
    import spark.implicits._
    val en2 = BigInt(epsNum) * BigInt(epsNum)
    val ed2 = BigInt(epsDen) * BigInt(epsDen)
    verts.select(col("line").cast("string"), col("pos").cast("long"),
        col("x").cast("long"), col("y").cast("long"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (line, it) =>
        val pts = it.toArray.sortBy(_._2)
        require(pts.length <= maxPts,
          s"line $line has ${pts.length} vertices > maxPts=$maxPts")
        val keep = Array.fill(pts.length)(false)
        if (pts.nonEmpty) { keep(0) = true; keep(pts.length - 1) = true }
        val stack = scala.collection.mutable.Stack.empty[(Int, Int)]
        if (pts.length > 2) stack.push((0, pts.length - 1))
        while (stack.nonEmpty) {
          val (i, j) = stack.pop()
          val (_, _, ax, ay) = pts(i)
          val (_, _, bx, by) = pts(j)
          val (dx, dy) = (bx - ax, by - ay)
          // coincident endpoints (closed ring halves): every cross is
          // 0, so fall back to point-to-endpoint distance — standard DP
          val degenerate = dx == 0 && dy == 0
          var best = -1
          var bestDev = BigInt(-1)
          var k = i + 1
          while (k < j) {
            val (_, _, kx, ky) = pts(k)
            val dev =
              if (degenerate)
                BigInt(kx - ax) * (kx - ax) + BigInt(ky - ay) * (ky - ay)
              else (BigInt(dx) * (ky - ay) - BigInt(dy) * (kx - ax)).abs
            if (dev > bestDev) { bestDev = dev; best = k }
            k += 1
          }
          if (best >= 0) {
            val len2 = BigInt(dx) * dx + BigInt(dy) * dy
            val split =
              if (degenerate) bestDev * ed2 > en2 // dist² · den² > num²
              else bestDev * bestDev * ed2 > en2 * len2
            if (split) {
              keep(best) = true
              if (best - i > 1) stack.push((i, best))
              if (j - best > 1) stack.push((best, j))
            }
          }
        }
        pts.iterator.zipWithIndex.collect {
          case ((_, pos, x, y), idx) if keep(idx) => (line, pos, x, y)
        }
      }(Encoders.product[(String, Long, Long, Long)])
      .toDF("line", "pos", "x", "y")
  }
}
